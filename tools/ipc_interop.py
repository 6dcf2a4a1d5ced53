#!/usr/bin/env python3
"""Cross-implementation Arrow IPC interop check (dev tool only).

Direction A: graft's ArrowIpc writer -> pyarrow reader. Every dumped
message must be a complete, independently-parseable IPC stream (one
bolson Pulsar payload), and the concatenated values must equal the
source parquet exactly.

Direction B: pyarrow writer -> graft's ArrowIpc reader. The Scala side
prints rows= and checksum=; we assert both against the table we wrote.

Usage: python3 tools/ipc_interop.py [sfDir]
"""
import glob
import os
import subprocess
import sys
import tempfile

import pyarrow as pa
import pyarrow.ipc as ipc
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def run(args):
    r = subprocess.run(["sbt", "-batch", "runMain graft.tools.IpcInterop " + " ".join(args)],
                       capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = r.stdout + r.stderr
    if r.returncode != 0:
        print(out[-4000:])
        sys.exit(f"IpcInterop {args[0]} failed")
    return out


def direction_a(tmp):
    out_dir = os.path.join(tmp, "graft_ipc")
    run(["dump", SF_DIR, out_dir])
    files = sorted(glob.glob(os.path.join(out_dir, "msg-*.arrows")))
    assert files, "no messages dumped"
    tables = []
    for f in files:
        with ipc.open_stream(f) as r:  # independent implementation parses it
            tables.append(r.read_all())
    got = pa.concat_tables(tables).to_pydict()
    src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                        columns=["doc_id", "lang", "n_chars"]).to_pydict()
    order = sorted(range(len(src["doc_id"])), key=lambda i: src["doc_id"][i])
    for col in ("doc_id", "lang", "n_chars"):
        assert got[col] == [src[col][i] for i in order], f"column {col} mismatch"
    n_rows = len(got["doc_id"])
    assert all(len(pa.concat_tables([t]).to_pydict()["doc_id"]) <= 128 for t in tables), \
        "a message exceeded maxRows"
    print(f"A: pyarrow read {len(files)} graft messages, {n_rows} rows, values equal parquet")


def direction_b(tmp):
    src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                        columns=["doc_id", "lang", "n_chars"]).sort_by("doc_id")
    f = os.path.join(tmp, "pyarrow_stream.arrows")
    with ipc.new_stream(f, src.schema) as w:
        for batch in src.to_batches(max_chunksize=100):
            w.write_batch(batch)
    out = run(["read", f, str(src.num_rows)])
    rows = int(out.split("rows=")[1].split()[0])
    checksum = int(out.split("checksum=")[1].split()[0])
    expect = sum(d * n for d, n in zip(src["doc_id"].to_pylist(),
                                       src["n_chars"].to_pylist()))
    assert rows == src.num_rows, f"row count: graft read {rows}, wrote {src.num_rows}"
    assert checksum == expect, f"checksum: graft {checksum}, pyarrow {expect}"
    print(f"B: graft read {rows} pyarrow rows, checksum matches")


def main():
    with tempfile.TemporaryDirectory() as tmp:
        direction_a(tmp)
        direction_b(tmp)
    print("IPC interop: both directions OK")


if __name__ == "__main__":
    main()
