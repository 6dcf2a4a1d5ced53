#!/usr/bin/env python3
"""Spark-free filesystem probe (dev tool, r18 — SURVEY §6/§8p).

The per-message publish channel is one-file-per-message bound. When it
reads below its band floor, this probe answers the only question that
matters — is raw file creation itself degraded right now? — with zero
Spark, zero JVM, byte-identical work per trial:

    python3 tools/fsprobe.py [n_files] [payload_bytes] [trials]

writes n_files (default 3000) files of payload_bytes (default 11000 —
the bench's mean .arrow message size) per trial and prints files/s.
An oscillation across back-to-back trials (r18 observed 2.5k -> 5.6k ->
28.8k files/s) is the hypervisor/steal signature: the channel dip is
the box, not the code. A flat-low read across many trials on a calm
box would instead indict the write path.
"""
import os
import shutil
import sys
import time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 11000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    d = "/tmp/graft-fsprobe"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    payload = b"x" * size
    try:
        for t in range(trials):
            t0 = time.time()
            for i in range(n):
                with open(f"{d}/m{t}-{i}.bin", "wb") as f:
                    f.write(payload)
            dt = time.time() - t0
            print(f"trial {t}: {n / dt:.0f} files/s single-thread")
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
