package graft.metrics

import java.util.concurrent.atomic.AtomicLong

/** Cumulative per-JVM memo-build clock (r21, the r20 verdict's
  * amortization-audit item): every per-dir scratch-artifact build —
  * trainer vocabularies, shingle/phash/banded-pair index tables,
  * wire-format corpora, model sketches — runs inside [[timed]], and the
  * bench emits the accumulated seconds as `memo_build_s` in its JSON
  * line. The suite's warmup + min-of-3 methodology pays each build once
  * (in warmup) and excludes it from every timed sample; this counter
  * makes that seam AUDITABLE instead of invisible: steady-state seconds
  * and one-time build seconds ship side by side.
  *
  * Nested builds (one memo's build forcing another — e.g. the banded
  * pair table forcing the shingle table) count once, at the OUTERMOST
  * frame, so the total is wall seconds spent building, never
  * double-booked. Thread-safe: concurrent distinct builds each add
  * their own outermost span (the total is then "build-seconds", which
  * can exceed wall on parallel warmups — the honest unit for an
  * amortization audit). */
object MemoClock {
  private val totalNs = new AtomicLong(0L)
  private val builds = new AtomicLong(0L)
  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  def timed[A](body: => A): A = {
    val d = depth.get()
    depth.set(d + 1)
    val t0 = System.nanoTime()
    try body
    finally {
      depth.set(d)
      if (d == 0) {
        totalNs.addAndGet(System.nanoTime() - t0)
        builds.incrementAndGet()
      }
      ()
    }
  }

  /** Total outermost build seconds accumulated in this JVM. */
  def totalS: Double = totalNs.get() / 1e9

  /** Number of outermost builds. */
  def count: Long = builds.get()
}
