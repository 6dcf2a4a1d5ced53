package graft.metrics

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Cumulative task-CPU clock: sums TaskMetrics.executorCpuTime (ns)
  * across every completed task in the application.
  *
  * Why it exists (SURVEY §6, r13): the channel micro-benches report
  * wall-clock throughput, which swings with box contention — r10–r12
  * each had a channel dip far below its band on byte-identical code,
  * and a wall-clock number alone cannot distinguish "the box was busy"
  * from "the code got slower". Task CPU seconds are contention-immune
  * (a busy box stretches wall time but not the cycles the tasks
  * themselves burn), so each channel sample now carries its cpu_s next
  * to the wall-clock figure and one round settles the question.
  *
  * Task-end events arrive on the ASYNC listener bus; by the time a
  * caller snapshots, the producing jobs have completed (run()/foreach
  * are blocking) and only bus drain latency remains — [[settled]] polls
  * until the counter stops moving rather than reaching into the
  * private listener-bus flush API. Driver-side work (e.g. the ingest
  * bench's feeder thread) is deliberately outside this clock: it
  * measures the task path, the thing that scales with executors. */
final class CpuClock extends SparkListener {
  private val cpuNs = new AtomicLong(0L)

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
    val m = ev.taskMetrics
    if (m != null) { cpuNs.addAndGet(m.executorCpuTime); () }
  }

  /** Current cumulative CPU ns, after the listener bus has gone quiet
    * (stable for 100 ms, polled at 25 ms). Bounded: if concurrent Spark
    * activity (e.g. a lingering streaming query) keeps completing tasks
    * so the counter never stabilizes, give up after 5 s total and
    * return the latest value — a slightly-early snapshot beats an
    * unbounded spin. */
  def settled(): Long = {
    var prev = cpuNs.get()
    var stableMs = 0
    var totalMs = 0
    while (stableMs < 100 && totalMs < 5000) {
      Thread.sleep(25)
      totalMs += 25
      val cur = cpuNs.get()
      if (cur == prev) stableMs += 25 else { prev = cur; stableMs = 0 }
    }
    cpuNs.get()
  }
}
