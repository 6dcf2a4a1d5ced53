package graft.metrics

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerTaskEnd}

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
  * R15 — JOB-GROUP attribution: the r14 driver run produced a convert
  * cpu_s sample of 251.87 s on untouched convert code, because the
  * windowed-delta reading (settle, run, settle, subtract) charges a
  * sample with EVERY task that happens to complete inside its window —
  * including stragglers from a previous channel's streaming query whose
  * task-end events were still draining off the async listener bus when
  * [[settled]]'s 5 s cap gave up. The fix is attribution, not timing:
  * [[onJobStart]] records each stage's owning job group
  * (`spark.jobGroup.id`, set by `SparkContext.setJobGroup` for batch
  * samples and by StreamExecution to the query's runId for streaming),
  * [[onTaskEnd]] credits the task's CPU to that group, and a channel
  * sample reads ONLY its own group's counter — a foreign task can
  * arrive whenever it likes and it lands in its own bucket.
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
  private val stageGroup = new ConcurrentHashMap[Int, String]()
  private val jobStages = new ConcurrentHashMap[Int, Seq[Int]]()
  // group counters are CUMULATIVE for the listener's lifetime — a
  // caller reads a group after its jobs finish, so they cannot be
  // evicted on job end; the bench creates O(samples) groups, bounded.
  private val groupNs = new ConcurrentHashMap[String, AtomicLong]()
  // r16 per-sample ledger: task count and input volume per group, so a
  // breaching cpu_s sample SHOWS whether it did extra work (an evicted
  // cache recompute = more tasks + parquet-sized input rows) rather
  // than leaving weather-vs-code to argument. Input metrics count both
  // file reads and block-manager (cache) reads.
  private val groupTasks = new ConcurrentHashMap[String, AtomicLong]()
  private val groupRows = new ConcurrentHashMap[String, AtomicLong]()
  private val groupBytes = new ConcurrentHashMap[String, AtomicLong]()

  override def onJobStart(ev: SparkListenerJobStart): Unit = {
    val gid = Option(ev.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
    gid.foreach { g =>
      ev.stageIds.foreach(sid => stageGroup.put(sid, g))
      jobStages.put(ev.jobId, ev.stageIds)
      ()
    }
  }

  /** Evict the finished job's stage→group entries (r16, ADVICE: the
    * maps grew unboundedly over a long-lived context). The listener
    * bus delivers events in post order, so a job's task-end events
    * precede its job-end; only a cancelled/speculative straggler can
    * end after eviction, and it falls back to the global counter only
    * — exactly the samples a cancelled job shouldn't be charged for. */
  override def onJobEnd(ev: SparkListenerJobEnd): Unit = {
    val sids = jobStages.remove(ev.jobId)
    if (sids != null) sids.foreach(stageGroup.remove(_))
  }

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
    val m = ev.taskMetrics
    if (m != null) {
      val ns = m.executorCpuTime
      cpuNs.addAndGet(ns)
      val g = stageGroup.get(ev.stageId)
      if (g != null) {
        def bump(map: ConcurrentHashMap[String, AtomicLong], v: Long): Unit = {
          map.computeIfAbsent(g, _ => new AtomicLong(0L)).addAndGet(v)
          ()
        }
        bump(groupNs, ns)
        bump(groupTasks, 1L)
        bump(groupRows, m.inputMetrics.recordsRead)
        bump(groupBytes, m.inputMetrics.bytesRead)
      }
    }
  }

  private def groupGet(group: String): Long = {
    val c = groupNs.get(group)
    if (c == null) 0L else c.get()
  }

  /** Poll `read` until it is stable for 100 ms (25 ms steps), give up
    * after 5 s: a slightly-early snapshot beats an unbounded spin when
    * concurrent activity keeps the counter moving. */
  private def settle(read: () => Long): Long = {
    var prev = read()
    var stableMs = 0
    var totalMs = 0
    while (stableMs < 100 && totalMs < 5000) {
      Thread.sleep(25)
      totalMs += 25
      val cur = read()
      if (cur == prev) stableMs += 25 else { prev = cur; stableMs = 0 }
    }
    read()
  }

  /** Current cumulative CPU ns across ALL tasks, after the listener bus
    * has gone quiet. The per-query suite uses this chained (nothing else
    * runs concurrently there); channel samples use [[settledGroup]]. */
  def settled(): Long = settle(() => cpuNs.get())

  /** Cumulative CPU ns attributed to one job group, bus-settled. Reads
    * only tasks whose stage belongs to `group` — immune to foreign
    * task-end events landing in the sample's wall window. */
  def settledGroup(group: String): Long = settle(() => groupGet(group))

  /** Bus-settled per-group ledger: cpu + task count + input volume.
    * Settles on cpuNs PLUS the task counter: a task reporting zero
    * executorCpuTime (legitimately possible for a near-empty task)
    * bumps tasks/rows/bytes without moving cpu, so settling on cpu
    * alone could return while such events still drain. Both counters
    * only increase, so a stable sum means both are stable — and every
    * task-end moves it. */
  def settledGroupLedger(group: String): CpuClock.GroupLedger = {
    def get(map: ConcurrentHashMap[String, AtomicLong]): Long = {
      val c = map.get(group)
      if (c == null) 0L else c.get()
    }
    settle(() => groupGet(group) + get(groupTasks))
    CpuClock.GroupLedger(groupGet(group), get(groupTasks),
      get(groupRows), get(groupBytes))
  }
}

object CpuClock {
  /** One sample's self-diagnosis record (r16): what the group's tasks
    * actually did, next to what they cost. */
  final case class GroupLedger(cpuNs: Long, tasks: Long,
                               inputRows: Long, inputBytes: Long)
}
