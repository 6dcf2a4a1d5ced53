package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** Dev-only stage profiler (r20): runs the named queries once under a
  * listener that prints per-stage task counts and where the task time
  * went (cpu / run / deserialize / gc / shuffle-write), to localize the
  * fixed per-task overhead the optimization round is chasing. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.StageProbe c27_bloom_decontam"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    case class S(var tasks: Int = 0, var cpuNs: Long = 0L, var runMs: Long = 0L,
                 var deserMs: Long = 0L, var gcMs: Long = 0L,
                 var srFetchMs: Long = 0L, var swMs: Long = 0L,
                 var inRows: Long = 0L, var outRows: Long = 0L)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, S]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val s = stages.computeIfAbsent(e.stageId, _ => S())
        val m = e.taskMetrics
        if (m != null) s.synchronized {
          s.tasks += 1; s.cpuNs += m.executorCpuTime; s.runMs += m.executorRunTime
          s.deserMs += m.executorDeserializeTime; s.gcMs += m.jvmGCTime
          s.srFetchMs += m.shuffleReadMetrics.fetchWaitTime
          s.swMs += m.shuffleWriteMetrics.writeTime / 1000000L
          s.inRows += m.inputMetrics.recordsRead
          s.outRows += m.outputMetrics.recordsWritten
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        names.put(e.stageInfo.stageId, e.stageInfo.name.takeWhile(_ != '\n').take(70))
    })
    args.foreach { q =>
      // warmup (memo builds + codegen), then one measured run
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      stages.clear(); names.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let the listener bus drain
      println(f"===== $q wall=$wall%.2fs =====")
      println(f"${"stage"}%-7s ${"tasks"}%5s ${"cpu_s"}%7s ${"run_s"}%7s ${"deser_s"}%7s ${"gc_s"}%6s ${"fetch_s"}%7s ${"in_rows"}%9s  name")
      stages.asScala.toSeq.sortBy(_._1).foreach { case (id, s) =>
        println(f"$id%-7d ${s.tasks}%5d ${s.cpuNs / 1e9}%7.2f ${s.runMs / 1e3}%7.2f " +
          f"${s.deserMs / 1e3}%7.2f ${s.gcMs / 1e3}%6.2f ${s.srFetchMs / 1e3}%7.2f ${s.inRows}%9d  ${names.getOrDefault(id, "?")}")
      }
      val tot = stages.asScala.values
      println(f"TOTAL tasks=${tot.map(_.tasks).sum} cpu=${tot.map(_.cpuNs).sum / 1e9}%.2f " +
        f"run=${tot.map(_.runMs).sum / 1e3}%.2f deser=${tot.map(_.deserMs).sum / 1e3}%.2f gc=${tot.map(_.gcMs).sum / 1e3}%.2f")
    }
    spark.stop()
  }
}
