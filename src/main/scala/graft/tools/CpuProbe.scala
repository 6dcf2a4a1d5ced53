package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic main (dev tool, not part of the library surface): replays
  * the bench's convert channel sample N times and prints, per sample,
  * the wall clock, the job-group CPU ledger, the JVM's GC time delta,
  * and the process CPU delta — to adjudicate whether a breaching
  * channel cpu_s is real task CPU, GC-inflated task CPU, or a
  * measurement artifact. See SURVEY §6 / §8n. */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = graft.GraftSession.get()
    val cpuClock = new graft.metrics.CpuClock
    spark.sparkContext.addSparkListener(cpuClock)
    val ev = graft.Tables.events(spark, sfDir).select(
      col("event_id"), unix_micros(col("ts")).as("ts_us"),
      col("user_id"), col("event_type"), col("value"))
    val lines = ev.select(to_json(struct(ev.columns.map(col): _*)).as("value"))
      .withColumn("r", explode(sequence(lit(1), lit(8)))).drop("r")
      .repartition(32).cache()
    lines.count()
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // warmup outside the clock (the bench does the same)
    ArrowRun.run(spark, graft.ipc.ArrowIpc.serialize(
      graft.streaming.StreamPipeline.convert(lines, ev.schema),
      maxRows = 4096).toDF())
    for (i <- 1 to rounds) {
      spark.sparkContext.setJobGroup(s"probe-warm-$i", "warm")
      lines.count()
      spark.sparkContext.clearJobGroup()
      val gc0 = gcMs
      val pc0 = osBean.getProcessCpuTime
      spark.sparkContext.setJobGroup(s"probe-$i", "probe")
      val t0 = System.nanoTime()
      ArrowRun.run(spark, graft.ipc.ArrowIpc.serialize(
        graft.streaming.StreamPipeline.convert(lines, ev.schema),
        maxRows = 4096).toDF())
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      val led = cpuClock.settledGroupLedger(s"probe-$i")
      val gcD = gcMs - gc0
      val pcD = (osBean.getProcessCpuTime - pc0) / 1e9
      println(f"[probe] round=$i wall=$wall%.2f cpu_s=${led.cpuNs / 1e9}%.2f " +
        f"tasks=${led.tasks} rows=${led.inputRows} mb=${led.inputBytes / 1e6}%.1f " +
        f"gc_ms=$gcD proc_cpu_s=$pcD%.2f")
    }
    spark.stop()
  }
}

/** The bench's run(): materialize a frame without collecting it. */
object ArrowRun {
  def run(spark: org.apache.spark.sql.SparkSession,
          df: org.apache.spark.sql.DataFrame): Unit = {
    df.write.format("noop").mode("overwrite").save()
    ()
  }
}
