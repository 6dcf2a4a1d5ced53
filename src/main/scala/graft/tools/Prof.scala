package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch profiler for operator stages (dev aid, not part of the API).
  * Usage: runMain graft.tools.Prof [queryName ...] — times each named
  * query (default: a2/a3) over SPARK_GRAFT_SF_DIR, cold then warm, via
  * the noop sink (same timed shape as Bench). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("a2_json_battery", "a3_json_trip")
    names.foreach { n =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $n run$i: $s%.2f s")
      }
    }
    spark.stop()
  }
}
