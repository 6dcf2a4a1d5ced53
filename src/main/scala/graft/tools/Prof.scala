package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch profiler for operator stages (dev aid, not part of the API). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Seq("a2_json_battery", "a3_json_trip").foreach { n =>
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution.optimizedPlan.toString
      val count = "from_json".r.findAllIn(plan).length
      println(s"[prof] $n from_json occurrences in optimized plan: $count")
    }
    spark.stop()
  }
}
