package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs; sf0.001 keeps suites fast. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSpec.session

  /** Plan text with the scan-parallelism-floor exchanges removed (r20):
    * Tables' fanOut adds one REPARTITION_BY_COL hash exchange per fact
    * table at gate scale (a no-op once the scan itself yields enough
    * splits — cluster scale). Plan-shape audits assert about an
    * OPERATOR's own shuffles, so the floor's lines are filtered before
    * counting; planner-inserted (ENSURE_REQUIREMENTS) exchanges still
    * count in full. */
  def sansFanOut(plan: String): String = {
    // the floor repartitions by a fact table's primary key with explicit
    // N (REPARTITION_BY_NUM); operator-owned repartitions use other keys
    // (band seg_idx/seg) and stay visible to the audits
    val fanKeys = Seq("doc_id#", "vec_id#", "event_id#",
      "o_orderkey#", "l_orderkey#")
    plan.linesIterator.filterNot(l =>
      l.contains("REPARTITION_BY_NUM") && !l.contains("ReusedExchange") &&
        fanKeys.exists(k => l.contains("hashpartitioning(" + k)))
      .mkString("\n")
  }

  override def afterAll(): Unit = super.afterAll()
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
