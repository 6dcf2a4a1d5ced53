package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Scratch profiler for operator stages (dev aid, not part of the API). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val docs = Tables.documents(spark, dir)
    time("warmup")(docs.count())

    // c2 stage decomposition
    val toks = split(lower(col("text")), " ")
    val parts = (0 until 3).flatMap(j =>
      Seq(element_at(col("t"), col("i") + (j + 1)), lit(" "))).dropRight(1)
    val sh = docs.select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - 3)).as("i"))
      .select(col("doc_id"), concat(parts: _*).as("shingle"))
      .distinct()
    time("sh rows")(sh.count())
    val mhCols = (0 until 8).map(i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"mh$i")) :+ count(lit(1)).as("ns")
    val mh = sh.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
    time("mh agg")(mh.count())
    val bandKeys = mh.select(col("doc_id"), posexplode(array(
      (0 until 4).map { j =>
        md5(concat_ws("|", col(s"mh${2 * j}"), col(s"mh${2 * j + 1}")))
      }: _*))).toDF("doc_id", "band", "key")
    val pairs = bandKeys.select(col("band"), col("key"), col("doc_id").as("doc_a"))
      .join(bandKeys.select(col("band"), col("key"), col("doc_id").as("doc_b")),
        Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    time("pairs")(pairs.count())
    time("c2 full")(Dedup.c2DedupMinhash(spark, dir).count())
    time("c2 full again")(Dedup.c2DedupMinhash(spark, dir).count())
    spark.stop()
  }
}
