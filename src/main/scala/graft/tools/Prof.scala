package graft.tools

import org.apache.spark.sql.{Column, functions => F}
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
    time("docs count warm")(docs.count())
    time("docs count warm2")(docs.count())

    // current impl
    val shA = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    time("A slice+concat_ws x1")(shA.select(explode(col("sh"))).count())
    time("A slice+concat_ws x2")(shA.select(explode(col("sh"))).count())

    // element_at variant
    def shinglesB(text: Column): Column = {
      val toks = split(lower(text), " ")
      val n = size(toks)
      when(n >= 3,
        array_distinct(transform(sequence(lit(0), n - 3), i =>
          concat(element_at(toks, i + 1), lit(" "),
            element_at(toks, i + 2), lit(" "), element_at(toks, i + 3)))))
        .otherwise(array().cast("array<string>"))
    }
    val shB = docs.select(col("doc_id"), shinglesB(col("text")).as("sh"))
    time("B element_at x1")(shB.select(explode(col("sh"))).count())
    time("B element_at x2")(shB.select(explode(col("sh"))).count())

    // explode positions then build shingle from exploded index (no HOF)
    val toks = split(lower(col("text")), " ")
    val shC = docs.select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), col("t"), explode(sequence(lit(0), greatest(size(col("t")) - 3, lit(-1)))).as("i"))
      .select(col("doc_id"), concat(element_at(col("t"), col("i") + 1), lit(" "),
        element_at(col("t"), col("i") + 2), lit(" "), element_at(col("t"), col("i") + 3)).as("shingle"))
      .distinct()
    time("C explode-index x1")(shC.count())
    time("C explode-index x2")(shC.count())

    time("minhash force (A)")(shA.select(
      (0 until 8).map(i => array_min(transform(col("sh"), s => md5(concat(lit(s"$i:"), s)))).as(s"mh$i")): _*)
      .agg(F.max(col("mh0"))).count())
    spark.stop()
  }
}
