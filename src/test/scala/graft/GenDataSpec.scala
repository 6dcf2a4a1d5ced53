package graft

import org.apache.spark.sql.functions._

import graft.tools.GenData

/** Scale-rehearsal corpus generator specs (r18, SURVEY §8p): the sf1.0
  * rehearsal's evidentiary value rests on the generated corpus being
  * schema-identical to the driver tables and deterministic — both are
  * pinned here at a tiny SF so the suite stays fast. */
class GenDataSpec extends SparkSpec {

  private def gen(tag: String): String = {
    val out = java.nio.file.Files
      .createTempDirectory(s"graft-gendata-$tag-").toString
    GenData.generate(spark, 0.001, out)
    out
  }

  test("generated corpus is schema-identical to the driver tables and row counts scale") {
    val out = gen("schema")
    Tables.names.foreach { t =>
      val drv = Tables.load(spark, sfDir, t)
      val g = Tables.load(spark, out, t)
      assert(g.schema == drv.schema,
        s"$t schema diverged:\n gen=${g.schema.treeString}\n drv=${drv.schema.treeString}")
    }
    // row counts at the driver's sf0.001 scale (lineitem is 4/order by
    // construction; the driver corpus averages the same 4 via 1..7)
    assert(Tables.documents(spark, out).count() == 50L)
    assert(Tables.load(spark, out, "lineitem").count() == 6000L)
    assert(Tables.load(spark, out, "embeddings").count() == 20L)
    // the operator-sensitive invariants: n_chars = length(text), every
    // embedding L2-normalized, events ts inside the 30-day window
    assert(Tables.documents(spark, out)
      .filter(col("n_chars") =!= length(col("text"))).count() == 0)
    val badNorm = Tables.embeddings(spark, out)
      .select(abs(sqrt(aggregate(col("embedding"), lit(0.0),
        (a, x) => a + x * x)) - 1.0).as("d"))
      .filter(col("d") > 1e-5).count()
    assert(badNorm == 0, "embeddings must be L2-normalized")
    ()
  }

  test("generation is deterministic: two runs produce byte-identical tables") {
    val a = gen("det-a"); val b = gen("det-b")
    Seq("documents", "lineitem", "embeddings").foreach { t =>
      val da = Tables.load(spark, a, t)
      val db = Tables.load(spark, b, t)
      assert(da.exceptAll(db).isEmpty && db.exceptAll(da).isEmpty,
        s"$t differs between two identical generations")
    }
  }

  test("documents carry the dup structure the dedup family needs") {
    // at a bigger slice so the ~5% near-dup rate is visible
    val out = java.nio.file.Files
      .createTempDirectory("graft-gendata-dup-").toString
    GenData.generate(spark, 0.01, out)
    val docs = Tables.documents(spark, out).persist()
    val n = docs.count()
    val nears = docs.filter(col("text").endsWith(" dup")).count()
    assert(nears >= n / 50 && nears <= n / 10,
      s"near-dup rate off: $nears of $n")
    // every near-dup's base text is some doc's full text (the driver
    // corpus's structure: base + " dup")
    val bases = docs.filter(col("text").endsWith(" dup"))
      .select(expr("substring(text, 1, length(text) - 4)").as("text"))
    val matched = bases.join(
      docs.filter(!col("text").endsWith(" dup")).select("text"),
      Seq("text"), "left_semi").count()
    assert(matched >= nears * 9 / 10,
      s"near-dup bases must overlap real docs: $matched of $nears")
    docs.unpersist()
    ()
  }

  test("open-vocab mode (r19): ~50k-word space, dup structure preserved, " +
    "schema unchanged") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-gendata-open-").toString
    GenData.generate(spark, 0.01, out, openVocab = true)
    val docs = Tables.documents(spark, out).persist()
    val drv = Tables.documents(spark, sfDir)
    assert(docs.schema == drv.schema, "open-vocab mode must not change schema")
    // the word space must be ORDERS bigger than 30 — the c2 realism knob:
    // on 500 docs × ~55 words even a few thousand distinct types proves
    // the 50021-word space is in play (30-word mode caps at 31)
    val types = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "dup").select("w").distinct().count()
    assert(types > 5000L, s"open vocab produced only $types word types")
    assert(docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^w\\d{5}$|^dup$")).count() ==
      docs.select(explode(split(col("text"), " "))).count(),
      "open-vocab words must all be w%05d-shaped (plus the dup marker)")
    // the near-dup structure is mode-independent (same seed mechanism)
    val n = docs.count()
    val nears = docs.filter(col("text").endsWith(" dup")).count()
    assert(nears >= n / 50 && nears <= n / 10, s"near-dup rate off: $nears of $n")
    val bases = docs.filter(col("text").endsWith(" dup"))
      .select(expr("substring(text, 1, length(text) - 4)").as("text"))
    val matched = bases.join(
      docs.filter(!col("text").endsWith(" dup")).select("text"),
      Seq("text"), "left_semi").count()
    assert(matched >= nears * 9 / 10,
      s"near-dup bases must overlap real docs: $matched of $nears")
    docs.unpersist()
    ()
  }
}
