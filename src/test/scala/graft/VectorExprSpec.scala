package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Native CosineSimilarity expression specs. */
class VectorExprSpec extends SparkSpec {

  test("cosine expression matches a hand-computed value and the HOF formulation") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).head.getDouble(0)
    val expect = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - expect) < 1e-15)
    // HOF reference formulation, same accumulation order
    val hof = df.select(
      (aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, x) => s + x) /
        (sqrt(aggregate(col("a"), lit(0.0), (s, x) => s + x * x)) *
         sqrt(aggregate(col("b"), lit(0.0), (s, x) => s + x * x))))).head.getDouble(0)
    assert(got == hof, "bit-identical to the interpreted formulation")
  }

  test("cosine handles float input arrays via cast and null inputs") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine(col("a"), col("b"))).head.getDouble(0) == 1.0)
    val withNull = df.select(VectorFunctions.cosine(lit(null).cast("array<double>"), col("b")))
    assert(withNull.head.isNullAt(0))
  }

  test("graft_cosine is registered for SQL via GraftExtensions") {
    val v = spark.sql(
      "SELECT graft_cosine(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS c").head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("graft_lsh_bucket / graft_lsh_project SQL forms equal the Column API") {
    Tables.embeddings(spark, sfDir).limit(50).createOrReplaceTempView("ve_sql")
    val viaSql = spark.sql(
      """SELECT vec_id, graft_lsh_bucket(embedding, 6) AS bucket,
        |  graft_lsh_project(embedding, 16) AS proj
        |FROM ve_sql ORDER BY vec_id""".stripMargin).collect()
    val viaApi = Tables.embeddings(spark, sfDir).limit(50)
      .select(col("vec_id"),
        VectorFunctions.hyperplaneBucket(col("embedding"),
          VectorFunctions.lshPlanes(6, 64)).as("bucket"),
        VectorFunctions.hyperplaneProject(col("embedding"),
          VectorFunctions.lshPlanes(16, 64, seed = "graft:rp")).as("proj"))
      .orderBy("vec_id").collect()
    viaSql.zip(viaApi).foreach { case (s, a) =>
      assert(s.getString(1) == a.getString(1), s"bucket mismatch vec ${s.getLong(0)}")
      assert(s.getSeq[Long](2) == a.getSeq[Long](2), s"proj mismatch vec ${s.getLong(0)}")
    }
  }

  test("c5 results are unchanged by the native expression (vs collected ground truth)") {
    val e = Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = graft.operators.Similarity.c5AnnBrute(spark, sfDir).collect()
    got.foreach { r =>
      val q = e(r.getAs[Long]("query_id")); val n = e(r.getAs[Long]("neighbor_id"))
      assert(math.abs(r.getAs[Double]("cosine_r") - cos(q, n)) < 1e-6)
    }
  }
}
