package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Native CosineSimilarity expression specs. */
class VectorExprSpec extends SparkSpec {

  test("winnowFps guards: k/w validated at plan time, not inside generated code") {
    import org.apache.spark.sql.functions.col
    for ((k, w) <- Seq((0, 5), (4, 0), (-1, -1))) {
      val e = intercept[IllegalArgumentException] {
        graft.functions.WinnowFunctions.winnowFps(col("text"), k, w)
      }
      assert(e.getMessage.contains(">= 1"), s"k=$k w=$w: ${e.getMessage}")
    }
  }

  test("gramMatrix guards wide embeddings toward the matrix-free path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dim = graft.operators.Similarity.GramMaxDim + 1
    val wide = Seq(1L).toDF("vec_id")
      .select(col("vec_id"),
        array_repeat(lit(0.5f), dim).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      graft.operators.Similarity.pcaComponentsOn(wide, k = 1, rounds = 1)
    }
    assert(e.getMessage.contains("powerIterate"),
      s"guard must route to the matrix-free path: ${e.getMessage}")
  }

  test("graft_l1 equals the HOF formulation exactly, via Column API and SQL, codegen'd") {
    import spark.implicits._
    val rows = (0L until 200L).map { i =>
      (i, (0 until 64).map(j => (i * 31 + j * 7) % 256),
        (0 until 64).map(j => (i * 13 + j * 11) % 256))
    }
    val df = rows.toDF("id", "a", "b")
    // exact-integer parity with the interpreted aggregate∘zip_with it replaces
    val got = df.select(col("id"),
        VectorFunctions.l1(col("a"), col("b")).as("n"),
        aggregate(zip_with(col("a").cast("array<bigint>"),
            col("b").cast("array<bigint>"), (x, y) => abs(x - y)),
          lit(0L), (acc, x) => acc + x).as("h"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id ${r.getLong(0)}"))
    assert(got.exists(_.getLong(1) > 0), "degenerate all-zero distances")
    // SQL registration (GraftExtensions) — int arrays upcast in the builder
    df.createOrReplaceTempView("l1_probe")
    val viaSql = spark.sql(
      "SELECT id, graft_l1(a, b) AS n FROM l1_probe").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach(r => assert(viaSql(r.getLong(0)) == r.getLong(1)))
    // the fused loop must appear in GENERATED code on its real consumer
    // (c89's verify stage) — codegenStringSeq compiles each subtree, so
    // a Janino error or an interpreted fallback both fail here
    val pairs = graft.operators.Multimodal.phashPairs(
      graft.operators.Multimodal.imagePhashFrames(spark, sfDir))
    pairs.collect() // settle AQE on the final plan
    val pplan = pairs.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(pplan)
    assert(subtrees.exists(t =>
      t._2.contains("Math.abs") && t._2.contains("getLong(")),
      "graft_l1's fused long loop must appear in generated code")
    // null in, null out (BinaryExpression null-safety)
    val nulls = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(nulls.select(VectorFunctions.l1(col("a"), col("b"))).head.isNullAt(0))
  }

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

  test("nearest-cells expression equals the HOF sort/slice derivation at every maxProbe") {
    // corpus vectors against the real label codebook: the native fused
    // loop must reproduce the interpreted transform→array_sort→slice
    // chain row-for-row — rounding (BigDecimal HALF_UP at 6), total
    // order (Double.compare), and tie-break (lowest cell) included
    val cb = graft.operators.Similarity.labelCodebook(spark, sfDir)
    val cbArr = broadcast(cb.agg(
      sort_array(collect_list(struct(col("cell"), col("centroid")))).as("cb")))
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(cbArr)
    for (maxProbe <- Seq(1, 2, Int.MaxValue)) {
      val native = e.select(col("vec_id"),
        posexplode(VectorFunctions.nearestCells(col("v"), col("cb"), maxProbe))
          .as(Seq("i", "s")))
        .select(col("vec_id"), col("i"), col("s.cell"), col("s.ccos"))
      val scored = reverse(array_sort(transform(col("cb"), c =>
        struct(round(VectorFunctions.cosine(col("v"), c.getField("centroid")), 6).as("ccos"),
          (-c.getField("cell")).as("negcell")))))
      val top = if (maxProbe == Int.MaxValue) scored else slice(scored, 1, maxProbe)
      val hof = e.select(col("vec_id"), posexplode(top).as(Seq("i", "s")))
        .select(col("vec_id"), col("i"),
          (-col("s.negcell")).as("cell"), col("s.ccos"))
      assert(native.exceptAll(hof).count() == 0 && hof.exceptAll(native).count() == 0,
        s"maxProbe=$maxProbe: native selection must equal the HOF derivation")
    }
  }

  test("nearest-cells tie-break: lowest cell wins on exact AND rounded-score ties") {
    import spark.implicits._
    // cells 7 and 3 share one centroid (exact tie); cells 9 and 1 differ
    // only past the 6th decimal (unrounded scores differ, ROUNDED scores
    // tie) — both ties must resolve to the LOWER cell id, matching the
    // old window's ORDER BY ccos DESC, cell ASC and d9's -cell struct
    val v = Seq(1.0, 0.0)
    val tieA = Seq(1.0, 1.0)
    // cos(v, (1, 2e-8)) and cos(v, (1, 1e-8)) both round to 1.0 at 6dp
    val df = Seq((0L, v)).toDF("vec_id", "v")
      .crossJoin(Seq(Seq(
        (7, tieA), (3, tieA), (9, Seq(1.0, 2e-8)), (1, Seq(1.0, 1e-8))))
        .toDF("cb"))
      .select(col("vec_id"),
        posexplode(VectorFunctions.nearestCells(col("v"), col("cb"), 4))
          .as(Seq("i", "s")))
      .select(col("i"), col("s.cell"), col("s.ccos"))
      .collect()
    val order = df.sortBy(_.getAs[Int]("i")).map(r =>
      (r.getAs[Int]("cell"), r.getAs[Double]("ccos"))).toSeq
    // rounded scores: cells 1 and 9 -> 1.0 (rounded tie), cells 3 and 7
    // -> cos(45deg) ~ 0.707107; within each tie the lower cell ranks first
    assert(order.map(_._1) == Seq(1, 9, 3, 7),
      s"tie-break must prefer the lowest cell: got $order")
    assert(order(0)._2 == 1.0 && order(1)._2 == 1.0)
    assert(order(2)._2 == order(3)._2)
  }

  test("nearest-cells generated code compiles (no interpreted fallback)") {
    // codegenStringSeq COMPILES each whole-stage subtree (a Janino error
    // throws here); the assignment projection must sit inside a codegen
    // stage that references the fused loop, otherwise Spark silently
    // fell back to interpreted eval and the expression's point is lost
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val assigned = graft.operators.Similarity.assignCells(
      e, graft.operators.Similarity.labelCodebook(spark, sfDir), maxProbe = 1)
    assigned.collect() // materialize so AQE has settled on the final plan
    val plan = assigned.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(plan)
    assert(subtrees.nonEmpty, "assignment must plan whole-stage codegen subtrees")
    assert(subtrees.exists(_._2.contains("graft.functions.NearestCells.round6")),
      "the fused nearest-cells loop must appear in generated code")
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

  test("graft_nearest_cells SQL form equals the Column API, maxProbe must be a literal") {
    val viaSql = spark.sql(
      """SELECT graft_nearest_cells(
        |  array(1.0d, 0.0d),
        |  array(struct(0 AS cell, array(1.0d, 0.0d) AS centroid),
        |        struct(1 AS cell, array(0.0d, 1.0d) AS centroid)),
        |  2) AS top""".stripMargin).head.getSeq[org.apache.spark.sql.Row](0)
    assert(viaSql.map(r => (r.getInt(0), r.getDouble(1))) ==
      Seq((0, 1.0), (1, 0.0)), s"got $viaSql")
    val err = intercept[Exception](spark.sql(
      """SELECT graft_nearest_cells(array(1.0d), array(struct(0 AS cell,
        |  array(1.0d) AS centroid)), cast(rand() * 2 AS INT))""".stripMargin).collect())
    assert(err.getMessage.contains("maxProbe"), err.getMessage)
  }

  test("r12 SQL registrations: byte_stage/unstage, uni_tokens, winnow_fps, apply_bpe") {
    // byte staging pair round-trips pure-SQL, incl. the Ġ landmark
    val st = spark.sql(
      "SELECT graft_byte_stage(' the 🙂') AS s, " +
        "graft_byte_unstage(graft_byte_stage(' the 🙂')) AS back").head
    assert(st.getString(0).startsWith("Ġthe"), st.getString(0))
    assert(st.getString(1) == " the 🙂")
    // uni_tokens: NBSP splits; strip_punct must be a literal
    val ut = spark.sql(
      "SELECT graft_uni_tokens('A b,', true) AS t").head.getSeq[String](0)
    assert(ut == Seq("a", "b"), s"got $ut")
    // winnow_fps SQL equals the Column API at the gate geometry
    Tables.documents(spark, sfDir).limit(20).createOrReplaceTempView("wf_sql")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_winnow_fps(text) AS fps FROM wf_sql ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val viaApi = Tables.documents(spark, sfDir).limit(20)
      .select(col("doc_id"), graft.functions.WinnowFunctions
        .winnowFps(col("text"), graft.operators.TextOps.WinnowK,
          graft.operators.TextOps.WinnowW).as("fps"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(viaSql.toSeq == viaApi.toSeq)
    // apply_bpe with an inlined merge-list literal: the c52/c70 rule in SQL
    val bpe = spark.sql(
      "SELECT graft_apply_bpe('Ġthe', array(array('Ġ','t'), array('h','e'), " +
        "array('Ġt','he'))) AS ts").head.getSeq[String](0)
    assert(bpe == Seq("Ġthe"), s"got $bpe")
    // non-literal merges rejected at analysis with a clear message
    val err = intercept[Exception](spark.sql(
      "SELECT graft_apply_bpe('ab', array(array(string(rand()), 'b')))").collect())
    assert(err.getMessage.contains("merges"), err.getMessage)
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
