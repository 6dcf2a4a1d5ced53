package graft.tools

import graft.operators.ExtractScan

/** Dev-only microbench: per-doc cost of the ExtractScan scanner vs the
  * equivalent java.util.regex chain, on gate-shaped markup — isolates
  * the pure-function cost from the Spark UDF/exchange machinery. */
object ScanProf {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    val docs = (0 until n).map { i =>
      val text = (0 until 40).map(j => s"word${(i + j) % 30}").mkString(" ")
      val close = if (i % 13 == 0) "" else "</script>"
      s"<html><head><title>doc $i</title><style>p{margin:0}</style>" +
        s"<script>var id=$i;$close</head><body><nav><a href=\"/\">home</a>" +
        s"</nav><p><em>doc</em> $text &amp; fin</p><div class=\"ad\">ad " +
        s"unit $i</div><footer>&copy; site $i</footer></body></html>"
    }
    // regex chain mirror (the retired passes, via java.util.regex)
    val blockRe = ("(?i)</?(?:p|div|nav|footer|header|section|article|" +
      "aside|main|title|head|body|html|h[1-6]|hr|br|li|ul|ol|tr|td|thead|" +
      "tbody|tfoot|th|table|blockquote|pre|form)(?=[\\s/>])[^>]*>").r.pattern
    val cmt = "(?s)<!--.*?-->".r.pattern
    val scr = "(?is)<script\\b[^>]*>.*?</script\\s*>".r.pattern
    val sty = "(?is)<style\\b[^>]*>.*?</style\\s*>".r.pattern
    val mark = "(?is)<script\\b|<style\\b|<!--".r.pattern
    val trunc = "(?is)(?:<script\\b|<style\\b|<!--).*$".r.pattern
    val gen = "<[^>]*>".r.pattern
    val ws = "\\s+".r.pattern
    def regexExtract(m: String): (Boolean, Array[String]) = {
      var s = cmt.matcher(m).replaceAll(" ")
      s = scr.matcher(s).replaceAll(" ")
      s = sty.matcher(s).replaceAll(" ")
      val wf = !mark.matcher(s).find()
      s = trunc.matcher(s).replaceAll(" ")
      s = blockRe.matcher(s).replaceAll("\n")
      s = gen.matcher(s).replaceAll(" ")
      Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
        "&apos;" -> "'", "&nbsp;" -> " ", "&copy;" -> "©", "&amp;" -> "&")
        .foreach { case (k, v) => s = s.replace(k, v) }
      val lines = s.split("\n", -1)
        .map(l => ws.matcher(l).replaceAll(" ").trim)
        .filter(l => l.nonEmpty && l.split(" ").length >= 4)
      (wf, lines)
    }
    def time(tag: String)(body: => Long): Unit = {
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        val sink = body
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[scanprof] $tag run$r: $s%.3f s (${s * 1e6 / n}%.1f us/doc, sink=$sink)")
      }
    }
    time("scanner") {
      docs.map(d => ExtractScan.extract(d, 4)._2.length.toLong).sum
    }
    time("regex") {
      docs.map(d => regexExtract(d)._2.length.toLong).sum
    }
  }
}

/** Piecewise Spark-side isolation of c117's stage cost. */
object ScanProfSpark {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables.documentsFanned(spark, dir)
      .select(col("doc_id"), graft.operators.Extract.gateMarkup.as("html"))
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[scanprofspark] $tag run$r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    time("a_synth_only")(docs.select(length(col("html")).as("n")))
    val ex = udf((m: String) =>
      if (m == null) (false, Array.empty[String])
      else graft.operators.ExtractScan.extract(m, 4)).asNondeterministic()
    time("b_synth_udf")(docs.select(col("doc_id"), ex(col("html")).as("__ex")))
    time("c_fields")(docs.select(col("doc_id"), ex(col("html")).as("__ex"))
      .select(col("doc_id"), col("__ex._1").as("wf"),
        size(col("__ex._2")).cast("bigint").as("n_lines"),
        array_join(col("__ex._2"), "\n").as("extracted")))
    time("d_full_c117")(graft.operators.Extract.c117HtmlExtract(spark, dir))
    time("e_no_sort")(graft.operators.Extract.htmlExtractOn(docs))
    spark.stop()
  }
}
