package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway timing probe for the wp02 acquire tail. */
object Wp02Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warm
    spark.read.parquet(s"$dir/documents.parquet").count()
    import graft.functions.{HtmlFunctions, TextFunctions, UrlFunctions}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // the same synth markup wp01 uses (private there; rebuilt here)
    val html = concat(
      lit("<html><!-- id "), col("doc_id").cast("string"),
      lit(" --><head><style>p{color:red}</style>" +
        "<script>var x=1; if (x<2) { x = 3; }</script></head><body>" +
        "<h1>Doc "),
      col("doc_id").cast("string"),
      lit("</h1><p>"), col("text"),
      lit("</p><div>Tom &amp; Jerry &lt;3 <b>bold</b>&nbsp;and " +
        "&quot;quotes&quot; it&#39;s done, R&D dept, A&#65;&#x42;Z " +
        "caf&#233; won&#8217;t &amp;#38; &#bad;</div></body></html>"))
    for (i <- 1 to 3) {
      println(s"-- iteration $i --")
      time("stripTags only (no ent)")(
        docs.select(regexp_replace(html, "<[^>]*>", " ").as("c"))
          .agg(sum(length(col("c")))).head())
      time("stripHtml forced")(
        docs.select(HtmlFunctions.stripHtml(html).as("c"))
          .agg(sum(length(col("c")))).head())
      time("decodeEntities only")(
        docs.select(HtmlFunctions.decodeEntities(html).as("c"))
          .agg(sum(length(col("c")))).head())
      time("quality on text")(
        docs.select(TextFunctions.qualityScore(col("text")).as("q"))
          .agg(sum(col("q"))).head())
      time("strip+tokens+quality")(
        docs.select(HtmlFunctions.stripHtml(html).as("c"))
          .select(TextFunctions.tokenCountNonEmpty(col("c")).as("n"),
            TextFunctions.qualityScore(col("c")).as("q"))
          .agg(sum(col("n") + col("q"))).head())
      val wp01 = time("wp01 count (pruned)")(
        SparkEntry.queries("wp01_web_pipeline")(spark, dir).count())
      val wp02 = time("wp02 full")(
        SparkEntry.queries("wp02_web_acquire")(spark, dir).count())
      println(s"rows: wp01=$wp01 wp02=$wp02")
    }
    spark.stop()
  }
}
