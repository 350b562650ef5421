package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {

  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Html.extractText(col("h"))).as[String].head()

  test("script bodies with stray < are removed as blocks, not tag-stripped") {
    assert(extract("<p>a</p><script>if (1<2) { x(); }</script><p>b</p>") == "a b")
  }

  test("style and comments vanish; nested tags strip to visible text") {
    assert(extract(
      "<style>p{a:1}</style><!-- hidden --><div><b>bold</b> text</div>") == "bold text")
  }

  test("entity decode order: &amp;lt; yields the literal string &lt;, not <") {
    assert(extract("<p>&amp;lt; &amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>")
      == "&lt; & <tag> \"q\" 's'")
  }

  test("multiline blocks collapse: (?s) spans newlines, whitespace normalizes") {
    assert(extract("<script>\nvar a=1;\nvar b=2;\n</script>\n<p>one\n  two</p>")
      == "one two")
  }

  test("title extracts and is empty when absent") {
    val t = Seq("<head><title> T1 </title></head>", "<p>no title</p>")
      .toDF("h").select(Html.title(col("h"))).as[String].collect().toSeq
    assert(t == Seq("T1", ""))
  }

  test("htmlColumns quality signals: boilerplate page has low text ratio") {
    val page = "<html><head><script>" + "x();" * 200 + "</script></head>" +
      "<body><p>tiny</p></body></html>"
    val cols = Html.htmlColumns(col("h"))
    val r = Seq(page).toDF("h")
      .select(cols.map { case (n, c) => c.as(n) }: _*)
      .select("extracted", "text_ratio_micro").as[(String, Long)].head()
    assert(r._1 == "tiny")
    assert(r._2 < 10000L) // < 1% visible text
  }
}
