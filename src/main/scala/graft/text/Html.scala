package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first transform a crawl-derived training
  * corpus applies to every page (the trafilatura/jusText step of CCNet-
  * style pipelines, reduced to its deterministic regex core).
  *
  * Everything is a chain of codegen'd `regexp_replace`/`regexp_extract`
  * columns in the RE2 ∩ java.util.regex subset (non-greedy + `(?s)` only),
  * so an external engine replicates the extraction byte-for-byte and the
  * whole lane stays inside whole-stage codegen — per-row narrow work, no
  * UDF, no shuffle, which is the only acceptable shape for a transform
  * that touches EVERY byte of a 100 TB crawl.
  *
  * Order matters and is load-bearing: script/style/comment BLOCKS drop
  * first (their bodies may contain `<` that is not markup — `var x=1<2`),
  * then remaining tags, then entity decoding (`&amp;` strictly last so a
  * literal `&amp;lt;` decodes to `&lt;` and not to `<`), then whitespace
  * normalization.
  */
object Html {

  /** Visible text of an HTML fragment. */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&nbsp;", " "), "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The `<title>` text, empty string when absent. */
  def title(html: Column): Column =
    trim(regexp_extract(html, "(?s)<title[^>]*>(.*?)</title>", 1))

  /** Extraction + page-quality signals: a page whose visible text is a
    * tiny fraction of its markup is boilerplate/navigation, the standard
    * text-density prefilter before any content-quality scoring.
    */
  def htmlColumns(html: Column): Seq[(String, Column)] = {
    val text = extractText(html)
    Seq(
      "title" -> title(html),
      "extracted" -> text,
      "n_tags" -> regexp_count(html, lit("<[A-Za-z!/][^>]*>")).cast("bigint"),
      // visible-text chars per page char, integer micro-units. floor over
      // one IEEE division of exact integers — both engines round the
      // quotient identically, so the floor agrees cross-engine.
      "text_ratio_micro" ->
        floor(length(text).cast("double") * lit(1000000.0) / length(html).cast("double"))
          .cast("bigint"))
  }
}
