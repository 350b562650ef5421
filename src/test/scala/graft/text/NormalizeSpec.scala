package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {

  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): String =
    Seq(Tuple1(text)).toDF("t").select(c).as[String].head()

  test("NFC composes decomposed sequences and is identity on composed text") {
    // "e\u0301" (e + COMBINING ACUTE ACCENT) composes to U+00E9
    val decomposed = "cafe\u0301"
    val composed = "caf\u00e9"
    assert(one(decomposed, NormalizeExpression.nfc(col("t"))) == composed)
    assert(one(composed, NormalizeExpression.nfc(col("t"))) == composed)
  }

  test("NFKC folds compatibility forms (fullwidth, ligature)") {
    assert(one("ＡＢ", NormalizeExpression.nfkc(col("t"))) == "AB")
    assert(one("ﬁle", NormalizeExpression.nfkc(col("t"))) == "file")
  }

  test("accent folding strips combining marks from both composed and decomposed input") {
    assert(one("Mühleisen résumé", NormalizeExpression.accentFold(col("t")))
      == "Muhleisen resume")
    assert(one("résumé", NormalizeExpression.accentFold(col("t")))
      == "resume")
    // no canonical decomposition -> passes through (documented contract)
    assert(one("øre", NormalizeExpression.accentFold(col("t"))) == "øre")
  }

  test("canonicalText folds case, quotes, dashes and whitespace, and is idempotent") {
    val messy = "  “Quoted” — café’s   BEST\tdeal  "
    val oneApplied = one(messy, NormalizeExpression.canonicalText(col("t")))
    assert(oneApplied == "\"quoted\" - cafe's best deal")
    val twice = one(oneApplied, NormalizeExpression.canonicalText(col("t")))
    assert(twice == oneApplied)
  }

  test("normalization expressions stay inside whole-stage codegen") {
    val df = spark.range(8)
      .select(concat(lit("T– "), col("id").cast("string")).as("t"))
      .select(NormalizeExpression.canonicalText(col("t")).as("n"))
    // "*(n)" prefixes mark whole-stage-codegen stages in the simple format
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
