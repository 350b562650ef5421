package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {

  import spark.implicits._

  test("quality columns compute token stats") {
    val df = Seq("the cat sat on the mat").toDF("text")
    val out = df.select(TextStats.qualityColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
    val r = out.head()
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("n_distinct_tokens") == 5)
    assert(math.abs(r.getAs[Double]("mean_token_len") - 17.0 / 6) < 1e-4)
    assert(r.getAs[Double]("alpha_ratio") > 0.7)
  }

  test("languageId picks the language with most stopword hits, deterministic tiebreak") {
    val df = Seq(
      ("en", "the cat is on the mat and it is happy"),
      ("de", "der hund ist nicht der beste und das ist gut"),
      ("es", "el perro es un animal que vive en la casa"),
      ("und", "zzz qqq www")
    ).toDF("expected", "text")
    val out = df.select(col("expected"), TextStats.languageId(col("text")).as("got"))
    assert(out.where("expected != got").count() == 0)
  }

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq("ab c", "ba c").toDF("text")
    val fps = df.select(TextStats.fingerprint(col("text"))).as[Long].collect()
    assert(fps(0) != fps(1))
    assert(fps.forall(f => f >= 0 && f < (1L << 32)))
    // h("ab c") = fold over codepoints from seed 17
    val expected = "ab c".foldLeft(17L)((h, c) => (h * 31 + c.toLong) % 4294967296L)
    assert(fps(0) == expected)
  }

  test("bpeish token count splits letter runs, digits, and punctuation runs") {
    val df = Seq("hello world 42!!").toDF("text")
    // tokens: hello, world, 4, 2, !!
    assert(df.select(TextStats.bpeishTokenCount(col("text"))).as[Int].head() == 5)
  }

  test("repetition fractions are whitespace-run-proof and never negative") {
    val df = Seq(
      ("single", "a b a b a b"),            // 5 bigram slots, 2 distinct -> 0.6
      ("runs", "a  b \t a\nb  a  b"),       // same token stream, messy whitespace
      ("unique", "one two three four five") // no repeats -> 0.0
    ).toDF("id", "text")
    val out = df.select(col("id") +:
      TextStats.repetitionColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("single") == 0.6)
    assert(out("runs") == out("single")) // whitespace runs must not change the fraction
    assert(out("unique") == 0.0)
    // adversarial: consecutive separators only
    val weird = Seq("a  b  c").toDF("text")
      .select(TextStats.repetitionColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
      .head()
    assert(weird.getDouble(0) >= 0.0 && weird.getDouble(1) >= 0.0)
  }

  test("urlColumns counts URLs and lists sorted distinct domains") {
    val df = Seq(
      "read https://b.org/x and http://a.net and https://b.org/y",
      "no links here").toDF("text")
    val out = df.select(TextStats.urlColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
      .as[(Long, String)].collect()
    assert(out(0) == ((3L, "a.net,b.org")))
    assert(out(1) == ((0L, "")))
  }

  test("stopwordRatio counts repeated hits") {
    val df = Seq("the the the word").toDF("text")
    val r = df.select(TextStats.stopwordRatio(TextStats.tokens(col("text")), Seq("the"))).as[Double].head()
    assert(r == 0.75)
  }
}
