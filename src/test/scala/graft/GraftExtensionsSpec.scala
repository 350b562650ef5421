package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextStats}
import graft.similarity.Similarity

class GraftExtensionsSpec extends SparkSpec {

  import spark.implicits._

  GraftExtensions.registerAll(spark)

  test("SQL functions reach the same native expressions as the Column API") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT graft_fingerprint(text) AS fp,
        |       graft_simhash(text) AS sh,
        |       size(graft_shingles(text, 3)) AS n_shingles,
        |       size(graft_minhash(graft_shingles(text, 3), 16, 42)) AS n_sig
        |FROM ext_docs""".stripMargin).head()
    val api = df.select(
      TextStats.fingerprint(col("text")).as("fp"),
      Dedup.simHash(col("text")).as("sh"),
      size(Dedup.shingles(col("text"), 3)).as("n_shingles"),
      size(Dedup.minHashSignature(Dedup.shingles(col("text"), 3), 16, 42L)).as("n_sig")).head()
    assert(sql == api)
  }

  test("SQL lsh_code and dot match the similarity Column API") {
    val v = Seq((1L, Seq(0.5f, -0.25f, 1.0f, 0.125f))).toDF("id", "vec")
    v.createOrReplaceTempView("ext_vecs")
    val sql = spark.sql(
      "SELECT graft_lsh_code(vec, 8) AS code, graft_dot(vec, vec) AS dd FROM ext_vecs").head()
    val api = v.select(
      Similarity.lshCode(col("vec"), 8).as("code"),
      graft.similarity.DoubleDotProductExpr.dot(col("vec"), col("vec")).as("dd")).head()
    assert(sql == api)
  }

  test("SQL normalize and accent_fold match the Column API") {
    val df = Seq(Tuple1("Mühleisen résumé")).toDF("t")
    df.createOrReplaceTempView("ext_norm")
    val sql = spark.sql(
      "SELECT graft_normalize(t, 'NFC') AS n, graft_accent_fold(t) AS f FROM ext_norm")
      .as[(String, String)].head()
    val api = df.select(
      graft.text.NormalizeExpression.nfc(col("t")).as("n"),
      graft.text.NormalizeExpression.accentFold(col("t")).as("f"))
      .as[(String, String)].head()
    assert(sql == api)
    assert(sql._2 == "Muhleisen resume")
  }

  test("SQL bpe_merge matches the Column API") {
    val df = Seq(Tuple1(Seq("a", "b", "a", "b"))).toDF("s")
    df.createOrReplaceTempView("ext_bpe")
    val sql = spark.sql("SELECT graft_bpe_merge(s, 'a', 'b') AS m FROM ext_bpe")
      .as[Seq[String]].head()
    assert(sql == Seq("ab", "ab"))
  }

  test("SQL char_entropy matches the Column API") {
    val df = Seq(("aabb"), ("aaaa")).toDF("t")
    df.createOrReplaceTempView("ext_entropy")
    val sql = spark.sql(
      "SELECT graft_char_entropy(t).entropy_micro AS h FROM ext_entropy")
      .as[Long].collect().toSeq
    assert(sql == Seq(693147L, 0L)) // ln 2 micro-nats; single-bin 0
  }

  test("geometry arguments must be integer literals") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_shingles('a b c', id) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }
}
