package graft.rules

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("saltedAggregate equals the direct aggregation on a skewed key") {
    // one hot key with 10k rows, many cold keys with 1
    val hot = (1 to 10000).map(i => ("hot", i.toLong))
    val cold = (1 to 50).map(i => (s"cold_$i", i.toLong))
    val df = (hot ++ cold).toDF("k", "v")

    val direct = df.groupBy("k")
      .agg(org.apache.spark.sql.functions.sum("v").as("v"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max("v").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val salted = Skew.saltedAggregate(df, Seq("k"), saltFactor = 8,
        Skew.SaltedAgg.sumOf("v"), Skew.SaltedAgg.countAll("n"), Skew.SaltedAgg.maxOf("v", "mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    assert(salted == direct)
  }

  test("saltedJoin equals the plain join, inner and left, hot key spread over salts") {
    val hot = (1 to 5000).map(i => (i.toLong, "hot"))
    val cold = (5001 to 5050).map(i => (i.toLong, s"cold_$i"))
    val unmatched = Seq((9999L, "nowhere"))
    val left = (hot ++ cold ++ unmatched).toDF("id", "k")
    val right = (Seq(("hot", 1.0)) ++ (5001 to 5050).map(i => (s"cold_$i", i / 10.0)))
      .toDF("k", "w")

    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "k", "w").as[(Long, String, Option[Double])].collect().toSet
    assert(rowsOf(Skew.saltedJoin(left, right, Seq("k"), 8)) ==
      rowsOf(left.join(right, Seq("k"), "inner")))
    assert(rowsOf(Skew.saltedJoin(left, right, Seq("k"), 8, "left")) ==
      rowsOf(left.join(right, Seq("k"), "left")))
    // the join keys include the salt: the hot key is no longer one partition
    val plan = Skew.saltedJoin(left, right, Seq("k"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt__"))
  }

  test("salted plan contains two aggregation exchanges (partial then merge)") {
    val df = (1 to 100).map(i => ("k", i.toLong)).toDF("k", "v")
    val plan = Skew.saltedAggregate(df, Seq("k"), 4, Skew.SaltedAgg.sumOf("v"))
      .queryExecution.executedPlan.toString
    // partial exchange on (k, salt), merge exchange on k alone
    assert(plan.contains("Exchange hashpartitioning(k#") )
    assert(plan.linesIterator.exists(l => l.contains("Exchange hashpartitioning") && l.contains("__salt__")))
    assert(plan.linesIterator.exists(l => l.contains("Exchange hashpartitioning") && !l.contains("__salt__")))
  }
}
