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
