package graft.contract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric REPAIR — the act-on-it sibling of [[Contract.profile]]'s
  * detect-only statistics: winsorization (clip to percentile bounds, the
  * standard treatment before aggregates that outliers would poison) and
  * robust outlier flagging by median/MAD z-score (which, unlike the
  * mean/stddev z-score, is not itself dragged by the outliers it hunts).
  *
  * Both follow the q_percentiles discipline: EXACT interpolated
  * percentiles (one aggregation, buffered — verification scale), with
  * `approx_percentile` as the documented same-shape production swap;
  * thresholds round to 6 decimals and broadcast back, the repair itself
  * is a per-row projection.
  */
object Repair {

  /** Clip `valueCol` into [pLow, pHigh] percentile bounds; emits the
    * bounds, the repaired value, and whether the row was clipped.
    */
  def winsorize(df: DataFrame, valueCol: String,
                pLowPerMille: Int = 10, pHighPerMille: Int = 990): DataFrame = {
    require(pLowPerMille >= 0 && pHighPerMille <= 1000 && pLowPerMille < pHighPerMille)
    val c = col(valueCol).cast("double")
    val bounds = broadcast(df.agg(
      round(expr(s"percentile(CAST($valueCol AS DOUBLE), ${pLowPerMille / 1000.0})"), 6).as("lo"),
      round(expr(s"percentile(CAST($valueCol AS DOUBLE), ${pHighPerMille / 1000.0})"), 6).as("hi")))
    df.crossJoin(bounds)
      .withColumn("repaired", least(greatest(c, col("lo")), col("hi")))
      .withColumn("clipped", c < col("lo") || c > col("hi"))
  }

  /** Robust outlier flag: |x - median| > k * MAD (median absolute
    * deviation), the breakdown-resistant z-score. Two percentile
    * aggregations (the second over |x - med|), both broadcast back.
    * A zero MAD (over half the values identical) flags every deviating
    * row — the honest reading of that distribution.
    */
  def robustOutliers(df: DataFrame, valueCol: String, k: Int = 3): DataFrame = {
    require(k > 0)
    val c = col(valueCol).cast("double")
    val med = broadcast(df.agg(
      round(expr(s"percentile(CAST($valueCol AS DOUBLE), 0.5)"), 6).as("med")))
    val withMed = df.crossJoin(med)
    val mad = broadcast(withMed.agg(
      round(expr(s"percentile(abs(CAST($valueCol AS DOUBLE) - med), 0.5)"), 6).as("mad")))
    withMed.crossJoin(mad)
      .withColumn("abs_dev", round(abs(c - col("med")), 6))
      .withColumn("is_outlier", col("abs_dev") > lit(k.toDouble) * col("mad"))
  }
}
