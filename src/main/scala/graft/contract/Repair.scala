package graft.contract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric REPAIR — the act-on-it sibling of [[Contract.profile]]'s
  * detect-only statistics: winsorization (clip to percentile bounds, the
  * standard treatment before aggregates that outliers would poison) and
  * robust outlier flagging by median/MAD z-score (which, unlike the
  * mean/stddev z-score, is not itself dragged by the outliers it hunts).
  *
  * Both follow the q_percentiles discipline: `exact = true` (the default,
  * what an external oracle can replicate) computes EXACT interpolated
  * percentiles — one aggregation that buffers the value column, the
  * verification-scale choice; `exact = false` swaps in
  * `approx_percentile`, the bounded-memory mergeable sketch with the same
  * call shape, for production-scale columns where a single-task value
  * buffer will not survive. Thresholds round to 6 decimals and broadcast
  * back; the repair itself is a per-row projection either way.
  */
object Repair {

  /** percentile(`col`, q) or approx_percentile(`col`, q) over a DOUBLE
    * cast, with the column name backtick-quoted (a space or hyphen in a
    * user column name must not break the SQL fragment).
    */
  private def quote(valueCol: String): String =
    "`" + valueCol.replace("`", "``") + "`"

  /** percentile(expr, q) or approx_percentile(expr, q) over an arbitrary
    * SQL fragment — the ONE place the exact/approx function name and the
    * 6-decimal rounding live, so the winsorize and MAD lanes cannot drift.
    */
  private def pctExpr(sqlExpr: String, q: Double, exact: Boolean): Column = {
    val fn = if (exact) "percentile" else "approx_percentile"
    round(expr(s"$fn($sqlExpr, $q)"), 6)
  }

  private def pct(valueCol: String, q: Double, exact: Boolean): Column =
    pctExpr(s"CAST(${quote(valueCol)} AS DOUBLE)", q, exact)

  /** The emitted columns are the operator's OUTPUT contract — fail fast if
    * the input already carries one rather than silently shadowing it.
    */
  private def requireFree(df: DataFrame, names: Seq[String]): Unit = {
    val clash = df.columns.filter(names.contains)
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} — rename them " +
        s"before repair (these names are the operator's output contract)")
  }

  /** Clip `valueCol` into [pLow, pHigh] percentile bounds; emits the
    * bounds, the repaired value, and whether the row was clipped.
    */
  def winsorize(df: DataFrame, valueCol: String,
                pLowPerMille: Int = 10, pHighPerMille: Int = 990,
                exact: Boolean = true): DataFrame = {
    require(pLowPerMille >= 0 && pHighPerMille <= 1000 && pLowPerMille < pHighPerMille)
    requireFree(df, Seq("lo", "hi", "repaired", "clipped"))
    val c = col(valueCol).cast("double")
    val bounds = broadcast(df.agg(
      pct(valueCol, pLowPerMille / 1000.0, exact).as("lo"),
      pct(valueCol, pHighPerMille / 1000.0, exact).as("hi")))
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
  def robustOutliers(df: DataFrame, valueCol: String, k: Int = 3,
                     exact: Boolean = true): DataFrame = {
    require(k > 0)
    requireFree(df, Seq("med", "mad", "abs_dev", "is_outlier"))
    val c = col(valueCol).cast("double")
    val med = broadcast(df.agg(pct(valueCol, 0.5, exact).as("med")))
    val withMed = df.crossJoin(med)
    val mad = broadcast(withMed.agg(
      pctExpr(s"abs(CAST(${quote(valueCol)} AS DOUBLE) - med)", 0.5, exact).as("mad")))
    withMed.crossJoin(mad)
      .withColumn("abs_dev", round(abs(c - col("med")), 6))
      .withColumn("is_outlier", col("abs_dev") > lit(k.toDouble) * col("mad"))
  }
}
