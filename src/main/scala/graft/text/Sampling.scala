package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, reshuffle-stable sampling and train/val/test splitting.
  *
  * At 100 TB a split must be (a) stable across re-runs, repartitionings,
  * and incremental appends — the same document always lands in the same
  * split; (b) derivable per row with no shuffle and no state; and (c)
  * auditable by an external engine. A seeded `rand()` is none of these
  * (it is partition-order-dependent), so assignment derives from the
  * replicable polynomial content hash ([[TextHashExpressions]] — the same
  * arithmetic the DuckDB oracle reproduces as a codepoint fold).
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the polynomial hash of the key's
    * string form, finalized by the MINSTD → xorshift → MINSTD integer mix
    * (the same overflow-safe, SQL-replicable rounds [[graft.similarity]]
    * uses for LSH planes). The raw polynomial hash of short digit strings
    * is too structured for small-modulus bucketing — sequential ids would
    * correlate bucket parity with id parity; the mix equidistributes.
    * Pure per-row codegen — a narrow stage at any scale.
    */
  def hashBucket(key: Column, buckets: Int): Column = {
    val h = TextHashExpressions.fingerprint(key.cast("string"))
    val m1 = pmod(h * 48271L, lit(2147483647L))
    val m2 = pmod(m1.bitwiseXOR(shiftright(m1, 15)) * 48271L, lit(2147483647L))
    pmod(m2, lit(buckets.toLong))
  }

  /** Deterministic pseudo-random sort key in [0, 2^31-1) for TRAINING-ORDER
    * shuffling: the same hash/mix pipeline as [[hashBucket]], salted with
    * `seed`, without the small-modulus reduction. A global shuffle at scale
    * is `repartitionByRange(n, shuffleKey)` + `sortWithinPartitions` — a
    * range shuffle, never a single-partition global sort — and the order is
    * stable across re-runs and engines (unlike `rand()` or `shuffle()`).
    * Changing `seed` yields an independent epoch order.
    */
  def shuffleKey(key: Column, seed: String = "shuffle"): Column = {
    val h = TextHashExpressions.fingerprint(
      concat(key.cast("string"), lit(":" + seed)))
    val m1 = pmod(h * 48271L, lit(2147483647L))
    pmod(m1.bitwiseXOR(shiftright(m1, 15)) * 48271L, lit(2147483647L))
  }

  /** Deterministic EXACT-size uniform sample: the `n` rows with the
    * smallest [[shuffleKey]] values (id tiebreak). Rate-based sampling
    * ([[stratifiedKeep]]) cannot hit a row budget exactly; this does, and
    * the plan is TakeOrderedAndProject — every partition keeps its own
    * n-row heap and the driver merges heaps, never a global sort.
    */
  def sampleExactly(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    n: Int, seed: String = "sample"): org.apache.spark.sql.DataFrame =
    docs.orderBy(shuffleKey(col(idCol), seed), col(idCol)).limit(n)

  /** Per-stratum QUOTA cap (the per-domain page cap of web-corpus
    * pipelines): keep at most `k` rows per stratum, chosen
    * deterministically by [[shuffleKey]] (id tiebreak), emitted as a keep
    * flag on every row. One window per stratum — a stratum's rows sort in
    * one task, the right default for domain-sized strata; for a power-law
    * hot stratum (one domain = half the corpus) thin it first with
    * [[stratifiedKeep]] at a rate that leaves ~k survivors, then cap
    * exactly.
    */
  def quotaCap(docs: org.apache.spark.sql.DataFrame, idCol: String,
               stratumCol: String, k: Int,
               seed: String = "quota"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(shuffleKey(col(idCol), seed), col(idCol))
    docs.withColumn("__qrank__", row_number().over(w))
      .withColumn("keep", col("__qrank__") <= k)
      .drop("__qrank__")
  }

  /** SOFT (sublinear) dedup sampling: instead of hard-collapsing each
    * exact-duplicate cluster to one copy, keep `ceil(cluster_size^alpha)`
    * deterministic representatives per distinct text (alpha = 0.5 gives
    * the sqrt down-weighting several LLM corpus recipes use for
    * naturally-repeated content — full dedup erases the popularity signal,
    * no dedup lets boilerplate dominate the gradient). Keepers are the
    * lowest [[shuffleKey]] members (id tiebreak), so the choice is
    * reproducible and append-stable for existing rows within a cluster.
    * Emitted as a `keep` flag plus the cluster size.
    *
    * Shuffle shape at 100 TB: ONE window over the text key (count + rank
    * in the same frame) — the cluster-heavy mass that motivates the
    * operator is exactly the mass that collapses well under the
    * text-hash partitioning. alpha = 0 is hard exact-dedup (keep 1);
    * alpha = 1 keeps everything.
    */
  def sublinearClusterSample(docs: org.apache.spark.sql.DataFrame, idCol: String,
                             textCol: String, alpha: Double = 0.5,
                             seed: String = "soft-dedup"): org.apache.spark.sql.DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0, 1], got $alpha")
    import org.apache.spark.sql.expressions.Window
    val byText = Window.partitionBy(col(textCol))
    val w = byText.orderBy(shuffleKey(col(idCol), seed), col(idCol))
    docs
      .withColumn("cluster_size", count(lit(1)).over(byText))
      .withColumn("__rank__", row_number().over(w))
      // pow rounded to 9 dp before ceil: Java Math.pow and libm pow may
      // differ in the last ulp, and an integer-valued n^alpha sitting one
      // ulp above its integer would ceil differently across engines — the
      // cosine-rounding discipline applied to the keep threshold
      .withColumn("keep",
        col("__rank__") <= ceil(round(pow(col("cluster_size").cast("double"), alpha), 9)))
      .drop("__rank__")
  }

  /** train/validation/test assignment by per-mille thresholds (defaults
    * 80/10/10). Assignment is a pure function of the key: appending new
    * data never reassigns existing rows.
    */
  def split(key: Column, trainPerMille: Int = 800, valPerMille: Int = 100): Column = {
    val b = hashBucket(key, 1000)
    when(b < trainPerMille, "train")
      .when(b < trainPerMille + valPerMille, "validation")
      .otherwise("test")
  }

  /** Sequence PACKING for training-data assembly: concatenating documents
    * into ~`budget`-token training sequences. Fully distributed and
    * deterministic: documents hash-bucket by id ([[hashBucket]] — appends
    * never move existing docs between buckets), then pack within each
    * bucket in id order by cumulative token count; a document belongs to
    * the sequence its first token starts in (`floor(cum_before / budget)`),
    * so a sequence can overrun the budget by less than one document —
    * the standard boundary rule when documents are not split.
    *
    * Scale shape: one window per bucket (each bucket is 1/nBuckets of the
    * corpus — the global-order formulation would be a single-partition
    * sort); output key (bucket, seq) identifies a training sequence.
    */
  def packSequences(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    tokenCount: Column, budget: Long,
                    nBuckets: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), tokenCount.cast("bigint").as("n_tokens"),
        hashBucket(col(idCol), nBuckets).as("bucket"))
      .withColumn("seq",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget).cast("bigint"))
  }

  /** Corpus MIXING to a token budget: given target mixture weights per
    * stratum (per-mille of `budgetTokens`), derive each stratum's keep rate
    * from its measured token mass and keep rows deterministically at that
    * rate. The training-data version of "40% web, 30% code, 20% books":
    * strata over-represented relative to their target are down-sampled;
    * strata at or under target keep everything (rate caps at 1000 — mixing
    * subsamples, it does not replicate).
    *
    * All rate arithmetic is integer/exactly-representable (targets and
    * rates derive from bigint sums), so an external engine reproduces the
    * exact keep set. The keep decision salts the hash key with ":mix" so
    * mixing is independent of [[split]]/[[stratifiedKeep]] decisions on the
    * same ids.
    *
    * Scale shape: one narrow aggregation to per-stratum token totals (rows
    * = #strata, broadcast back), then a pure per-row keep flag — no
    * shuffle of the corpus itself.
    */
  def mixToBudget(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  stratumCol: String, tokenCount: Column,
                  weightsPerMille: Map[String, Int],
                  budgetTokens: Long): org.apache.spark.sql.DataFrame = {
    val totals = docs.groupBy(col(stratumCol).as("__stratum__"))
      .agg(sum(tokenCount.cast("bigint")).as("__stratum_tokens__"))
    // target token mass per stratum: weight/1000 of the budget, floored
    val target = weightsPerMille.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, w)) =>
        when(col(stratumCol) === s, lit(budgetTokens * w / 1000L)).otherwise(acc)
    }
    // LEFT join + rate coalesce: an equi-join would silently DROP rows whose
    // stratum is null (null keys never match) — data loss, not sampling. A
    // null or unweighted stratum keeps rate 0 but still emits its rows.
    docs.join(broadcast(totals), col(stratumCol) <=> col("__stratum__"), "left")
      .drop("__stratum__")
      .withColumn("rate_permille",
        // floor((target*1000)/total): quotients of bigints this size are
        // exact under double division (the nearest non-integer rational is
        // 1/total away — far outside double epsilon), so floor matches
        // exact integer division on both engines
        coalesce(least(lit(1000L),
          floor(target * 1000L / col("__stratum_tokens__"))), lit(0L)).cast("bigint"))
      .withColumn("keep",
        hashBucket(concat(col(idCol).cast("string"), lit(":mix")), 1000)
          < col("rate_permille"))
      .drop("__stratum_tokens__")
  }

  /** Keep-flag for per-stratum sampling rates (per-mille), e.g. language
    * rebalancing: `Map("en" -> 500, "fr" -> 250)` keeps ~50% of English
    * and ~25% of French rows, `defaultPerMille` elsewhere. Deterministic
    * per key — re-runs keep exactly the same rows.
    */
  def stratifiedKeep(key: Column, stratum: Column,
                     ratesPerMille: Map[String, Int],
                     defaultPerMille: Int): Column = {
    val b = hashBucket(key, 1000)
    val rate = ratesPerMille.toSeq.sortBy(_._1).foldLeft(lit(defaultPerMille)) {
      case (acc, (s, r)) => when(stratum === s, lit(r)).otherwise(acc)
    }
    b < rate
  }

  /** PERCENTILE quality gate — the relative cut of FineWeb-class
    * pipelines ("drop the worst quartile by score"), which unlike a fixed
    * threshold survives score-distribution drift between crawls. Exact
    * interpolated percentile via one aggregation broadcast back as the
    * threshold; keep = score >= threshold (kept mass = 1 - quantile).
    *
    * Scale note (the q_percentiles discipline): the EXACT percentile
    * buffers the score column in one aggregation task — correct at
    * verification scale; the production-scale swap is
    * `approx_percentile` (`exact = false`), a bounded-memory mergeable
    * sketch with the same call shape (sketches differ per engine, so the
    * exact form is what an external oracle can replicate).
    */
  def percentileGate(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     score: Column, quantilePerMille: Int,
                     exact: Boolean = true): org.apache.spark.sql.DataFrame = {
    require(quantilePerMille >= 0 && quantilePerMille <= 1000)
    val q = quantilePerMille / 1000.0
    val fn = if (exact) "percentile" else "approx_percentile"
    val scored = docs.select(col(idCol), score.as("score"))
    val threshold = broadcast(scored.agg(
      round(expr(s"$fn(score, $q)"), 6).as("threshold")))
    scored.crossJoin(threshold)
      .select(col(idCol), col("score"), col("threshold"),
        (col("score") >= col("threshold")).as("keep"))
  }

  /** TEMPERATURE-flattened mixture sampling at T = 2 (the multilingual-
    * rebalancing move of large-corpus recipes: sample stratum s with
    * probability ∝ p_s^(1/T), up-weighting small strata relative to their
    * natural share without hand-written weights — [[mixToBudget]] is the
    * explicit-weights variant).
    *
    * T is FIXED at 2 because p^(1/2) is `sqrt`, the one power IEEE 754
    * specifies as correctly rounded — `pow(x, 0.5)` differs in the last
    * ulp between libms and would break cross-engine keep-set parity.
    * Exactness ledger: sq_s = floor(1e6 * sqrt(stratum_tokens)) is an
    * integer (sqrt exact-rounded, the floor absorbs nothing else);
    * targets and rates are then pure BIGINT arithmetic — target_s =
    * (budget * sq_s) div Σsq, rate_permille = min(1000, (target_s*1000)
    * div stratum_tokens) — so an external engine reproduces the exact
    * keep set. (sqrt(tokens_s) stands in for sqrt(p_s): the 1/sqrt(total)
    * factor is common to every stratum and cancels in the normalization.)
    *
    * Scale shape: identical to [[mixToBudget]] — one #strata-row
    * aggregation + one 1-row normalizer, both broadcast back; the keep
    * decision is a pure per-row flag, the corpus itself never shuffles.
    */
  def temperatureMix(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     stratumCol: String, tokenCount: Column,
                     budgetTokens: Long): org.apache.spark.sql.DataFrame = {
    val totals = docs.groupBy(col(stratumCol).as("__stratum__"))
      .agg(sum(tokenCount.cast("bigint")).as("__t__"))
      .withColumn("__sq__", floor(lit(1000000.0) * sqrt(col("__t__"))).cast("bigint"))
    val norm = broadcast(totals.agg(sum(col("__sq__")).as("__sqsum__")))
    val rates = totals.crossJoin(norm)
      .withColumn("__target__", expr(s"(${budgetTokens}L * __sq__) div __sqsum__"))
      .select(col("__stratum__"),
        least(lit(1000L), expr("(__target__ * 1000L) div __t__"))
          .cast("bigint").as("rate_permille"))
    // Null-safe LEFT join: with no explicit weight table every stratum —
    // including the null "unknown" stratum — is its own group with a sqrt
    // share (unlike mixToBudget, where absence from the weights map means
    // rate 0). Rows are never dropped; the coalesce is belt-and-braces.
    docs.join(broadcast(rates), col(stratumCol) <=> col("__stratum__"), "left")
      .drop("__stratum__")
      .withColumn("rate_permille", coalesce(col("rate_permille"), lit(0L)))
      .withColumn("keep",
        hashBucket(concat(col(idCol).cast("string"), lit(":tmix")), 1000)
          < col("rate_permille"))
  }
}
