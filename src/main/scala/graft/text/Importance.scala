package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-selection importance weighting (DSIR, Xie et al. 2023): score each
  * document by how much more likely its hashed-bigram features are under a
  * TARGET distribution (a trusted / in-domain subset) than under the RAW
  * corpus distribution. Selecting or resampling by this weight tilts a raw
  * crawl toward the target domain — the hashed-n-gram stand-in for a
  * trained quality classifier.
  *
  * All arithmetic is engine-exact: feature probabilities are integer
  * counts with +1 smoothing, each feature's log-likelihood-ratio is
  * floored into integer micro-nats once per FEATURE (bucket count is
  * small, so the `ln` boundary surface is tiny and data-independent), and
  * per-document scores are integer sums of those micro-nat values.
  */
object Importance {

  /** Per-document DSIR log-importance weight in micro-nats.
    *
    * `isTarget` marks the target-distribution rows (evaluated against each
    * input row, e.g. `col("source") === "src0"`). Features are token
    * bigrams hashed into `buckets` buckets ([[Sampling.hashBucket]] — the
    * shared MINSTD-finalized polyhash both engines replicate). With
    * smoothing mass B = `buckets`:
    *
    *   llr(f)  = floor(1e6 * ln( ((t_f+1) * (R+B)) / ((r_f+1) * (T+B)) ))
    *   dsir(d) = sum over bigram OCCURRENCES in d of llr(bucket(bigram))
    *
    * Output: (idCol, n_bigrams, dsir_micro); docs with < 2 tokens score 0.
    *
    * Shuffle shape at 100 TB: one per-doc window to form transitions (docs
    * independent), one partial-aggregated count keyed on the bucket (at
    * most `buckets` groups survive the map side — the shuffle is tiny
    * regardless of corpus size), corpus totals as a window over the
    * bucket-count frame (single exchange of <= `buckets` rows), and the
    * per-occurrence llr lookup is a BROADCAST join (feature table is <=
    * `buckets` rows by construction). One final per-doc aggregation. No
    * driver materialization anywhere.
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 4096): DataFrame = {
    val norm = regexp_replace(trim(col(textCol)), "\\s+", " ")
    val toks = docs.select(col(idCol).as("__id__"), isTarget.as("__tgt__"),
      posexplode(split(norm, " ")).as(Seq("pos", "w1")))
    val w = Window.partitionBy(col("__id__")).orderBy(col("pos"))
    // transition + guard in ONE projection (the SpanDedup window lesson)
    val grams = toks
      .select(col("__id__"), col("__tgt__"),
        concat_ws(" ", col("w1"), lead(col("w1"), 1).over(w)).as("__bg__"),
        lead(col("w1"), 1).over(w).as("__w2__"))
      .where(col("__w2__").isNotNull)
      .select(col("__id__"), col("__tgt__"),
        Sampling.hashBucket(col("__bg__"), buckets).as("__f__"))
    val feats = grams.groupBy(col("__f__")).agg(
      count(lit(1)).as("__r__"),
      sum(when(col("__tgt__"), 1L).otherwise(0L)).as("__t__"))
    // corpus totals in-plan: every bigram lands in a bucket, so the sums
    // over this <= `buckets`-row frame ARE the corpus totals. Total column
    // names must differ from the per-feature ones by MORE than case —
    // withColumn under default case-insensitive resolution would replace
    // them.
    val tot = Window.partitionBy()
    val llr = feats
      .withColumn("__rtot__", sum(col("__r__")).over(tot))
      .withColumn("__ttot__", sum(col("__t__")).over(tot))
      .select(col("__f__"),
        floor(lit(1000000.0) * log(
          ((col("__t__") + 1) * (col("__rtot__") + buckets)).cast("double") /
            ((col("__r__") + 1) * (col("__ttot__") + buckets)).cast("double")))
          .cast("bigint").as("__llr__"))
    val perDoc = grams.join(broadcast(llr), Seq("__f__"))
      .groupBy(col("__id__")).agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("__llr__")).as("dsir_micro"))
    docs.select(col(idCol).as("__id__"))
      .join(perDoc, Seq("__id__"), "left")
      .select(col("__id__").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).cast("bigint").as("n_bigrams"),
        coalesce(col("dsir_micro"), lit(0L)).cast("bigint").as("dsir_micro"))
  }

  /** Distribution-shift (PSI — population stability index) between two
    * corpus slices over hashed-unigram buckets: the drift metric a
    * curation team tracks across crawl refreshes (PSI < 0.1 stable,
    * > 0.25 action). With +1/+B smoothing (B = `buckets`, the
    * [[dsirWeights]] discipline):
    *
    *   p_side(f) = (c_side(f) + 1) / (n_side + B)
    *   psi       = sum_f (p_a - p_b) * ln(p_a / p_b)
    *
    * Per-bucket contributions are floored into integer micro-units before
    * the sum, so the total is order-independent; like dsir, the `ln`
    * boundary surface is one value per BUCKET (small, data-independent),
    * never per row. Output: one row (psi_micro, n_buckets_used).
    *
    * Shuffle shape at 100 TB: one partial-aggregated count keyed on the
    * bucket (<= `buckets` groups survive the map side), totals as a
    * window over that tiny frame — corpus size never drives the shuffle.
    */
  def distributionShift(docs: DataFrame, textCol: String, isLeft: Column,
                        buckets: Int = 4096): DataFrame = {
    val toks = docs
      .select(isLeft.as("__l__"),
        explode(split(regexp_replace(trim(col(textCol)), "\\s+", " "), " ")).as("w"))
      .where(col("w") =!= "")
    val counts = toks
      .groupBy(Sampling.hashBucket(col("w"), buckets).as("__f__"))
      .agg(sum(when(col("__l__"), 1L).otherwise(0L)).as("__ca__"),
        sum(when(col("__l__"), 0L).otherwise(1L)).as("__cb__"))
    val tot = Window.partitionBy()
    val pa = (col("__ca__") + 1).cast("double") / (col("__na__") + buckets).cast("double")
    val pb = (col("__cb__") + 1).cast("double") / (col("__nb__") + buckets).cast("double")
    counts
      .withColumn("__na__", sum(col("__ca__")).over(tot))
      .withColumn("__nb__", sum(col("__cb__")).over(tot))
      .select(floor(lit(1000000.0) * ((pa - pb) * log(pa / pb)))
        .cast("bigint").as("__c__"))
      .agg(sum(col("__c__")).as("psi_micro"),
        count(lit(1)).as("n_buckets_used"))
  }

  /** Hashed-linear quality-classifier SCORING (the serving side of a
    * fastText/DCLM-style quality filter): features are token unigrams AND
    * bigrams hashed into `buckets` ids ([[Sampling.hashBucket]]); a
    * trained weight table `(bucket, weight_micro)` — the artifact a
    * logistic-regression / fastText training run exports — is broadcast;
    * a document's score is the MEAN feature weight in integer micro-units
    * (floored), the linear logit without the monotone sigmoid (thresholds
    * compare identically, and staying in integers keeps the oracle
    * bit-exact). `keep` flags `logit_micro >= thresholdMicro`.
    *
    * Shuffle shape at 100 TB: one per-doc window for bigrams, the feature
    * lane carries (doc, bucket) ids only, the weight table is a broadcast
    * <= `buckets` rows, and the score is one per-doc partial-aggregated
    * sum. Missing buckets weigh 0 (an untrained feature is neutral). Docs
    * with no tokens score 0 and keep only if the threshold is <= 0.
    */
  def linearQualityScore(docs: DataFrame, idCol: String, textCol: String,
                         weights: DataFrame, buckets: Int,
                         thresholdMicro: Long): DataFrame = {
    val norm = regexp_replace(trim(col(textCol)), "\\s+", " ")
    val toks = docs.select(col(idCol).as("__id__"),
      posexplode(split(norm, " ")).as(Seq("pos", "w1")))
    val w = Window.partitionBy(col("__id__")).orderBy(col("pos"))
    val uni = toks.where(col("w1") =!= "")
      .select(col("__id__"), Sampling.hashBucket(col("w1"), buckets).as("__f__"))
    val bi = toks
      .select(col("__id__"),
        concat_ws(" ", col("w1"), lead(col("w1"), 1).over(w)).as("__bg__"),
        lead(col("w1"), 1).over(w).as("__w2__"))
      .where(col("__w2__").isNotNull)
      .select(col("__id__"), Sampling.hashBucket(col("__bg__"), buckets).as("__f__"))
    val wt = broadcast(weights.select(col("bucket").cast("bigint").as("__f__"),
      col("weight_micro").cast("bigint").as("__wm__")))
    val perDoc = uni.unionByName(bi)
      .join(wt, Seq("__f__"), "left")
      .groupBy(col("__id__")).agg(
        count(lit(1)).as("n_features"),
        coalesce(sum(col("__wm__")), lit(0L)).as("__sum__"))
      .select(col("__id__"), col("n_features"),
        floor(col("__sum__").cast("double") / col("n_features").cast("double"))
          .cast("bigint").as("logit_micro"))
    docs.select(col(idCol).as("__id__"))
      .join(perDoc, Seq("__id__"), "left")
      .select(col("__id__").as(idCol),
        coalesce(col("n_features"), lit(0L)).cast("bigint").as("n_features"),
        coalesce(col("logit_micro"), lit(0L)).cast("bigint").as("logit_micro"),
        (coalesce(col("logit_micro"), lit(0L)) >= thresholdMicro).as("keep"))
  }

  /** IMPORTANCE RESAMPLING — the second half of DSIR (the paper draws the
    * final training set with probability ∝ exp(importance weight); the
    * weights alone, [[dsirWeights]], are only the scoring half). Exact
    * n-sample ∝ exp(w) WITHOUT replacement via the Gumbel-max trick: key
    * = w + Gumbel(0,1), take the top n — mathematically identical to
    * sequential softmax draws.
    *
    * The Gumbel is deterministic and engine-replicable: u derives from
    * the ':gumbel'-salted polyhash as the exact rational (b + 0.5)/10^6
    * (never 0 or 1, so -ln(-ln(u)) is finite), and the key is floored to
    * integer micro-nats — the [[TextStats.zipfFit]] ln discipline. So the
    * sampled SET is stable under re-runs and repartitions, and an
    * external engine reproduces it.
    *
    * Scale shape: a per-row key projection and a TakeOrdered top-n —
    * per-partition heaps, never a global sort.
    */
  def importanceResample(weights: DataFrame, idCol: String,
                         weightMicroCol: String, n: Int): DataFrame = {
    require(n > 0)
    val u = (Sampling.hashBucket(
      concat(col(idCol).cast("string"), lit(":gumbel")), 1000000)
      .cast("double") + lit(0.5)) / lit(1000000.0)
    val gumbelMicro = floor(lit(1000000.0) * -log(-log(u))).cast("long")
    weights
      .withColumn("key_micro", (col(weightMicroCol) + gumbelMicro).cast("long"))
      .orderBy(col("key_micro").desc, col(idCol))
      .limit(n)
      .select(col(idCol), col(weightMicroCol), col("key_micro"))
  }
}
