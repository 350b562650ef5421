package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Sparse (lexical) retrieval over the document corpus — the keyword-side
  * complement of the dense-ANN family in [[graft.similarity.Similarity]].
  * A training-data pipeline uses this for benchmark decontamination by
  * query, targeted corpus pulls ("every page about X"), and seed-set
  * expansion where an embedding index is not available.
  *
  * Scale shape: the query-term filter lands BEFORE the first shuffle (the
  * explode feeds a broadcast IN-list filter), so only postings for the
  * handful of query terms ever leave the scan stage — at 100 TB the
  * shuffled volume is O(docs containing a query term), not O(corpus
  * tokens). Scoring joins are against broadcast one-row stats and a
  * broadcast |Q|-row df table; the final top-k is TakeOrderedAndProject
  * (per-partition heaps + driver merge), never a global sort.
  */
object Retrieval {

  /** BM25 top-k document retrieval for a fixed bag of query terms, in
    * engine-exact integer micro-units (k1 = 1.2, b = 0.75 — the classic
    * Robertson defaults, held as exact rationals 6/5 and 3/4).
    *
    * Every engine-crossing step is integer arithmetic or an IEEE-exact
    * double op, the [[TextStats.zipfFit]] discipline:
    *   - idf_milli  = floor(1000 * ln(1 + (2N-2df+1)/(2df+1)))  — the
    *     BM25+ style strictly-positive idf; the ratio of exact integers is
    *     one correctly-rounded division, ln agrees across libms to 1 ulp.
    *   - dlr        = (dl * 1e6 * N) div total        — dl/avgdl in micro.
    *   - den        = 2e7*tf + 6e6 + 18*dlr           — 2e7 * (tf + k1*(1-b) + k1*b*dl/avgdl).
    *   - comp_milli = (1000 * 44e6 * tf) div den      — tf*(k1+1)/den in milli, <= 2200.
    *   - score      = sum(idf_milli * comp_milli)     — exact BIGINT, order-free.
    *
    * One pass over the corpus carries per-doc length through the explode
    * (no second scan / doc-length join); corpus N and total token count
    * ride a broadcast one-row aggregate computed in-plan.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty && k > 0)
    val toks = TextStats.tokens(col(textCol))
    val postings = docs
      .select(col(idCol), size(toks).cast("long").as("__dl__"),
        explode(toks).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("__dl__")).as("dl"))
    val df = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = broadcast(docs.agg(
      count(lit(1)).as("__n__"),
      sum(size(TextStats.tokens(col(textCol))).cast("long")).as("__total__")))
    val idfMilli = floor(lit(1000.0) * log(lit(1.0) +
      (lit(2.0) * col("__n__") - lit(2.0) * col("df") + lit(1.0)) /
        (lit(2.0) * col("df") + lit(1.0)))).cast("long")
    val compMilli = expr(
      "(1000L * 44000000L * tf) div (20000000L * tf + 6000000L + " +
        "18L * ((dl * 1000000L * __n__) div __total__))")
    postings
      .join(broadcast(df), "term")
      .crossJoin(stats)
      .select(col(idCol), (idfMilli * compMilli).as("__ts__"))
      .groupBy(col(idCol))
      .agg(sum(col("__ts__")).cast("long").as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
  }

  /** Exact heavy hitters (tokens with corpus count >= `threshold`) via the
    * two-level counting pattern: pass 1 aggregates counts of HASH BUCKETS
    * of tokens (bounded cardinality — `buckets` rows regardless of
    * vocabulary size), keeps the buckets whose total reaches the
    * threshold (a superset guarantee: a token with cnt >= T forces its
    * bucket >= T), and pass 2 counts exact tokens only inside surviving
    * buckets. The output is EXACT; the sketch only prunes.
    *
    * Why it matters at 100 TB: a web-scale vocabulary has billions of
    * distinct tokens, nearly all in the long tail below any interesting
    * threshold. Naive groupBy(token) shuffles every distinct token;
    * this shape shuffles a fixed `buckets`-cardinality aggregate (pass 1
    * is map-side-combined into at most `buckets` rows per task) plus only
    * the surviving buckets' tokens in pass 2. The surviving-bucket set is
    * collected as an IN-list (bounded by `buckets`, a few thousand — a
    * driver-safe broadcast by construction).
    */
  def heavyHitters(docs: DataFrame, textCol: String,
                   threshold: Long, buckets: Int = 4096): DataFrame = {
    require(threshold > 0 && buckets > 0)
    val tok = docs.select(explode(TextStats.tokens(col(textCol))).as("token"))
      .withColumn("__b__", Sampling.hashBucket(col("token"), buckets))
    val hot = tok.groupBy(col("__b__")).agg(count(lit(1)).as("__bc__"))
      .where(col("__bc__") >= threshold)
      .select(col("__b__"))
    // bounded by `buckets` rows — broadcast semi-join keeps pass 2 narrow
    tok.join(broadcast(hot), Seq("__b__"), "left_semi")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= threshold)
  }
}
