package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-edit-distance near-duplicate pairs — the "small fixups of the
  * same page" family (tracking-code query strings, version stamps, typo
  * re-crawls) that token-set measures like Jaccard score as near-identical
  * only when whole tokens change, and SimHash only when many do.
  *
  * Candidate generation joins on an UNTOUCHED EDGE: two strings within
  * edit distance d share their first `keyLen` characters whenever no edit
  * falls in the first keyLen positions, and likewise their last keyLen.
  * Pairs are generated from the prefix-key and suffix-key equi-joins
  * (deduplicated), length-filtered to |len(a)-len(b)| <= d, and verified
  * with the banded O(d*n) thresholded Levenshtein. The miss case — edits
  * in BOTH the first and last keyLen characters — is the documented recall
  * contract (EditDistanceSpec measures it); pipelines that need those too
  * lower keyLen, at quadratic cost inside larger key groups.
  *
  * 100 TB shape: two equi-joins on short fixed-width keys, candidate rows
  * carry (id, text) only, and verification is per-pair codegen. Key-group
  * skew (a boilerplate 32-char prefix shared by millions of pages) is the
  * same hot-bucket contract as the LSH family: cap or pre-collapse exact
  * duplicates first ([[Dedup.exactDedup]]) so clone clusters cost one node.
  */
object EditDistance {

  /** Pairs (a, b, edit_distance) with a < b and edit_distance <= maxDist,
    * among candidates sharing a `keyLen`-char prefix or suffix.
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
                        maxDist: Int, keyLen: Int = 32): DataFrame = {
    require(maxDist >= 0 && keyLen > 0, s"bad maxDist=$maxDist keyLen=$keyLen")
    val d = docs.select(col(idCol).as("__id__"), col(textCol).as("__text__"),
      length(col(textCol)).as("__len__"),
      substring(col(textCol), 1, keyLen).as("__pk__"),
      substring(col(textCol), -keyLen, keyLen).as("__sk__"))
    def half(key: String): DataFrame = {
      val a = d.select(col("__id__").as("a"), col("__text__").as("__ta__"),
        col("__len__").as("__la__"), col(key).as("__k__"))
      val b = d.select(col("__id__").as("b"), col("__text__").as("__tb__"),
        col("__len__").as("__lb__"), col(key).as("__k__"))
      a.join(b, Seq("__k__"))
        .where(col("a") < col("b") &&
          abs(col("__la__") - col("__lb__")) <= maxDist)
        .select(col("a"), col("b"), col("__ta__"), col("__tb__"))
    }
    half("__pk__").unionByName(half("__sk__"))
      .dropDuplicates("a", "b")
      .withColumn("edit_distance",
        levenshtein(col("__ta__"), col("__tb__"), maxDist + 1))
      .where(col("edit_distance") >= 0 && col("edit_distance") <= maxDist)
      .select(col("a"), col("b"), col("edit_distance").cast("bigint"))
  }
}
