package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the incremental-crawl bookkeeping step: given
  * two snapshots of a document collection, classify every id as
  * added / removed / changed / unchanged. Feeding ONLY the added+changed
  * slice into the expensive downstream operators (dedup, quality,
  * embedding) is what makes a recurring 100 TB pipeline affordable — the
  * diff itself must therefore be the cheap part.
  *
  * Scale shape: each side reduces to (id, 256-bit content hash) IN ITS
  * SCAN PROJECTION — document bodies never shuffle; the full-outer join
  * exchanges two narrow id+hash streams keyed on id. The content
  * comparison is sha-256, so hash equality IS text equality for any
  * practical purpose (2^-256 — unlike a 32-bit fingerprint, no
  * birthday-risk at corpus scale).
  */
object SnapshotDiff {

  def diff(oldDocs: DataFrame, newDocs: DataFrame,
           idCol: String, textCol: String): DataFrame = {
    val o = oldDocs.select(col(idCol),
      sha2(col(textCol).cast("binary"), 256).as("__old_h__"))
    val n = newDocs.select(col(idCol),
      sha2(col(textCol).cast("binary"), 256).as("__new_h__"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__old_h__").isNull, "added")
          .when(col("__new_h__").isNull, "removed")
          .when(col("__old_h__") === col("__new_h__"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
