package org.apache.spark

/** Driver-coordinated shuffle-file release for bounded-footprint multi-pass
  * operators (see [[graft.text.Dedup]]'s chunked candidate verify) and for
  * post-failure cleanup in `graft.Bench`.
  *
  * Spark frees a shuffle's map outputs only when the driver GC collects the
  * `ShuffleDependency` (ContextCleaner's weak-reference queue) or the JVM
  * exits. A K-pass operator that must keep total shuffle disk under a budget
  * cannot wait for GC: pass k's files must be gone before pass k+1 writes
  * its own. This shim lives in `org.apache.spark` to reach the two
  * `private[spark]` members involved — `SparkContext.cleaner` and
  * `MapOutputTrackerMaster.shuffleStatuses` — and drives the SAME cleanup
  * path GC would (`ContextCleaner.doCleanupShuffle`: unregister map
  * outputs, remove the shuffle from the block manager + disk), just
  * eagerly and for an explicit id set.
  *
  * Safety: cleaning a shuffle whose stages are complete is exactly what GC
  * does; if a later job re-reads a cleaned shuffle (e.g. a cached frame
  * whose blocks were evicted), Spark recomputes the missing stages from
  * lineage — a performance cost, never a correctness one. Callers bound
  * that cost by cleaning only ids created within a finished pass
  * ([[snapshot]]/[[cleanNewSince]]) or by cleaning between independent
  * queries (Bench's failure isolation).
  */
object GraftShuffleGc {

  /** Shuffle ids currently registered with the driver (live map outputs). */
  def snapshot(sc: SparkContext): Set[Int] =
    sc.env.mapOutputTracker match {
      case m: MapOutputTrackerMaster => m.shuffleStatuses.keySet.map(_.intValue).toSet
      case _                         => Set.empty
    }

  /** Eagerly release every registered shuffle NOT in `keep`. Returns the
    * ids cleaned. Blocking: when this returns, the files are scheduled for
    * removal on the (local-mode: in-process) block managers.
    */
  def cleanNewSince(sc: SparkContext, keep: Set[Int]): Seq[Int] = {
    val doomed = (snapshot(sc) -- keep).toSeq.sorted
    sc.cleaner match {
      case Some(cleaner) =>
        doomed.foreach(id => cleaner.doCleanupShuffle(id, blocking = true))
        doomed
      case None => Seq.empty
    }
  }

  /** Release ALL registered shuffles — post-failure isolation between
    * independent queries (an ENOSPC'd query's pending shuffle files
    * otherwise sit on disk until driver GC happens to run, failing its
    * successors in the same JVM).
    */
  def cleanAll(sc: SparkContext): Seq[Int] = cleanNewSince(sc, Set.empty)
}
