package graft.rules

import graft.SparkSpec
import graft.config.{DeferredFilter, Reporting}

/** Sync-filter protocol semantics (ref: backends/base/rules.py:356-555):
  * multi-error-per-record reporting, warning filters that do not remove
  * rows, guard-column hygiene.
  */
class SyncFiltersSpec extends SparkSpec {

  private def run(filters: Seq[DeferredFilter]): (EntityCatalog, Seq[org.apache.spark.sql.DataFrame]) = {
    val c = EntityCatalog("planets" -> planets)
    val msgs = SyncFilters(c, filters)
    (c, msgs)
  }

  test("a record failing two filters reports both errors and is removed once") {
    val (c, msgs) = run(Seq(
      DeferredFilter("planets", "gravity < 2", Reporting("G_HIGH", "gravity too high")),
      DeferredFilter("planets", "n_moons < 90", Reporting("MOONS", "too many moons"))))
    // Jupiter fails BOTH; Saturn fails MOONS only
    val byCode = msgs.map(m => m.collect().map(_.getAs[String]("ErrorCode")).toSeq)
    assert(byCode.flatten.groupBy(identity).view.mapValues(_.size).toMap ==
      Map("G_HIGH" -> 1, "MOONS" -> 2))
    assert(c("planets").select("name").collect().map(_.getString(0)).toSet ==
      Set("Mercury", "Venus", "Earth", "Mars"))
  }

  test("warning filters notify but do not remove rows") {
    val (c, msgs) = run(Seq(
      DeferredFilter("planets", "mean_temp > -100",
        Reporting("COLD", "very cold", emit = "warning"))))
    assert(c("planets").count() == 6)
    val m = msgs.head
    assert(m.count() == 2) // Jupiter, Saturn
    assert(m.select("Status").distinct().collect().map(_.getString(0)).toSeq == Seq("informational"))
  }

  test("guard columns never leak into surviving entities or messages") {
    val (c, msgs) = run(Seq(
      DeferredFilter("planets", "gravity < 2",
        Reporting("G", "gravity {{gravity}} and {{__filter_0__}}"))))
    assert(!c("planets").columns.exists(_.startsWith("__filter_")))
    // excluded guard renders as the literal placeholder, not a value
    val text = msgs.head.select("ErrorMessage").collect().map(_.getString(0)).head
    assert(text == "gravity 2.36 and {{__filter_0__}}")
  }

  test("record-failure guards see columns added by earlier filters' modified entity") {
    // second filter's expression can reference entity columns as usual
    val (c, _) = run(Seq(
      DeferredFilter("planets", "gravity < 2", Reporting("A", "a")),
      DeferredFilter("planets", "mean_temp < 400", Reporting("B", "b"))))
    assert(c("planets").select("name").collect().map(_.getString(0)).toSet ==
      Set("Mercury", "Earth", "Mars", "Saturn"))
  }
}
