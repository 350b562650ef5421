package graft.rules

import graft.SparkSpec
import graft.config.{MultiExpr, Reporting, Step}
import graft.config.Step._
import org.apache.spark.sql.DataFrame

/** Per-step semantics, mirroring the reference's Spark rule-test matrix
  * (ref: tests/test_core_engine/test_backends/test_implementations/
  * test_spark/test_rules.py).
  */
class StepInterpreterSpec extends SparkSpec {

  private def cat(pairs: (String, DataFrame)*): EntityCatalog = EntityCatalog(pairs: _*)

  test("add appends a computed column") {
    val c = cat("planets" -> planets)
    StepInterpreter.evaluate(c, Add("planets", "double_gravity", "gravity * 2"))
    assert(c("planets").columns.toSeq ==
      Seq("name", "gravity", "mean_temp", "n_moons", "double_gravity"))
    assert(c("planets").where("name = 'Earth' AND double_gravity = 2.0").count() == 1)
  }

  test("add with new_entity_name leaves the source untouched") {
    val c = cat("planets" -> planets)
    StepInterpreter.evaluate(c, Add("planets", "g2", "gravity * 2", newEntityName = Some("p2")))
    assert(!c("planets").columns.contains("g2"))
    assert(c("p2").columns.contains("g2"))
  }

  test("remove drops a column") {
    val c = cat("planets" -> planets)
    StepInterpreter.evaluate(c, Remove("planets", "mean_temp"))
    assert(c("planets").columns.toSeq == Seq("name", "gravity", "n_moons"))
  }

  test("select projects expressions with aliases") {
    val c = cat("planets" -> planets)
    StepInterpreter.evaluate(c, Select("planets",
      MultiExpr.Aliased(Seq("upper(name)" -> "NAME", "gravity > 1" -> "heavy"))))
    assert(c("planets").columns.toSeq == Seq("NAME", "heavy"))
    assert(c("planets").where("NAME = 'JUPITER' AND heavy").count() == 1)
  }

  test("select multialias fans a generator into several columns") {
    // ref: test_rules.py:174-186 — {"posexplode(intlist)": ["Index", "Value"]}
    import spark.implicits._
    val c = cat("intlist" -> Seq(Tuple1(Seq(1, 2, 3))).toDF("intlist"))
    StepInterpreter.evaluate(c, Select("intlist",
      MultiExpr.MultiAliased(Seq("posexplode(intlist)" -> Seq("Index", "Value")))))
    assert(c("intlist").columns.toSet == Set("Index", "Value"))
    assert(c("intlist").count() == 3)
  }

  test("join new_columns star takes every target column, conflicts last-wins") {
    // ref: test_rules.py:408-450 — new_columns "*" / "satellites.*"
    import org.apache.spark.sql.functions.{col, lit}
    val sats = satellites.select(col("sat_name").as("satellite_name"),
      col("planet").as("satellite_planet"))
    for (spec <- Seq("*", "sats.*")) {
      val c = cat(
        "planets" -> planets.withColumn("satellite_planet", lit("a satellite")),
        "sats" -> sats)
      StepInterpreter.evaluate(c, LeftJoin("planets", "sats",
        "planets.name = sats.satellite_planet", MultiExpr.Raw(spec)))
      val out = c("planets")
      assert(out.columns.contains("satellite_name"))
      // the target's satellite_planet overwrites the source's literal
      assert(out.where("name = 'Earth' AND satellite_planet = 'Earth'").count() == 1)
      assert(out.where("name = 'Venus' AND satellite_planet IS NULL").count() == 1)
    }
  }

  test("select distinct deduplicates") {
    val c = cat("sats" -> satellites)
    StepInterpreter.evaluate(c, Select("sats", MultiExpr.Raw("planet"), distinct = true))
    assert(c("sats").count() == 4)
  }

  test("select raw string splits on top-level commas only") {
    val c = cat("planets" -> planets)
    StepInterpreter.evaluate(c, Select("planets",
      MultiExpr.Raw("name, round(gravity, 1) AS g, concat(name, ',', n_moons) AS nm")))
    assert(c("planets").columns.toSeq == Seq("name", "g", "nm"))
  }

  test("group_by aggregates") {
    val c = cat("sats" -> satellites)
    StepInterpreter.evaluate(c, GroupBy("sats",
      MultiExpr.Raw("planet"), MultiExpr.Aliased(Seq("count(1)" -> "n"))))
    assert(rows(c("sats")) == Set(Seq("Earth", 1L), Seq("Mars", 2L), Seq("Jupiter", 2L), Seq("Saturn", 1L)))
  }

  test("group_by with pivot and explicit values") {
    val c = cat("sats" -> satellites)
    StepInterpreter.evaluate(c, GroupBy("sats",
      MultiExpr.Exprs(Nil), MultiExpr("count(1)"),
      pivotColumn = Some("planet"), pivotValues = Some(Seq("Mars", "Earth", "Pluto"))))
    val r = c("sats").collect()(0)
    assert(c("sats").columns.toSeq == Seq("Mars", "Earth", "Pluto"))
    assert(r.getLong(0) == 2 && r.getLong(1) == 1 && r.isNullAt(2))
  }

  test("filter keeps truthy rows without messages") {
    val c = cat("planets" -> planets)
    val msgs = StepInterpreter.evaluate(c, Filter("planets", "gravity > 0.9"))
    assert(msgs.isEmpty)
    assert(c("planets").count() == 4) // Venus, Earth, Jupiter, Saturn
  }

  test("notify emits a message per matching row with templated text") {
    val c = cat("planets" -> planets)
    val msgs = StepInterpreter.evaluate(c,
      Notify("planets", "n_moons > 90", Reporting("MANY_MOONS", "{{name}} has {{n_moons}} moons"))).get
    val texts = msgs.select("ErrorMessage").collect().map(_.getString(0)).toSet
    assert(texts == Set("Jupiter has 95 moons", "Saturn has 146 moons"))
    assert(msgs.select("ErrorCode").distinct().collect().map(_.getString(0)).toSeq == Seq("MANY_MOONS"))
  }

  test("left_join keeps all source rows and appends new columns") {
    val c = cat("sats" -> satellites, "planets" -> planets)
    StepInterpreter.evaluate(c, LeftJoin("sats", "planets",
      "sats.planet = planets.name",
      MultiExpr.Aliased(Seq("planets.gravity" -> "gravity"))))
    assert(c("sats").count() == 6)
    assert(c("sats").where("sat_name = 'Moon' AND gravity = 1.0").count() == 1)
  }

  test("left_join without match null-pads new columns") {
    val c = cat("planets" -> planets, "sats" -> satellites)
    StepInterpreter.evaluate(c, LeftJoin("planets", "sats",
      "planets.name = sats.planet",
      MultiExpr.Aliased(Seq("sats.sat_name" -> "a_sat"))))
    assert(c("planets").where("name = 'Venus' AND a_sat IS NULL").count() == 1)
    assert(c("planets").count() == 8) // Mars & Jupiter joined twice
  }

  test("join conflict resolution is case-insensitive last-wins keeping last casing") {
    val c = cat("sats" -> satellites, "planets" -> planets)
    StepInterpreter.evaluate(c, LeftJoin("sats", "planets",
      "sats.planet = planets.name",
      MultiExpr.Aliased(Seq("upper(planets.name)" -> "PLANET"))))
    // source column `planet` replaced by new column `PLANET` (last casing)
    assert(c("sats").columns.toSeq == Seq("sat_name", "PLANET"))
    assert(c("sats").where("sat_name = 'Titan' AND PLANET = 'SATURN'").count() == 1)
  }

  test("inner_join drops non-matching source rows") {
    val c = cat("planets" -> planets, "sats" -> satellites)
    StepInterpreter.evaluate(c, InnerJoin("planets", "sats", "planets.name = sats.planet"))
    assert(c("planets").count() == 6)
  }

  test("one_to_one_join passes when target keys are unique") {
    val c = cat("sats" -> satellites, "planets" -> planets)
    StepInterpreter.evaluate(c, OneToOneJoin("sats", "planets",
      "sats.planet = planets.name", MultiExpr.Aliased(Seq("planets.n_moons" -> "n_moons"))))
    assert(c("sats").count() == 6)
  }

  test("one_to_one_join throws on duplicate matched target keys (equi fast path)") {
    val c = cat("planets" -> planets, "sats" -> satellites)
    val e = intercept[ConstraintException] {
      StepInterpreter.evaluate(c, OneToOneJoin("planets", "sats", "planets.name = sats.planet"))
    }
    assert(e.getMessage.contains("Multiple matches"))
  }

  test("one_to_one_join ignores duplicate target keys that no source row matches") {
    import spark.implicits._
    val src = Seq(("Venus", 1)).toDF("name", "x") // Venus has no satellites
    val c = cat("src" -> src, "sats" -> satellites)
    StepInterpreter.evaluate(c, OneToOneJoin("src", "sats", "src.name = sats.planet"))
    assert(c("src").count() == 1)
  }

  test("one_to_one_join integrity honors target-side residual predicates") {
    val c = cat("planets" -> planets, "sats" -> satellites)
    // Only Phobos survives the predicate -> Mars matches once -> no throw
    StepInterpreter.evaluate(c, OneToOneJoin("planets", "sats",
      "planets.name = sats.planet AND sats.sat_name = 'Phobos'"))
    assert(c("planets").count() == 6)
  }

  test("one_to_one_join theta condition falls back to generic check and throws") {
    val c = cat("planets" -> planets, "sats" -> satellites)
    val e = intercept[ConstraintException] {
      StepInterpreter.evaluate(c, OneToOneJoin("planets", "sats",
        "planets.name = sats.planet OR planets.name = 'X'"))
    }
    assert(e.getMessage.contains("Multiple matches"))
  }

  test("semi_join keeps matching source rows with no target columns") {
    val c = cat("planets" -> planets, "sats" -> satellites)
    StepInterpreter.evaluate(c, SemiJoin("planets", "sats", "planets.name = sats.planet"))
    assert(c("planets").columns.toSeq == planets.columns.toSeq)
    assert(rows(c("planets").select("name")) == Set(Seq("Earth"), Seq("Mars"), Seq("Jupiter"), Seq("Saturn")))
  }

  test("anti_join keeps non-matching source rows") {
    val c = cat("planets" -> planets, "sats" -> satellites)
    StepInterpreter.evaluate(c, AntiJoin("planets", "sats", "planets.name = sats.planet"))
    assert(rows(c("planets").select("name")) == Set(Seq("Mercury"), Seq("Venus")))
  }

  test("has_match adds a boolean flag, keeping all source rows") {
    val c = cat("planets" -> planets, "sats" -> satellites)
    StepInterpreter.evaluate(c, HasMatch("planets", "sats",
      "planets.name = sats.planet AND sats.sat_name LIKE 'P%'",
      columnName = "has_p_sat", performIntegrityCheck = false))
    assert(c("planets").count() == 6)
    assert(c("planets").where("has_p_sat").select("name").collect().map(_.getString(0)).toSet == Set("Mars"))
  }

  test("has_match integrity check throws on one-to-many") {
    val c = cat("planets" -> planets, "sats" -> satellites)
    intercept[ConstraintException] {
      StepInterpreter.evaluate(c, HasMatch("planets", "sats",
        "planets.name = sats.planet", columnName = "has_sat"))
    }
  }

  test("join_header embeds the single target row as a struct column") {
    val c = cat("planets" -> planets, "hdr" -> planets.where("name = 'Earth'").select("name", "n_moons"))
    StepInterpreter.evaluate(c, JoinHeader("planets", "hdr", "header"))
    assert(c("planets").count() == 6)
    assert(c("planets").select("header.name").distinct().collect().map(_.getString(0)).toSeq == Seq("Earth"))
  }

  test("join_header throws when target cardinality != 1") {
    val c = cat("planets" -> planets, "hdr" -> satellites)
    val e = intercept[ConstraintException] {
      StepInterpreter.evaluate(c, JoinHeader("planets", "hdr", "header"))
    }
    assert(e.getMessage.contains("multiple entries"))
  }

  test("union is by-name case-insensitive with source casing and null padding") {
    import spark.implicits._
    val a = Seq(("Pluto", 0.06)).toDF("name", "gravity")
    val b = Seq(("CHARON", 5, true)).toDF("NAME", "extra", "Dwarf")
    val c = cat("a" -> a, "b" -> b)
    StepInterpreter.evaluate(c, Union("a", "b"))
    // source casing & order win; target-only columns appended
    assert(c("a").columns.toSeq == Seq("name", "gravity", "extra", "Dwarf"))
    assert(rows(c("a")) == Set(
      Seq("Pluto", 0.06, null, null),
      Seq("CHARON", null, 5, true)))
  }

  test("identify_orphans flags source rows without a match") {
    val c = cat("planets" -> planets, "sats" -> satellites)
    StepInterpreter.evaluate(c, IdentifyOrphans("planets", "sats", "planets.name = sats.planet"))
    assert(c("planets").where("IsOrphaned").select("name").collect().map(_.getString(0)).toSet ==
      Set("Mercury", "Venus"))
    assert(c("planets").count() == 6)
  }

  test("identify_orphans ORs into an existing flag") {
    val c = cat("planets" -> planets, "sats" -> satellites)
    StepInterpreter.evaluate(c, IdentifyOrphans("planets", "sats",
      "planets.name = sats.planet AND sats.sat_name = 'Moon'"))
    StepInterpreter.evaluate(c, IdentifyOrphans("planets", "sats",
      "planets.name = sats.planet AND sats.sat_name = 'Titan'"))
    // orphaned unless it has BOTH Moon and Titan — only nothing has both, so
    // all but none... Earth has Moon (first pass not orphan; second pass OR true)
    val orphanNames = c("planets").where("IsOrphaned").select("name")
      .collect().map(_.getString(0)).toSet
    assert(orphanNames == planets.select("name").collect().map(_.getString(0)).toSet)
  }

  test("copy_entity aliases; entities are immutable so no aliasing hazards") {
    val c = cat("planets" -> planets)
    StepInterpreter.evaluate(c, CopyEntity("planets", "p2"))
    StepInterpreter.evaluate(c, Add("p2", "z", "1"))
    assert(c("p2").columns.contains("z") && !c("planets").columns.contains("z"))
  }

  test("rename_entity moves the name") {
    val c = cat("planets" -> planets)
    StepInterpreter.evaluate(c, RenameEntity("planets", "worlds"))
    assert(c.contains("worlds") && !c.contains("planets"))
  }

  test("remove_entity and remove_entities drop names") {
    val c = cat("planets" -> planets, "sats" -> satellites)
    StepInterpreter.evaluate(c, RemoveEntities(Seq("planets", "sats")))
    assert(c.names.isEmpty)
  }

  test("refdata entities are readable via prefix and immutable") {
    val c = EntityCatalog(Map("x" -> planets), refdata = Map("lk" -> satellites))
    assert(c("refdata_lk").count() == 6)
    intercept[ConstraintException] { c("refdata_lk") = planets }
    intercept[ConstraintException] { c.remove("refdata_lk") }
  }

  test("analyzeCondition extracts equi pairs and side predicates") {
    val ec = StepInterpreter.analyzeCondition(
      "a.x = b.y AND a.z=b.w AND b.v > 3 AND a.u LIKE 'q%'", "a", "b").get
    assert(ec.equis == Seq(("x", "y"), ("z", "w")))
    assert(ec.tgtPreds == Seq("b.v > 3"))
    assert(ec.srcPreds == Seq("a.u LIKE 'q%'"))
  }

  test("analyzeCondition bails on OR, parens, cross-side inequality, unqualified refs") {
    import StepInterpreter.analyzeCondition
    assert(analyzeCondition("a.x = b.y OR a.z = b.w", "a", "b").isEmpty)
    assert(analyzeCondition("(a.x = b.y)", "a", "b").isEmpty)
    assert(analyzeCondition("a.x >= b.y", "a", "b").isEmpty)
    assert(analyzeCondition("a.x = b.y AND z = 3", "a", "b").isEmpty)
    assert(analyzeCondition("a.x != b.y", "a", "b").isEmpty)
  }
}
