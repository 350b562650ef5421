package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan regression guards: the optimizations the engine depends on
  * at 100 TB must stay visible in the plans — a silently regressed broadcast
  * or lost filter pushdown is a scale bug even when results stay correct.
  */
class PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("line-grain cleaners ship exploded lines through ONE exchange") {
    // intraDocLineDedup: the doc-id repartition must satisfy both the
    // (doc, line) window and the groupBy — a second Exchange means every
    // exploded line shuffles twice
    val p1 = plan("q_text_intradoc_dedup")
    assert(p1.sliding("Exchange".length).count(_ == "Exchange") <= 1, p1.take(2000))
    val p2 = plan("q_text_c4_clean")
    assert(p2.sliding("Exchange".length).count(_ == "Exchange") <= 1, p2.take(2000))
  }

  test("dimension joins broadcast the small side") {
    assert(plan("q_left_join").contains("BroadcastHashJoin"))
    assert(plan("q_refdata").contains("BroadcastHashJoin"))
  }

  test("filters push down to the parquet scan") {
    val p = formatted(SparkEntry.queries("q_embed_knn")(spark, sfDir))
    assert(p.contains("PushedFilters") && p.contains("LessThan(vec_id,10)"))
  }

  test("column pruning reaches the scan: projection-only queries read few columns") {
    val p = formatted(SparkEntry.queries("q_filter")(spark, sfDir))
    // only the 4 projected + 2 filter columns, not all 11 lineitem columns
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.count(_ == ',') < 6, readSchema)
  }

  test("1:1 integrity output is a single join (no row-id shuffle)") {
    val p = plan("q_one_to_one_join")
    assert(!p.contains("monotonically_increasing_id"))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
  }

  test("minhash signature is the native codegen expression, not an interpreted HOF") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sig = docs.select(graft.text.Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("sig", graft.text.Dedup.minHashSignature(col("sh"), 128))
    val p = sig.queryExecution.executedPlan.toString
    // the signature projection must be the native expression inside a
    // WholeStageCodegen span (the shingling transform above it is fine —
    // it is per-row and small; the 128-permutation loop was the hot spot)
    assert(p.linesIterator.exists(l => l.contains("minhash_signature") && l.trim.startsWith("*")))
  }

  test("simhash and fingerprint are native codegen expressions in the plan") {
    // "*(n)" marks a WholeStageCodegen span on the operator's own line
    val pSim = plan("q_dedup_simhash")
    assert(pSim.linesIterator.exists(l => l.contains("simhash") && l.contains("*(")), pSim)
    val pFp = plan("q_doc_fingerprint")
    assert(pFp.linesIterator.exists(l => l.contains("poly_fingerprint") && l.contains("*(")), pFp)
    // no interpreted char-fold HOFs left in either hot path
    assert(!pSim.contains("aggregate(") && !pFp.contains("aggregate("), pFp)
  }

  test("cosine scoring uses the native dot-product expression") {
    val p = plan("q_embed_knn")
    assert(p.contains("double_dot_product"))
    assert(!p.contains("aggregate(zip_with"))
  }

  test("reject anti-join carries no forced broadcast hint (AQE decides)") {
    val logical = graft.queries.ContractQueries.queries("q_contract_reject")(spark, sfDir)
      .queryExecution.logical.toString
    assert(!logical.toLowerCase.contains("broadcast"))
  }

  test("LSH bucket codes are the native expression, computed once per row") {
    val p = plan("q_embed_neardup")
    // native expression present, interpreted per-plane HOF chain gone (the
    // adaptive plan carries no codegen markers pre-execution, so assert on
    // the expression, not the `*` span)
    assert(p.contains("lsh_bucket_code"), p)
    assert(!p.contains("aggregate(zip_with"), p)
    // ...and evaluated once per input row, not inlined into all 9 probes
    val evals = p.linesIterator.map(l => "lsh_bucket_code".r.findAllIn(l).size).maxOption.getOrElse(0)
    assert(evals <= 1, s"lsh_bucket_code inlined $evals times on one plan line:\n$p")
  }

  test("LSH near-dup candidate shuffle carries no embedding payloads") {
    val p = formatted(SparkEntry.queries("q_embed_neardup")(spark, sfDir))
    // every Exchange before the verify join-back moves (id, bucket) rows;
    // vectors appear only in the scan -> verify join sections
    val exchangeLines = p.linesIterator.filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty)
    assert(!exchangeLines.exists(_.contains("_vec")), exchangeLines.mkString("\n"))
  }

  test("candidate joins pin their partitioning against AQE input-sized coalescing") {
    // Candidate-join inputs are byte-small while outputs are quadratic in
    // bucket occupancy: AQE would coalesce the exchange to a couple of
    // straggler tasks (measured by the 10x scale probe). The numbered
    // repartition (REPARTITION_BY_NUM) is exempt from coalescing and must
    // stay in the plan on the join keys.
    for (q <- Seq("q_dedup_minhash", "q_dedup_ngram", "q_dedup_simhash_pairs",
        "q_embed_neardup", "q_dedup_cross")) {
      val p = plan(q)
      assert(p.contains("REPARTITION_BY_NUM"), s"$q lost its pinned candidate partitioning:\n$p")
    }
  }

  test("mixing joins its per-stratum totals by broadcast with a pruned scan") {
    val p = plan("q_mix_budget")
    assert(p.contains("BroadcastHashJoin"), p)
    val f = formatted(SparkEntry.queries("q_mix_budget")(spark, sfDir))
    // the corpus-side scan reads only (doc_id, lang); token counting reads
    // (text, lang) on the totals side — never the full documents schema
    val readSchema = f.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("n_chars") && !readSchema.contains("source"), readSchema)
  }

  test("chunking and shuffle keys stay single narrow stages (no Exchange)") {
    for (q <- Seq("q_chunk_docs", "q_shuffle_det")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q gained a shuffle:\n$p")
    }
    assert(plan("q_chunk_docs").contains("Generate"), "chunking lost its generator")
  }

  test("quality rulesets are single narrow stages; classifier weights broadcast") {
    for (q <- Seq("q_text_gopher", "q_text_c4")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q gained a shuffle:\n$p")
    }
    // the <= buckets-row weight table must join by broadcast, never shuffle
    // the id-only feature lane against it
    assert(plan("q_text_classifier").contains("BroadcastHashJoin"))
  }

  test("line dedup joins the corpus-size aggregate by broadcast (no driver count)") {
    val p = plan("q_text_line_dedup")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("bucketed co-located join plans with no shuffle on either side") {
    // disable broadcast so the join exercises the bucketed sort-merge path
    // even at sf0.001 table sizes
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = SparkEntry.queries("q_bucketed_join")(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("array-field validation explodes instead of interpreted HOF lambdas") {
    val p = plan("q_contract_nested")
    // explode -> Generate node; the per-element checks then live in a
    // codegen'd projection, not inside transform()/filter() lambdas
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("transform("), p)
  }

  test("edit-distance candidates are equi-joins, never a nested-loop scan") {
    val p = plan("q_dedup_editdist")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
  }

  test("incremental dedup applies the bloom predicate before the anti-join") {
    val p = plan("q_dedup_incremental")
    // both branches filter on the sketch; the anti-join sees suspects only
    assert(p.contains("might_contain"), p)
    assert(p.split("might_contain").length >= 3, p) // suspect + clean branch
  }

  test("span dedup is windows + keyed aggregations, no cartesian anywhere") {
    val p = plan("q_dedup_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("Window"), p)
  }

  test("stream-stream interval join compiles to a symmetric stream join with watermarks") {
    // analyzed (pre-execution) plan: the streaming join node and both
    // event-time watermarks must be present
    val s = spark
    val dir = "/tmp/graft_planspec_sj"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    import org.apache.spark.sql.functions._
    val ev = spark.range(4).select(col("id").as("user_id"),
      org.apache.spark.sql.functions.expr("timestamp'2024-01-01 10:00:00' + make_interval(0,0,0,0,0,cast(id as int),0)").as("ts"))
    ev.write.parquet(s"$dir/l"); ev.select(col("user_id"), col("ts").as("ts2")).write.parquet(s"$dir/r")
    val l = s.readStream.schema(s.read.parquet(s"$dir/l").schema).parquet(s"$dir/l")
    val r = s.readStream.schema(s.read.parquet(s"$dir/r").schema).parquet(s"$dir/r")
    val j = graft.streaming.Streaming.intervalJoin(l, r, "user_id", "ts", "ts2",
      "1 hour", "30 minutes")
    val analyzed = j.queryExecution.analyzed.toString
    assert(analyzed.split("EventTimeWatermark").length == 3, analyzed)
    assert(analyzed.contains("Join Inner"), analyzed)
  }

  test("SQ and IVF-PQ search paths plan with broadcast joins / fused kernel only") {
    for (q <- Seq("q_embed_sq_knn", "q_embed_ivfpq")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$q regressed to a non-broadcast join:\n$p")
    }
    // SQ search still rides broadcast joins
    assert(plan("q_embed_sq_knn").contains("BroadcastHashJoin"), plan("q_embed_sq_knn"))
    // IVF-PQ is the fused mapPartitions kernel (r16): assignment + codes +
    // LUT scoring in the scan task, TopKByAgg the only aggregation after it
    val pq = plan("q_embed_ivfpq")
    assert(pq.contains("MapPartitions"), pq)
    assert(pq.contains("topk_by"), pq)
  }

  test("brute-cosine quartet runs the fused kernel: no join, no per-pair projection") {
    for (q <- Seq("q_embed_quality", "q_embed_hard_negatives", "q_embed_ivf")) {
      val p = plan(q)
      assert(p.contains("MapPartitions"), s"$q lost its fused kernel:\n$p")
      assert(!p.contains("NestedLoopJoin"), s"$q regressed to per-pair join rows:\n$p")
    }
    // quality is row-local end to end: ZERO exchanges in the whole plan
    assert(!plan("q_embed_quality").contains("Exchange"),
      s"q_embed_quality gained a shuffle:\n${plan("q_embed_quality")}")
  }

  test("z-order key is pure codegen column arithmetic (no shuffle, no fallback)") {
    val p = plan("q_layout_zorder")
    assert(!p.contains("Exchange"), s"zorder key gained a shuffle:\n$p")
    // the projection computing the key sits in a WholeStageCodegen span
    assert(p.linesIterator.exists(l => l.contains("Project") && l.trim.startsWith("*")), p)
  }

  test("jl_project is the native expression in the plan (no interpreted HOF)") {
    val docs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val p = docs.select(graft.similarity.Similarity.jlProject(
      org.apache.spark.sql.functions.col("embedding"), 16))
      .queryExecution.executedPlan.toString
    assert(p.contains("jl_project"), p)
    assert(!p.contains("aggregate(zip_with"), p)
  }

  test("bm25 filters query terms before any shuffle; stats/df ride broadcasts") {
    val p = plan("q_text_bm25")
    // the IN-list term filter must appear below the first Exchange: only
    // query-term postings leave the scan stage at 100 TB
    val firstExchange = p.indexOf("Exchange")
    val termFilter = p.indexOf("term#")
    assert(firstExchange > 0 && termFilter > 0, p)
    assert(p.substring(firstExchange).contains("BroadcastExchange"), p)
    val filterIdx = p.indexOf(" IN (spark,")
    assert(filterIdx > firstExchange, p) // plan prints top-down: filter BELOW the shuffle
    // top-k is a merged per-partition heap, never a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("heavy hitters prunes through a broadcast semi-join on bucket ids") {
    val p = plan("q_text_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    // pass 1 aggregates fixed-cardinality buckets with map-side partials
    assert(p.contains("partial_count"), p)
  }

  test("temperature mixing broadcasts its rate table; corpus side never sort-merges") {
    val p = plan("q_sample_temperature")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("snapshot diff prunes both scans to id + text before hashing") {
    val f = formatted(SparkEntry.queries("q_corpus_diff")(spark, sfDir))
    val schemas = f.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.nonEmpty)
    // documents has 5 columns; the diff reads only doc_id + text
    schemas.foreach(s => assert(s.count(_ == ',') <= 1, s))
  }

  test("funnel is fixed-depth keyed joins: no window, no cartesian") {
    val p = plan("q_events_funnel")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("char entropy is the single-pass native expression, not 29 regex re-scans") {
    val p = plan("q_text_entropy")
    assert(p.contains("char_entropy"), p)
    assert(!p.contains("regexp_count"), p)
    // single-eval: the struct is computed once, both fields projected from it
    assert(p.linesIterator.count(_.contains("char_entropy")) <= 2, p)
  }

  test("kmeans|| scoring rides broadcast joins only") {
    val p = plan("q_embed_kmeanspp")
    assert(p.contains("Broadcast"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }
}
