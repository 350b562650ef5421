package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding vocabulary induction — tokenizer TRAINING as a
  * corpus operator. Classic BPE (Sennrich et al.) works on the word
  * frequency table, not the raw corpus: each round counts adjacent symbol
  * pairs weighted by word count, merges the globally most frequent pair
  * (ties broken lexicographically, so training is deterministic), and
  * repeats. The word table is what shuffles — bounded by distinct
  * vocabulary, not corpus size.
  *
  * Per-round shape at 100 TB: one pair explode + partial-aggregated count
  * over the word table, one 1-row argmax to the driver (the merge decision
  * — same driver role as k-means centroid collection), one per-row merge
  * projection (native codegen [[BpeMergeExpr]], no HOF lambda). Lineage is
  * cut per round with localCheckpoint, like connectedComponents.
  */
object Bpe {

  /** Greedy left-to-right merge of adjacent (a, b) symbol pairs — the
    * exact single-round BPE word update: after a merge the scan resumes
    * AFTER the merged symbol ([a,a,a] with pair (a,a) -> [aa, a]).
    */
  def mergePair(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new Array[Any](n)
    var i = 0
    var m = 0
    while (i < n) {
      val cur = syms.getUTF8String(i)
      if (i + 1 < n && cur != null && cur.equals(a)) {
        val nxt = syms.getUTF8String(i + 1)
        if (nxt != null && nxt.equals(b)) {
          out(m) = UTF8String.concat(a, b); m += 1; i += 2
        } else { out(m) = cur; m += 1; i += 1 }
      } else { out(m) = cur; m += 1; i += 1 }
    }
    new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], m))
  }

  def mergeColumn(syms: Column, a: String, b: String): Column =
    ExpressionBridge.column(BpeMergeExpr(
      ExpressionBridge.expression(syms),
      ExpressionBridge.expression(lit(a)),
      ExpressionBridge.expression(lit(b))))

  /** One learned merge: `round` is 1-based merge order (= token rank in
    * the induced vocabulary), `pair_count` the weighted adjacency count
    * that won the round.
    */
  case class Merge(round: Int, left: String, right: String, count: Long)

  /** Train `numMerges` BPE merges over the whitespace vocabulary of
    * `textCol`. Returns the merge table (round, left, right, merged,
    * pair_count) — the artifact a tokenizer consumes.
    *
    * `batch` > 1 enables BATCHED training (the standard distributed-BPE
    * trick): each Spark round counts pairs ONCE, takes the top-`batch`
    * pairs by (count desc, left, right), and applies them sequentially in
    * that rank order. A production 32k-merge vocabulary then needs
    * ~32k/batch Spark rounds instead of 32k sequential jobs. Semantics are
    * deterministic but differ slightly from classic one-at-a-time BPE:
    * `pair_count` is measured at the START of the round (before earlier
    * merges in the same batch apply), and a pair whose occurrences were
    * consumed by an earlier in-batch merge is still recorded (applying it
    * is a no-op; a merged symbol formed mid-round cannot win until the
    * next round). Rounds follow a FIXED schedule: each consumes `batch`
    * round numbers even when fewer candidate pairs exist (missing ranks
    * are no-ops), so the merge table is reproducible by a static replay of
    * the schedule. `batch = 1` (default) is exactly classic BPE.
    */
  def trainBpe(docs: DataFrame, textCol: String, numMerges: Int,
               batch: Int = 1): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(batch >= 1, s"batch must be positive, got $batch")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(TextStats.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    var syms = words.select(col("wc"), split(col("w"), "").as("s"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val m = math.min(batch, numMerges - r + 1)
      val pairs = syms
        .select(col("wc"),
          slice(col("s"), lit(1), size(col("s")) - 1).as("la"),
          slice(col("s"), lit(2), size(col("s")) - 1).as("ra"))
        .select(col("wc"), explode(arrays_zip(col("la"), col("ra"))).as("p"))
        .select(col("wc"), col("p.la").as("l"), col("p.ra").as("r"))
        .groupBy(col("l"), col("r")).agg(sum(col("wc")).as("cnt"))
      // one TakeOrdered to the driver per ROUND (m merge decisions — the
      // same driver role as k-means centroid collection)
      val best = pairs.orderBy(col("cnt").desc, col("l"), col("r")).limit(m)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        var s = syms
        best.zipWithIndex.foreach { case (row, k) =>
          val (l, rt, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += Merge(r + k, l, rt, cnt)
          // sequential in-batch application: m collapsed codegen
          // projections, ONE checkpoint per round below
          s = s.select(col("wc"), mergeColumn(col("s"), l, rt).as("s"))
        }
        // FIXED schedule: a round that returns fewer than `m` candidates
        // still consumes all `m` round numbers (the missing ranks are
        // no-ops) — round numbering and total round count then match a
        // static replay of the schedule (the DuckDB oracle's sentinel
        // folds) even on degenerate vocabularies where a batch comes up
        // short.
        r += m
        syms = s.localCheckpoint(false)
      }
    }
    mergeFrame(spark, merges.toSeq)
  }

  /** Tokenize a corpus with a learned merge list — the APPLY side of BPE.
    * The scale trick: encode the DISTINCT-word vocabulary once (vocab is
    * bounded, corpus is not), then join the per-occurrence token lane back
    * to it — at 100 TB the merge chain runs over millions of words, not
    * trillions of occurrences. The merge chain itself is `merges.size`
    * collapsed projections of the native [[BpeMergeExpr]] (one codegen
    * stage, no HOF lambda). Per-doc output: word/subword-token counts and
    * chars-per-token (micro-units), the compression-rate signal tokenizer
    * evaluations use.
    */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[Merge]): DataFrame = {
    val words = docs
      .select(col(idCol), explode(TextStats.tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
    var syms = words.select(col("w")).distinct()
      .select(col("w"), split(col("w"), "").as("s"))
    merges.sortBy(_.round).foreach { m =>
      syms = syms.select(col("w"), mergeColumn(col("s"), m.left, m.right).as("s"))
    }
    val encoded = syms.select(col("w"),
      size(col("s")).cast("long").as("__nt__"),
      length(col("w")).cast("long").as("__nc__"))
    words.join(encoded, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__nt__")).as("n_tokens"),
        sum(col("__nc__")).as("__nc__"))
      .select(col(idCol),
        col("n_words").cast("long").as("n_words"),
        col("n_tokens").cast("long").as("n_tokens"),
        floor(col("__nc__") * lit(1000000L) / col("n_tokens"))
          .cast("long").as("chars_per_token_micro"))
  }

  /** [[encodeCorpus]] from the merge TABLE [[trainBpe]] returns — collects
    * the merge list to the driver (numMerges rows of tokenizer metadata,
    * not data; same driver role as k-means centroids).
    */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
                   mergeTable: DataFrame): DataFrame =
    encodeCorpus(docs, idCol, textCol,
      mergeTable.select("round", "left", "right", "pair_count").collect().toSeq
        .map(r => Merge(r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3))))

  /** Parse a FIXED public-format merge table (the `merges.txt` layout GPT-2
    * family tokenizers publish: optional `#`-comment header, one
    * space-separated `left right` pair per line, rank = line order).
    * Training pipelines pack against a fixed released vocabulary, not one
    * learned per corpus — this is the load side of that contract; the
    * returned list drops into the same [[encodeCorpus]] merge chain as a
    * [[trainBpe]] result. Pair counts are 0: a released vocabulary ships
    * ranks, not corpus statistics.
    */
  def loadMerges(lines: Iterator[String]): Seq[Merge] =
    lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .zipWithIndex.map { case (l, i) =>
        // No split limit: 'a b c' must FAIL (3 parts), not silently parse
        // as right-token "b c" — a malformed table is a config error.
        val parts = l.split(" ")
        require(parts.length == 2, s"merges line ${i + 1} is not 'left right': '$l'")
        Merge(i + 1, parts(0), parts(1), 0L)
      }.toSeq

  /** [[loadMerges]] from a classpath resource (vendored vocabulary fixture). */
  def loadMergesResource(resource: String): Seq[Merge] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"merge table resource not found: $resource")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try loadMerges(src.getLines()) finally src.close()
  }

  /** The merge list as a frame (driver-built: it IS driver metadata, like
    * k-means centroids — `numMerges` rows, not data).
    */
  def mergeFrame(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("round", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("left", StringType),
      org.apache.spark.sql.types.StructField("right", StringType),
      org.apache.spark.sql.types.StructField("merged", StringType),
      org.apache.spark.sql.types.StructField("pair_count", org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(
      java.util.Arrays.asList(merges.map(m =>
        Row(m.round.toLong, m.left, m.right, m.left + m.right, m.count)): _*),
      schema)
  }
}

/** Greedy adjacent-pair merge over an array<string> symbol column. */
final case class BpeMergeExpr(first: Expression, second: Expression,
                              third: Expression) extends TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_merge"

  override protected def nullSafeEval(syms: Any, a: Any, b: Any): Any =
    Bpe.mergePair(syms.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, a, b) => s"graft.text.Bpe.mergePair($s, $a, $b)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeMergeExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
