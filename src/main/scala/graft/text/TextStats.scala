package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization stats,
  * quality scoring, n-gram-free language ID heuristic, and document
  * fingerprinting. Everything is a pure Column expression (per-row, no
  * shuffle, no UDF) so the operators map over 100 TB as a narrow stage.
  */
object TextStats {

  /** Whitespace tokens. */
  def tokens(textCol: Column): Column = split(textCol, "\\s+")

  /** BPE-ish subword count: runs of letters, single digits, or runs of
    * non-alphanumeric-non-space — a simplified GPT-2-style pretokenizer.
    * `regexp_count` keeps it inside codegen.
    */
  val BpeishPattern = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]+"
  def bpeishTokenCount(textCol: Column): Column = regexp_count(textCol, lit(BpeishPattern))

  /** Per-language closed-class word lists for the language-ID heuristic.
    * Tiny on purpose: language ID at corpus scale is a ratio of
    * stopword hits per candidate language, argmax with a deterministic
    * alphabetical tiebreak.
    */
  val StopwordLists: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "en"))

  /** Fraction of tokens present in `words` (a fixed list). */
  def stopwordRatio(toks: Column, words: Seq[String]): Column = {
    val wordArr = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(wordArr, t))).cast("double") / size(toks).cast("double")
  }

  /** Predicted language: argmax of per-language stopword ratio with
    * alphabetical-first tiebreak; "und" (undetermined) when no list hits.
    */
  def languageId(textCol: Column): Column = {
    val toks = tokens(lower(textCol))
    val scored = StopwordLists.zipWithIndex.map { case ((lang, words), i) =>
      // struct comparison is field-order lexicographic: score first, then
      // negated alphabetical rank so ties resolve to the FIRST language.
      struct(stopwordRatio(toks, words).as("score"), lit(-i).as("nrank"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality heuristics per document (ref motivation: Gopher/C4-style
    * quality filters): token count, distinct ratio, mean token length,
    * alpha ratio, and a composite [0,1] score.
    */
  def qualityColumns(textCol: Column): Seq[(String, Column)] = {
    val toks = tokens(textCol)
    val nTokens = size(toks)
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTokens.cast("double")
    // sum of token lengths == count of non-whitespace chars (tokens are
    // maximal non-\s runs; a leading empty token contributes 0) — avoids an
    // interpreted aggregate() fold, stays in codegen
    val meanTokLen = length(regexp_replace(textCol, "\\s", "")).cast("double") / nTokens.cast("double")
    val alphaRatio = (length(regexp_replace(textCol, "[^a-zA-Z]", "")).cast("double")
      / greatest(length(textCol), lit(1)).cast("double"))
    val lengthOk = (nTokens >= 10 && nTokens <= 100000).cast("double")
    val tokLenOk = (meanTokLen >= lit(2.0) && meanTokLen <= lit(12.0)).cast("double")
    val score = round((distinctRatio + alphaRatio + lengthOk + tokLenOk) / 4, 6)
    Seq(
      "n_tokens" -> nTokens.cast("bigint"),
      "n_distinct_tokens" -> size(array_distinct(toks)).cast("bigint"),
      "distinct_ratio" -> round(distinctRatio, 6),
      "mean_token_len" -> round(meanTokLen, 6),
      "alpha_ratio" -> round(alphaRatio, 6),
      "quality_score" -> score)
  }

  /** Gopher-style quality-filter signals (the Rae et al. 2021 repetition/
    * quality ruleset practitioners quote by name): word-count bounds, mean
    * word length, symbol-to-word ratio (# and ellipses), bullet- and
    * ellipsis-line fractions, fraction of words containing an alphabetic
    * character, and a minimum count of distinct common English stop words.
    * All ratios are integer micro-units (floor(1e6 * num / den)) so an
    * external engine reproduces them bit-for-bit; `gopher_keep` is the
    * conjunction with the paper's thresholds. Pure codegen regexp columns
    * — no UDF, no HOF lambda, no shuffle.
    */
  def gopherColumns(textCol: Column): Seq[(String, Column)] = {
    val nWords = size(tokens(textCol))
    val nLines = size(split(textCol, "\n"))
    def microFrac(num: Column, den: Column): Column =
      when(den > 0, floor(num.cast("double") * 1000000.0 / den.cast("double")))
        .otherwise(lit(0.0)).cast("bigint")
    val meanWordLen = microFrac(length(regexp_replace(textCol, "\\s", "")), nWords)
    val symbolRatio = microFrac(
      regexp_count(textCol, lit("#")) + regexp_count(textCol, lit("\\.\\.\\.")) +
        regexp_count(textCol, lit("…")), nWords)
    val bulletFrac = microFrac(regexp_count(textCol, lit("(?m)^\\s*[-*•]")), nLines)
    val ellipsisFrac = microFrac(
      regexp_count(textCol, lit("(?m)(\\.\\.\\.|…)[ \\t]*$")), nLines)
    val alphaWordFrac = microFrac(
      regexp_count(textCol, lit("(^|\\s)[^\\s]*[A-Za-z][^\\s]*")), nWords)
    val stopWords = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHits = stopWords.map(w =>
      when(textCol.rlike(s"(^|\\s)$w(\\s|$$)"), 1L).otherwise(0L)).reduce(_ + _)
    val keep = nWords >= 50 && nWords <= 100000 &&
      meanWordLen >= 3000000L && meanWordLen <= 10000000L &&
      symbolRatio <= 100000L && bulletFrac <= 900000L &&
      ellipsisFrac <= 300000L && alphaWordFrac >= 800000L && stopHits >= 2L
    Seq(
      "n_words" -> nWords.cast("bigint"),
      "mean_word_len_micro" -> meanWordLen,
      "symbol_ratio_micro" -> symbolRatio,
      "bullet_frac_micro" -> bulletFrac,
      "ellipsis_frac_micro" -> ellipsisFrac,
      "alpha_word_frac_micro" -> alphaWordFrac,
      "stop_hits" -> stopHits,
      "gopher_keep" -> keep)
  }

  /** Blocklist (bad-words) page filter — the C4 discipline of dropping any
    * page containing a listed term: per-term word-boundary presence tests
    * (case-insensitive), summed into the count of DISTINCT blocked terms
    * present; `keep` when none. Presence via one rlike per term stays
    * exact under adjacent-term overlaps (a counting regex would consume
    * the shared separator) and is engine-replicable. Terms are
    * regex-escaped — a literal list, not patterns. Pure codegen columns.
    */
  def blocklistColumns(textCol: Column, terms: Seq[String]): Seq[(String, Column)] = {
    require(terms.nonEmpty, "blocklist must not be empty")
    val lowered = lower(textCol)
    val hits = terms.map { t =>
      val q = java.util.regex.Pattern.quote(t.toLowerCase)
      when(lowered.rlike(s"(^|\\s)$q(\\s|$$)"), 1L).otherwise(0L)
    }.reduce(_ + _)
    Seq(
      "n_blocked_terms" -> hits,
      "blocklist_keep" -> (hits === 0L))
  }

  /** C4-style page-level filter signals (Raffel et al. 2020): lorem-ipsum
    * and curly-brace markers, sentence count, and the kept-line count
    * under the "ends in terminal punctuation AND has >= 5 words" line
    * rule. `c4_keep` is the page conjunction (no markers, >= 3
    * sentences). Line REMOVAL (reassembly) composes from [[lineDedup]]'s
    * per-line lane; these are the page-level columns — pure codegen, no
    * shuffle.
    */
  def c4Columns(textCol: Column): Seq[(String, Column)] = {
    val nSentences = regexp_count(textCol, lit("[.!?]"))
    val hasLorem = lower(textCol).contains("lorem ipsum")
    val hasBrace = textCol.contains("{")
    // within-line separators only ([ \t], not \s): \s matches \n, which
    // would let one greedy match swallow several lines and undercount
    val keptLine = "(?m)^[ \\t]*(?:[^\\s]+[ \\t]+){4,}[^\\s]*[.!?\"'][ \\t]*$"
    Seq(
      "n_lines" -> size(split(textCol, "\n")).cast("bigint"),
      "n_kept_lines" -> regexp_count(textCol, lit(keptLine)).cast("bigint"),
      "n_sentences" -> nSentences.cast("bigint"),
      "has_lorem" -> hasLorem,
      "has_brace" -> hasBrace,
      "c4_keep" -> (!hasLorem && !hasBrace && nSentences >= 3))
  }

  /** Corpus audit report: the per-stratum statistics a curation team
    * reviews before training — doc counts, exact-dup mass, token mass, and
    * mean quality — as ONE aggregation pass over the corpus. Fractions and
    * means are reported in integer micro-units (floor(1e6 * x)), the
    * cross-engine-exact encoding for ratios of bigints.
    *
    * 100 TB shape: a single hash aggregation keyed by the strata columns
    * (partial aggregation absorbs the per-row work map-side); the only
    * per-stratum heavy state is count_distinct(text), which Spark executes
    * as a two-level aggregation — for corpora where even that is too much,
    * swap in approx_count_distinct (the q_distinct_approx scale path).
    */
  def corpusReport(docs: org.apache.spark.sql.DataFrame, textCol: String,
                   strata: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(strata.nonEmpty, "corpusReport needs at least one stratum column")
    val q = qualityColumns(col(textCol)).toMap
    val base = docs.select(
      strata.map(col) ++ Seq(
        col(textCol).as("__t__"),
        size(tokens(col(textCol))).as("__nt__"),
        round(q("quality_score") * 1000000).cast("bigint").as("__q6__"),
        length(col(textCol)).as("__len__")): _*)
    def micro(num: Column, den: Column): Column =
      floor(num.cast("double") * 1000000.0 / den.cast("double")).cast("bigint")
    base.groupBy(strata.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("__t__")).as("n_unique_texts"),
        sum(col("__nt__")).as("__sumnt__"),
        sum(col("__q6__")).as("__sumq__"),
        min(col("__len__")).as("__minc__"),
        max(col("__len__")).as("__maxc__"))
      .select(
        strata.map(col) ++ Seq(
          col("n_docs").cast("bigint").as("n_docs"),
          col("n_unique_texts").cast("bigint").as("n_unique_texts"),
          micro(col("n_docs") - col("n_unique_texts"), col("n_docs"))
            .as("dup_frac_micro"),
          col("__sumnt__").cast("bigint").as("n_tokens"),
          micro(col("__sumnt__"), col("n_docs")).as("mean_tokens_micro"),
          floor(col("__sumq__").cast("double") / col("n_docs").cast("double"))
            .cast("bigint").as("mean_quality_micro"),
          col("__minc__").cast("bigint").as("min_chars"),
          col("__maxc__").cast("bigint").as("max_chars")): _*)
  }

  /** Zipf least-squares fit over the `topK` token ranks: the slope of
    * ln(frequency) against ln(rank). Natural corpora track slope ~ -1
    * (Zipf's law); machine-generated or template-heavy corpora flatten or
    * steepen it, so the slope is a cheap corpus-health dial next to the
    * per-doc quality columns.
    *
    * Engine-exact discipline: x = floor(1e6*ln(rank)) and
    * y = floor(1e6*ln(cnt)) are integers, all least-squares sums are exact
    * integer aggregates (decimal-widened products), and only the final
    * slope/intercept divisions run in double — on identical exact operands
    * in both engines. Output: one row (n_terms, slope_micro,
    * intercept_micro).
    *
    * Shuffle shape at 100 TB: the token count is one partial-aggregated
    * shuffle; everything after the top-K limit runs on `topK` rows.
    */
  def zipfFit(docs: org.apache.spark.sql.DataFrame, textCol: String,
              topK: Int = 200): org.apache.spark.sql.DataFrame = {
    // row_number over the already-limited topK frame: single-partition
    // window over topK rows, not over the corpus
    val ranked = topTokens(docs, textCol, topK).withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("token"))))
    val xy = ranked.select(
      floor(lit(1000000.0) * log(col("rank").cast("double")))
        .cast("bigint").as("x"),
      floor(lit(1000000.0) * log(col("cnt").cast("double")))
        .cast("bigint").as("y"))
    val a = xy.agg(
      count(lit(1)).cast("bigint").as("n"),
      sum(col("x")).cast("bigint").as("sx"),
      sum(col("y")).cast("bigint").as("sy"),
      sum(col("x") * col("y")).cast("bigint").as("sxy"),
      sum(col("x") * col("x")).cast("bigint").as("sxx"))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val num = (d("n") * d("sxy") - d("sx") * d("sy")).cast("double")
    val den = (d("n") * d("sxx") - d("sx") * d("sx")).cast("double")
    a.select(col("n").as("n_terms"),
      when(den === 0.0, lit(0L)).otherwise(
        floor(lit(1000000.0) * num / den).cast("bigint")).as("slope_micro"),
      when(den === 0.0, lit(0L)).otherwise(
        floor((col("sy").cast("double") - (num / den) * col("sx").cast("double"))
          / col("n").cast("double")).cast("bigint")).as("intercept_micro"))
  }

  /** Within-document repetition signals (Gopher-style repetition filters):
    * the fraction of word n-gram occurrences that are repeats of an earlier
    * occurrence, for n = 2 and 3. Highly repetitive machine-generated or
    * boilerplate text scores high; docs with fewer than n+1 tokens score 0.
    * Pure per-row expressions over the shingle sets — no shuffle.
    */
  def repetitionColumns(textCol: Column): Seq[(String, Column)] = {
    // ONE tokenization for both sides of the fraction: whitespace runs are
    // collapsed to single spaces so ShinglesExpr's single-space split sees
    // exactly the \s+ token sequence the denominator counts. Mixing the two
    // splits made the fraction wrong (even negative) on documents with
    // consecutive spaces/tabs/newlines: the denominator saw fewer tokens
    // than the numerator's distinct n-grams.
    val norm = regexp_replace(textCol, "\\s+", " ")
    val nTokens = size(split(norm, " "))
    def dupFrac(n: Int): Column = {
      val total = (nTokens - (n - 1)).cast("double")
      // Dedup.shingles returns DISTINCT n-grams (whole text when < n tokens)
      val distinctN = size(Dedup.shingles(norm, n)).cast("double")
      when(total > 0, round(lit(1.0) - distinctN / total, 6)).otherwise(lit(0.0))
    }
    Seq("dup_2gram_frac" -> dupFrac(2), "dup_3gram_frac" -> dupFrac(3))
  }

  /** Corpus vocabulary: the `k` most frequent whitespace tokens with a
    * deterministic (count desc, token asc) order. One explode + one
    * hash-shuffle on the token; the global top-k is a single-partition sort
    * of the (small) per-token counts.
    */
  def topTokens(docs: org.apache.spark.sql.DataFrame, textCol: String, k: Int): org.apache.spark.sql.DataFrame =
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** PII detection/masking signals (the scrub step of a training-data
    * pipeline): email and long-digit-run detection with a masked text
    * variant. Regexes stay in the RE2/Java common subset so an external
    * engine can replicate them; masking is two codegen'd regexp_replace
    * passes, no UDF. This is a heuristic surface — a production scrubber
    * extends the pattern table, not the mechanism.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumberPattern = "[0-9]{9,}"
  def piiColumns(textCol: Column): Seq[(String, Column)] = {
    val masked = regexp_replace(
      regexp_replace(textCol, EmailPattern, "[EMAIL]"),
      LongNumberPattern, "[NUMBER]")
    Seq(
      "n_emails" -> regexp_count(textCol, lit(EmailPattern)).cast("bigint"),
      "n_long_numbers" -> regexp_count(textCol, lit(LongNumberPattern)).cast("bigint"),
      "masked_sha256" -> sha2(masked.cast("binary"), 256))
  }

  /** Code-vs-prose signals (the "route to the code pipeline / drop
    * minified junk" classifier inputs of mixed web corpora): indentation
    * structure, brace/operator density, camelCase identifiers and keyword
    * hits — all codegen'd regexp counts in the RE2/Java common subset,
    * fractions in the integer-micro discipline of [[gopherColumns]].
    */
  def codeColumns(textCol: Column): Seq[(String, Column)] = {
    val nLines = size(split(textCol, "\n"))
    def microFrac(num: Column, den: Column): Column =
      when(den > 0, floor(num.cast("double") * 1000000.0 / den.cast("double")))
        .otherwise(lit(0.0)).cast("bigint")
    val indentFrac = microFrac(
      regexp_count(textCol, lit("(?m)^(\\t| {4})")), nLines)
    val braceDensity = microFrac(
      regexp_count(textCol, lit("[{}();=]")), length(textCol))
    val semiEolFrac = microFrac(
      regexp_count(textCol, lit("(?m);[ \\t]*$")), nLines)
    val camelCount = regexp_count(textCol,
      lit("\\b[a-z]+[A-Z][A-Za-z]*\\b")).cast("bigint")
    val keywordCount = regexp_count(textCol,
      lit("\\b(def|class|import|return|function|val|var|const|while)\\b")).cast("bigint")
    Seq(
      "indent_frac_micro" -> indentFrac,
      "brace_density_micro" -> braceDensity,
      "semicolon_eol_frac_micro" -> semiEolFrac,
      "camel_count" -> camelCount,
      "keyword_count" -> keywordCount,
      "looks_like_code" ->
        (indentFrac >= 300000L || (braceDensity >= 20000L && keywordCount >= 2L)))
  }

  /** License / usage-rights detection (the compliance gate of training-
    * data pipelines: keep permissive, quarantine restricted): a first-match
    * classification over the standard license phrases plus a dated
    * copyright-line detector. The match ORDER is part of the contract —
    * share-alike must test before plain attribution, public-domain/CC0
    * before both (its text often also mentions Creative Commons).
    */
  def licenseColumns(textCol: Column): Seq[(String, Column)] = {
    val t = lower(textCol)
    def has(pat: String): Column = t.rlike(pat)
    val license =
      when(has("public domain|cc0"), "public-domain")
        .when(has("creative commons.*(share-?alike|by-sa)"), "cc-by-sa")
        .when(has("creative commons.*(non-?commercial|by-nc)"), "cc-by-nc")
        .when(has("creative commons|cc-by|cc by"), "cc-by")
        .when(has("mit license"), "mit")
        .when(has("apache license"), "apache-2.0")
        .when(has("gnu (lesser |affero )?general public license|\\b[la]?gpl\\b"), "gpl")
        .when(has("all rights reserved"), "all-rights-reserved")
        .otherwise("")
    Seq(
      "license" -> license,
      "has_copyright_line" -> has("(©|\\(c\\)|copyright)\\s*(19|20)\\d{2}"),
      "license_keep" -> license.isin("public-domain", "cc-by-sa", "cc-by",
        "mit", "apache-2.0"))
  }

  /** Character-distribution ENTROPY — the classic gibberish/minified-blob
    * detector (natural prose sits ~2.8-4.2 bits nats-equivalent; key-mash
    * and base64 runs score near the uniform ceiling, repeated-char spam
    * near 0). Binned over a-z (case-folded), digits, space, other — 29
    * fixed bins computed as per-row `regexp_count` columns, so the whole
    * signal is ONE codegen projection: no explode, no (doc, char)
    * shuffle, nothing but a narrow scan at any corpus size.
    *
    * Exactness: H = -Σ (c_i/n)·ln(c_i/n) summed in fixed bin order —
    * every term is IEEE-exact division and 1-ulp ln on identical doubles,
    * same order both engines — then one floor to micro-nats.
    */
  def charEntropyBins: Seq[(String, String)] =
    ('a' to 'z').map(c => s"c_$c" -> s"[$c${c.toUpper}]") ++ Seq(
      "c_digit" -> "[0-9]", "c_space" -> "\\s", "c_other" -> "[^a-zA-Z0-9\\s]")
  def charEntropyColumns(textCol: Column): Seq[(String, Column)] = {
    // ONE native single-pass expression, not 29 regexp_count re-scans —
    // the 20x probe measured the regex formulation at 183 s per 100k docs
    // vs one scan here; [[CharEntropyExpression]] documents the identical
    // bin + summation arithmetic (the oracle still uses the regex form)
    val e = CharEntropyExpression.charEntropyColumn(textCol)
    Seq(
      "n_chars_binned" -> e.getField("n_chars_binned"),
      "entropy_micro" -> e.getField("entropy_micro"))
  }

  /** Top-k collocations by pointwise mutual information over ADJACENT
    * token pairs — the phrase-mining step (learning "new york"-style
    * units before tokenizer training). PMI = ln(p(ab) / (p(a)·p(b)))
    * computed as one ln over a ratio of exact integer counts
    * (floor-micro-ln discipline; the multiply order is part of the
    * engine contract — both engines evaluate (n_ab·Tu·Tu)/(Tb·n_a·n_b)
    * left-associated on doubles, so the quotient is bit-identical).
    * `minCount` guards the classic PMI pathology (hapax pairs score
    * highest) — the standard Church-Hanks discipline.
    *
    * Scale shape: two token-keyed partial-aggregated counts (unigram,
    * bigram), totals on broadcast one-row aggregates, a bigram→unigram
    * broadcast-or-hash join keyed on short strings, TakeOrdered top-k.
    */
  def bigramPmi(docs: org.apache.spark.sql.DataFrame, textCol: String,
                minCount: Long, k: Int): org.apache.spark.sql.DataFrame = {
    val ws = split(regexp_replace(col(textCol), "\\s+", " "), " ")
    val base = docs.select(ws.as("__ws__"))
    val uni = base.select(explode(col("__ws__")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val bi = base.select(explode(expr(
        "transform(slice(__ws__, 1, size(__ws__) - 1), (w, i) -> " +
          "concat(w, ' ', element_at(__ws__, i + 2)))")).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
    val totals = broadcast(
      uni.agg(sum(col("n_w")).as("__tu__"))
        .crossJoin(base.agg(sum(greatest(size(col("__ws__")) - 1, lit(0)))
          .cast("bigint").as("__tb__"))))
    bi
      .join(uni.select(col("w").as("__a__"), col("n_w").as("n_a")),
        split(col("bigram"), " ").getItem(0) === col("__a__"))
      .join(uni.select(col("w").as("__b__"), col("n_w").as("n_b")),
        split(col("bigram"), " ").getItem(1) === col("__b__"))
      .crossJoin(totals)
      .select(col("bigram"), col("n_ab"),
        floor(lit(1000000.0) * log(
          (col("n_ab").cast("double") * col("__tu__") * col("__tu__")) /
            (col("__tb__").cast("double") * col("n_a") * col("n_b"))))
          .cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("bigram"))
      .limit(k)
  }

  /** Flesch-style READABILITY scoring — the edu-quality filter signal
    * (FineWeb-Edu-class pipelines rank pages by readability before any
    * model scoring). Words are whitespace tokens, sentences terminal-punct
    * runs (min 1), syllables approximated as vowel-group runs — the
    * standard heuristic. The score is the classic
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words), held
    * entirely in integer micro-units via floored rationals of exact
    * counts, so it replicates across engines; clamping is the caller's
    * business (degenerate texts legitimately score far outside 0-100).
    */
  def readabilityColumns(textCol: Column): Seq[(String, Column)] = {
    // positive-operand integer division as a Column: (a - a mod b) / b —
    // the double quotient of exact integers below 2^53 is exact, so this
    // equals `div` / DuckDB `//` for every value this signal produces
    def idiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    val words = greatest(size(tokens(textCol)), lit(1)).cast("long")
    val sentences = greatest(regexp_count(textCol, lit("[.!?]+")), lit(1)).cast("long")
    val syllables = regexp_count(textCol, lit("[aeiouyAEIOUY]+")).cast("long")
    val score = lit(206835000L) -
      idiv(lit(1015L) * words * 1000000L, lit(1000L) * sentences) -
      idiv(lit(846L) * syllables * 1000000L, lit(10L) * words)
    Seq(
      "n_words" -> words,
      "n_sentences" -> sentences,
      "n_syllables" -> syllables,
      "flesch_micro" -> score)
  }

  /** Unicode SCRIPT detection (the multilingual router ahead of
    * [[languageId]]: stopword lists only work once you know the text is
    * even Latin-script): per-script letter counts over literal codepoint
    * ranges (identical by-codepoint semantics in Java regex and RE2),
    * micro ratios against total letters, and a dominant-script label with
    * a fixed precedence tiebreak.
    */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cyrillic" -> "[Ѐ-ӿ]",
    "greek" -> "[Ͱ-Ͽ]",
    "arabic" -> "[؀-ۿ]",
    "cjk" -> "[一-鿿]")
  def scriptColumns(textCol: Column): Seq[(String, Column)] = {
    val counts = ScriptRanges.map { case (n, p) => n -> regexp_count(textCol, lit(p)) }
    val total = counts.map(_._2).reduce(_ + _)
    def microFrac(num: Column): Column =
      when(total > 0, floor(num.cast("double") * 1000000.0 / total.cast("double")))
        .otherwise(lit(0.0)).cast("bigint")
    val dominant = counts.foldLeft((lit(""), lit(0L))) { case ((bestN, bestC), (n, c)) =>
      // strict > keeps the FIRST (precedence-ordered) script on ties
      (when(c.cast("long") > bestC, lit(n)).otherwise(bestN),
        when(c.cast("long") > bestC, c.cast("long")).otherwise(bestC))
    }._1
    counts.map { case (n, c) => s"${n}_frac_micro" -> microFrac(c) } ++ Seq(
      "n_letters" -> total.cast("bigint"),
      "dominant_script" -> when(total > 0, dominant).otherwise(""))
  }

  /** Expanded PII patterns for [[piiRedactColumns]]. The long-number run
    * is 11+ digits so a 10-digit NHS number is classified (and redacted)
    * as NHS, never double-claimed; patterns stay in the RE2/Java common
    * subset. This is the healthcare-corpus scrub set — emails, IPv4
    * endpoints, NHS numbers (3-3-4 with optional spaces), long id runs.
    */
  val Ipv4Pattern = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val NhsNumberPattern = "\\b[0-9]{3} ?[0-9]{3} ?[0-9]{4}\\b"
  val LongIdPattern = "[0-9]{11,}"

  /** PII REDACTION (not just detection — [[piiColumns]] is the detect
    * variant): per-category counts on the original text plus the redacted
    * text itself, produced by an ordered chain of codegen'd global
    * `regexp_replace` passes (email → IPv4 → NHS → long runs; order is
    * load-bearing — the NHS pass must claim 10-digit runs before the
    * generic long-number pass could see them). Pure per-row narrow work:
    * the shape that runs over every byte of a 100 TB corpus.
    */
  def piiRedactColumns(textCol: Column): Seq[(String, Column)] = {
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(textCol, EmailPattern, "[EMAIL]"),
          Ipv4Pattern, "[IP]"),
        NhsNumberPattern, "[NHS]"),
      LongIdPattern, "[NUMBER]")
    Seq(
      "n_emails" -> regexp_count(textCol, lit(EmailPattern)).cast("bigint"),
      "n_ipv4" -> regexp_count(textCol, lit(Ipv4Pattern)).cast("bigint"),
      "n_nhs_numbers" -> regexp_count(textCol, lit(NhsNumberPattern)).cast("bigint"),
      "n_long_ids" -> regexp_count(textCol, lit(LongIdPattern)).cast("bigint"),
      "redacted" -> redacted)
  }

  /** URL/domain signals (the domain-filtering step of web-corpus pipelines:
    * blocklists, per-domain caps, provenance stats): URL count and the
    * sorted distinct domain list per document. Regexes stay in the
    * RE2/Java common subset so an external engine can replicate them.
    */
  val UrlPattern = "https?://[A-Za-z0-9.-]+(/[^ ]*)?"
  val DomainPattern = "https?://([A-Za-z0-9.-]+)"
  def urlColumns(textCol: Column): Seq[(String, Column)] = Seq(
    "n_urls" -> regexp_count(textCol, lit(UrlPattern)).cast("bigint"),
    "domains" -> concat_ws(",",
      array_sort(array_distinct(regexp_extract_all(textCol, lit(DomainPattern), lit(1))))))

  /** Canonical form of an absolute http(s) URL — the key web-corpus
    * pipelines dedupe crawl records on before any content comparison
    * (CommonCrawl/CCNet discipline): lowercase scheme and host, strip a
    * leading `www.`, drop the scheme's default port (:80 http, :443
    * https), drop the fragment, remove tracking query params (utm_*,
    * gclid, fbclid — other params keep their original order), collapse an
    * empty path to `/` and strip a trailing slash from non-root paths.
    * Pure codegen'd regexp column logic — no UDF, no HOF lambda (the
    * tracking-param removal is a sentinel-delimited global regexp_replace,
    * not an interpreted array filter).
    */
  def urlCanonicalize(urlCol: Column): Column = {
    val scheme = lower(regexp_extract(urlCol, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport0 = lower(regexp_extract(urlCol, "^[^:/?#]+://([^/?#]*)", 1))
    val hostport = regexp_replace(hostport0, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(hostport)
    val path0 = regexp_extract(urlCol, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/"))
      .when(length(path0) > 1, regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    // anchored so only a '?' BEFORE any '#' starts the query — a '?'
    // inside the fragment ("/p#f?x=1") is fragment content, not a query
    val query0 = regexp_extract(urlCol, "^[^#]*?\\?([^#]*)", 1)
    // sentinel-delimited removal: append '&', strip every tracking pair
    // (handles consecutive ones in a single global pass), trim the tail
    val query = regexp_replace(
      regexp_replace(concat(query0, lit("&")),
        "(utm_[^&]*|gclid=[^&]*|fbclid=[^&]*)&", ""),
      "&$", "")
    when(scheme === "", urlCol) // not an absolute URL: pass through
      .otherwise(concat(scheme, lit("://"), host, path,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  /** Top-`k` characteristic terms per document by tf-idf. The idf is the
    * smoothed RATIONAL form (N+1)/(df+1) rather than its logarithm: ranking
    * is order-equivalent per document (log is monotone), and the rational
    * stays bit-exact across engines (IEEE division is fully specified,
    * `ln` differs in the last ulp between libms), so the oracle can
    * hash-match the scores. Shuffle shape: explode → (doc, term) count →
    * term-df join → per-doc top-k window; every stage keys on doc or term,
    * no all-pairs anywhere.
    */
  def tfidfTopTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val termCounts = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val docFreq = termCounts.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    // corpus size N computed IN-plan (broadcast 1-row cross join), not via
    // an eager driver count() job that would re-scan docs per invocation
    val nDocs = broadcast(docs.select(col(idCol)).agg(count(lit(1)).as("__n__")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    termCounts.join(docFreq, "term").crossJoin(nDocs)
      .withColumn("tfidf",
        round(col("tf") * ((col("__n__") + lit(1.0)) / (col("df") + lit(1.0))), 6))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .where(col("rank") <= k)
      .select(col(idCol), col("term"), col("rank"), col("tfidf"))
  }

  /** Document CHUNKING for training-data assembly: each document becomes a
    * sliding window of `chunkTokens`-token chunks starting every `stride`
    * tokens (overlap = chunkTokens - stride), the standard long-document
    * treatment when a model's sequence budget is shorter than the document.
    * The final window is the first start covering the tail, so every token
    * lands in >= 1 chunk and no chunk starts past the text.
    *
    * One tokenization (whitespace runs collapsed, then single-space split —
    * the [[repetitionColumns]] discipline), then a generator per row:
    * chunk extraction is `slice` + `array_join` over the materialized token
    * array, all non-lambda codegen expressions. Per-row fan-out is
    * ceil(n/stride) rows — a narrow stage, no shuffle.
    */
  def chunkDocs(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, chunkTokens: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride <= chunkTokens, got chunkTokens=$chunkTokens stride=$stride")
    val toks = split(regexp_replace(col(textCol), "\\s+", " "), " ")
    val base = docs.select(col(idCol), toks.as("__toks__"))
      .withColumn("__n__", size(col("__toks__")).cast("bigint"))
    // chunks start at 0, stride, 2*stride, ...; the last start is the first
    // multiple of stride >= n - chunkTokens => 1 + ceil(max(0, n - chunk)/stride)
    // chunks in total. Double division is exact here (see mixToBudget note).
    val nChunks = lit(1L) +
      floor((greatest(col("__n__") - chunkTokens, lit(0L)) + (stride - 1)) / lit(stride))
    val start = (col("chunk_idx") * stride).cast("int")
    base
      .withColumn("chunk_idx", explode(sequence(lit(0L), nChunks - 1)))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__toks__"), start + 1, lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens.toLong), col("__n__") - col("chunk_idx") * stride)
          .cast("bigint").as("chunk_n_tokens"))
  }

  /** CONTENT-DEFINED chunking (CDC): chunk boundaries fall where a rolling
    * hash of the last `window` tokens is 0 mod `divisor`, so boundaries
    * depend only on LOCAL content — inserting a sentence early in a
    * document leaves every later boundary (and so every later chunk)
    * intact, where fixed-stride windows ([[chunkDocs]]) shift all of them.
    * That stability is why dedup-oriented pipelines chunk this way: edited
    * re-crawls still collide on their unchanged chunks. Expected chunk
    * length is `divisor` tokens (geometric); no min/max clamp is applied —
    * compose with [[chunkDocs]] downstream if hard bounds are needed.
    *
    * Shape: tokens explode with positions (narrow), the rolling hash is a
    * `window`-row sum of per-token [[fingerprint]]s over a per-doc window
    * (one doc-keyed shuffle — a document's tokens sort in one task, the
    * [[graft.rules.AsofJoin]] single-key contract), boundary counts
    * prefix-sum into chunk ids, and chunks reassemble by (doc, chunk)
    * aggregation. All arithmetic is integer-exact and SQL-replicable.
    */
  def cdcChunks(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, window: Int, divisor: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window > 0 && divisor > 0, s"need positive window/divisor, got $window/$divisor")
    val toks = docs
      .select(col(idCol), posexplode(split(regexp_replace(col(textCol), "\\s+", " "), " "))
        .as(Seq("idx", "token")))
      .withColumn("th", fingerprint(col("token")))
    val wRoll = Window.partitionBy(col(idCol)).orderBy(col("idx"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val wPrev = Window.partitionBy(col(idCol)).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withChunk = toks
      .withColumn("__boundary__",
        col("idx") >= (window - 1) && pmod(sum(col("th")).over(wRoll), lit(divisor.toLong)) === 0)
      .withColumn("chunk_idx",
        coalesce(sum(col("__boundary__").cast("bigint")).over(wPrev), lit(0L)))
    withChunk.groupBy(col(idCol), col("chunk_idx"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("idx"), col("token")))),
          x => x.getField("token")), " ").as("chunk_text"),
        count(lit(1)).as("n_tokens"),
        min(col("idx")).cast("bigint").as("start_idx"))
  }

  /** Unigram corpus-frequency RARITY signals per document — the
    * exactly-replicable analog of LM-perplexity quality filtering (CCNet
    * scores documents under a reference LM; a unigram corpus model is the
    * degenerate case whose statistics need no log, so scores hash-match
    * across engines): mean corpus frequency of the document's tokens (low =
    * rare/misspelled/garbage-heavy vocabulary) and the fraction of tokens
    * outside the corpus top-`topK` (OOV-vs-head rate).
    *
    * Scale shape: one token-keyed count with map-side combine, a
    * distributed top-k (TakeOrderedAndProject, never a full vocab sort on
    * one task), the top set broadcast, then a doc-keyed aggregation.
    */
  def tokenRarity(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, topK: Int): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val top = broadcast(counts.orderBy(col("cnt").desc, col("token")).limit(topK)
      .select(col("token"), lit(true).as("__top__")))
    toks.join(counts, "token").join(top, Seq("token"), "left")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_tokens"),
        round(sum(col("cnt")).cast("double") / count(lit(1)), 6).as("mean_token_freq"),
        round(count(when(col("__top__").isNull, true)).cast("double")
          / count(lit(1)), 6).as("oov_frac"))
  }

  /** Bigram language-model fluency score — the hash-exact analog of
    * LM-perplexity filtering one order above [[tokenRarity]]'s unigram
    * signal: machine-mangled or shuffled text has locally-improbable token
    * TRANSITIONS even when every individual token is common. Scores are
    * conditional probabilities in integer micro-units,
    * p(w2|w1) = 1e6 * c(w1 w2) / c(w1) floor-divided, averaged per doc —
    * all bigint arithmetic, so the DuckDB oracle is bit-exact.
    *
    * Shuffle shape at 100 TB: one per-doc window (docs are independent) to
    * form transitions, two partial-aggregated counts (unigram, bigram —
    * map-side combine collapses hot pairs before the shuffle), one
    * bigram-keyed join back. No driver materialization, no row blowup.
    * Documents with < 2 tokens have no transitions: n_bigrams 0, score 0.
    */
  def bigramLmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("__id__"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "w1")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id__")).orderBy(col("pos"))
    // transition and its guard in ONE projection (the SpanDedup lesson: a
    // filter between them would re-run lead over already-filtered rows)
    val trans = toks
      .select(col("__id__"), col("w1"), lead(col("w1"), 1).over(w).as("w2"))
      .where(col("w2").isNotNull)
    val uni = toks.groupBy(col("w1")).agg(count(lit(1)).as("__c1__"))
    val bi = trans.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c2__"))
    val scored = trans
      .join(bi, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .withColumn("__p6__",
        floor(col("__c2__").cast("double") * 1000000.0 / col("__c1__"))
          .cast("bigint"))
    val perDoc = scored.groupBy(col("__id__")).agg(
      count(lit(1)).as("n_bigrams"),
      floor(sum(col("__p6__")).cast("double") / count(lit(1)))
        .cast("bigint").as("mean_bigram_p_micro"))
    docs.select(col(idCol).as("__id__"))
      .join(perDoc, Seq("__id__"), "left")
      .select(col("__id__").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).cast("bigint").as("n_bigrams"),
        coalesce(col("mean_bigram_p_micro"), lit(0L)).cast("bigint")
          .as("mean_bigram_p_micro"))
  }

  /** Corpus-level boilerplate LINE removal (the C4 discipline: drop lines
    * that recur across many documents — nav bars, cookie banners, footers —
    * while keeping lines that belong to the document). Emits one row per
    * (doc, line) with the line's cross-document frequency and a keep flag
    * (`n_docs / corpus_size <= maxDocFrac`); callers filter and reassemble
    * (`keep` preserves `line_idx` order), keeping this operator a pure
    * columnar pipeline.
    *
    * Shuffle shape at 100 TB: explode lines → partial-aggregated count per
    * line (map-side combine collapses the boilerplate mass BEFORE the
    * shuffle — a line in a billion docs ships one partial count per task) →
    * join back on the line key, reusing the aggregation's partitioning; the
    * corpus size joins as a broadcast 1-row aggregate, never a driver
    * count().
    */
  def lineDedup(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, maxDocFrac: Double): org.apache.spark.sql.DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("line_idx", "line")))
    val lineDf = lines.groupBy(col("line"))
      .agg(count_distinct(col(idCol)).as("n_docs"))
    val corpusSize = broadcast(docs.agg(count(lit(1)).as("__n__")))
    lines.join(lineDf, "line").crossJoin(corpusSize)
      .withColumn("keep",
        col("n_docs").cast("double") / col("__n__") <= maxDocFrac)
      .select(col(idCol), col("line_idx").cast("bigint").as("line_idx"),
        col("line"), col("n_docs"), col("keep"))
  }

  /** WITHIN-document repeated-line removal (the Dolma pipeline's
    * paragraph-dedup step at line grain): a page that repeats its own
    * navigation block, share bar, or chorus keeps only the FIRST
    * occurrence of each distinct line; later copies drop and the document
    * reassembles in original order. The cross-document complement is
    * [[lineDedup]] — this one needs no corpus state at all.
    *
    * Output: (id, n_lines, n_dup_lines, dedup_text).
    *
    * Shuffle shape at 100 TB: lines never leave their document, and the
    * whole operator is ONE doc-keyed exchange: the explicit repartition
    * on the doc id satisfies BOTH the (doc, line) first-occurrence window
    * (ClusteredDistribution(id, line) is satisfied by HashPartitioning(id))
    * and the reassembly groupBy — without it Catalyst inserts an
    * Exchange on (id, line) for the window and a SECOND one on id for the
    * aggregation, shipping every exploded line twice (PlanSpec pins the
    * single-exchange shape).
    */
  def intraDocLineDedup(docs: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = docs.select(col(idCol).as("__id__"),
      posexplode(split(col(textCol), "\n")).as(Seq("__li__", "__line__")))
      .repartition(col("__id__"))
    val w = Window.partitionBy(col("__id__"), col("__line__")).orderBy(col("__li__"))
    val flagged = lines.withColumn("__rn__", row_number().over(w))
    flagged.groupBy(col("__id__")).agg(
      count(lit(1)).as("n_lines"),
      count(when(col("__rn__") > 1, 1)).as("n_dup_lines"),
      // collect_list skips the nulls of the dropped copies; sort restores
      // document order (the SpanDedup reassembly idiom)
      array_join(sort_array(collect_list(
        when(col("__rn__") === 1, struct(col("__li__"), col("__line__")))))
        .getField("__line__"), "\n").as("dedup_text"))
      .select(col("__id__").as(idCol), col("n_lines").cast("bigint").as("n_lines"),
        col("n_dup_lines").cast("bigint").as("n_dup_lines"), col("dedup_text"))
  }

  /** C4 line-RULE cleaning — the removal counterpart of [[c4Columns]]'s
    * page-level signals (Raffel et al.: keep only lines that end in
    * terminal punctuation AND have >= `minWords` words; drop any line
    * containing the word "javascript"). Dropped lines vanish and the
    * document reassembles in order — the actual text surgery a C4-style
    * pipeline ships, not just the keep/drop statistics.
    *
    * Output: (id, n_lines, n_kept_lines, clean_text).
    *
    * Shuffle shape at 100 TB: identical to [[intraDocLineDedup]] — one
    * doc-keyed aggregation; the line predicate is pure per-row codegen.
    */
  def c4LineClean(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, minWords: Int = 5): org.apache.spark.sql.DataFrame = {
    require(minWords >= 1)
    val lines = docs.select(col(idCol).as("__id__"),
      posexplode(split(col(textCol), "\n")).as(Seq("__li__", "__line__")))
    val t = trim(col("__line__"))
    // same terminal-punct family as c4Columns' keptLine regex
    val keep = t.rlike("[.!?\"']$") &&
      size(split(t, "[ \\t]+")) >= minWords &&
      !lower(col("__line__")).contains("javascript")
    lines.withColumn("__keep__", keep)
      .groupBy(col("__id__")).agg(
        count(lit(1)).as("n_lines"),
        count(when(col("__keep__"), 1)).as("n_kept_lines"),
        array_join(sort_array(collect_list(
          when(col("__keep__"), struct(col("__li__"), col("__line__")))))
          .getField("__line__"), "\n").as("clean_text"))
      .select(col("__id__").as(idCol), col("n_lines").cast("bigint").as("n_lines"),
        col("n_kept_lines").cast("bigint").as("n_kept_lines"), col("clean_text"))
  }

  /** 32-bit polynomial rolling-hash fingerprint of the whole text
    * (h = h*31 + codepoint mod 2^32, seed 17) — deterministic, ANSI-SQL
    * replicable, order-sensitive (unlike a bag-of-words hash). Computed by
    * the native [[PolyHashExpr]]: the HOF char-fold is CodegenFallback and
    * allocates a per-character array per row.
    */
  def fingerprint(textCol: Column): Column = TextHashExpressions.fingerprint(textCol)
}
