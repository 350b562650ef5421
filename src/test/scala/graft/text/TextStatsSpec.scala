package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {

  import spark.implicits._

  test("quality columns compute token stats") {
    val df = Seq("the cat sat on the mat").toDF("text")
    val out = df.select(TextStats.qualityColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
    val r = out.head()
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("n_distinct_tokens") == 5)
    assert(math.abs(r.getAs[Double]("mean_token_len") - 17.0 / 6) < 1e-4)
    assert(r.getAs[Double]("alpha_ratio") > 0.7)
  }

  test("languageId picks the language with most stopword hits, deterministic tiebreak") {
    val df = Seq(
      ("en", "the cat is on the mat and it is happy"),
      ("de", "der hund ist nicht der beste und das ist gut"),
      ("es", "el perro es un animal que vive en la casa"),
      ("und", "zzz qqq www")
    ).toDF("expected", "text")
    val out = df.select(col("expected"), TextStats.languageId(col("text")).as("got"))
    assert(out.where("expected != got").count() == 0)
  }

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq("ab c", "ba c").toDF("text")
    val fps = df.select(TextStats.fingerprint(col("text"))).as[Long].collect()
    assert(fps(0) != fps(1))
    assert(fps.forall(f => f >= 0 && f < (1L << 32)))
    // h("ab c") = fold over codepoints from seed 17
    val expected = "ab c".foldLeft(17L)((h, c) => (h * 31 + c.toLong) % 4294967296L)
    assert(fps(0) == expected)
  }

  test("bpeish token count splits letter runs, digits, and punctuation runs") {
    val df = Seq("hello world 42!!").toDF("text")
    // tokens: hello, world, 4, 2, !!
    assert(df.select(TextStats.bpeishTokenCount(col("text"))).as[Int].head() == 5)
  }

  test("repetition fractions are whitespace-run-proof and never negative") {
    val df = Seq(
      ("single", "a b a b a b"),            // 5 bigram slots, 2 distinct -> 0.6
      ("runs", "a  b \t a\nb  a  b"),       // same token stream, messy whitespace
      ("unique", "one two three four five") // no repeats -> 0.0
    ).toDF("id", "text")
    val out = df.select(col("id") +:
      TextStats.repetitionColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("single") == 0.6)
    assert(out("runs") == out("single")) // whitespace runs must not change the fraction
    assert(out("unique") == 0.0)
    // adversarial: consecutive separators only
    val weird = Seq("a  b  c").toDF("text")
      .select(TextStats.repetitionColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
      .head()
    assert(weird.getDouble(0) >= 0.0 && weird.getDouble(1) >= 0.0)
  }

  test("chunkDocs windows cover every token with the declared overlap") {
    import spark.implicits._
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "short doc"), (3L, "a\t b\n\n c d e")).toDF("doc_id", "text")
    val out = TextStats.chunkDocs(docs, "doc_id", "text", chunkTokens = 16, stride = 8)
      .as[(Long, Long, String, Long)].collect().groupBy(_._1)
    // 40 tokens, window 16/8: starts 0,8,16,24 -> 4 chunks; last covers 24..39
    val d1 = out(1L).sortBy(_._2)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d1.head._3.startsWith("w1 ") && d1.last._3.endsWith(" w40"))
    assert(d1.map(_._4).toSeq == Seq(16L, 16L, 16L, 16L))
    // consecutive chunks overlap by chunkTokens - stride = 8 tokens
    val overlap = d1(0)._3.split(" ").drop(8).toSeq
    assert(d1(1)._3.split(" ").take(8).toSeq == overlap)
    // every token of the doc appears in at least one chunk
    val covered = d1.flatMap(_._3.split(" ")).toSet
    assert((1 to 40).forall(i => covered(s"w$i")))
    // short doc: one chunk, the whole text
    assert(out(2L).toSeq == Seq((2L, 0L, "short doc", 2L)))
    // whitespace runs collapse before windowing (one tokenization)
    assert(out(3L).head._3 == "a b c d e")
  }

  test("chunkDocs exact-boundary and ragged-tail counts") {
    import spark.implicits._
    val mk = (n: Int) => (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, mk(32)), (2L, mk(33)), (3L, mk(16))).toDF("doc_id", "text")
    val out = TextStats.chunkDocs(docs, "doc_id", "text", chunkTokens = 16, stride = 16)
      .as[(Long, Long, String, Long)].collect().groupBy(_._1)
    assert(out(1L).size == 2 && out(1L).map(_._4).sorted.toSeq == Seq(16L, 16L))
    // 33 tokens, non-overlapping 16s: 3 chunks, tail holds 1 token
    assert(out(2L).size == 3 && out(2L).sortBy(_._2).last._4 == 1L)
    assert(out(3L).size == 1)
  }

  test("tokenRarity separates head-vocabulary docs from rare-vocabulary docs") {
    import spark.implicits._
    // "the" dominates the corpus; doc 3 is all rare singletons
    val docs = Seq(
      (1L, "the the the cat"),
      (2L, "the the dog cat"),
      (3L, "zyx wvu tsr qpo")).toDF("doc_id", "text")
    val out = TextStats.tokenRarity(docs, "doc_id", "text", topK = 2)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(4L, 4L, 4L))
    // corpus counts: the=5, cat=2, dog=1, rare=1 each; top-2 = {the, cat}
    assert(out(0)._3 == (5 * 3 + 2) / 4.0)      // doc 1 mean freq
    assert(out(2)._3 == 1.0 && out(2)._4 == 1.0) // doc 3: all rare, all OOV
    assert(out(0)._4 == 0.0)                     // doc 1: all head tokens
    assert(out(1)._4 == 0.25)                    // dog is the only OOV token
  }

  test("cdcChunks boundaries are edit-stable: a prefix insertion leaves later chunks intact") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = (1 to 400).map(_ => s"w${rnd.nextInt(5000)}")
    val original = words.mkString(" ")
    val edited = "inserted sentence goes here " + original
    val docs = Seq((1L, original), (2L, edited)).toDF("doc_id", "text")
    val out = TextStats.cdcChunks(docs, "doc_id", "text", window = 4, divisor = 16)
      .select("doc_id", "chunk_text").as[(Long, String)].collect()
    val c1 = out.filter(_._1 == 1L).map(_._2).toSet
    val c2 = out.filter(_._1 == 2L).map(_._2).toSet
    // every original chunk except the edit-adjacent head reappears verbatim
    // in the edited doc; fixed-stride chunking would shift every window
    val shared = (c1 & c2).size.toDouble / c1.size
    assert(shared > 0.8, s"only ${(shared * 100).round}% of chunks survived the edit")
    // chunks partition the token stream: counts sum to doc length
    val lens = TextStats.cdcChunks(docs, "doc_id", "text", 4, 16)
      .groupBy("doc_id").agg(sum("n_tokens")).as[(Long, Long)].collect().toMap
    assert(lens(1L) == 400 && lens(2L) == 404)
  }

  test("lineDedup flags lines by cross-document frequency, not within-doc count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "intro one\nBOILERPLATE\nbody one"),
      (2L, "intro two\nBOILERPLATE\nbody two"),
      (3L, "intro three\nBOILERPLATE\nbody three"),
      // repeated WITHIN one doc only: distinct-doc count stays 1 -> kept
      (4L, "echo\necho\nBOILERPLATE")
    ).toDF("doc_id", "text")
    val out = TextStats.lineDedup(docs, "doc_id", "text", maxDocFrac = 0.5)
      .as[(Long, Long, String, Long, Boolean)].collect()
    val byLine = out.groupBy(_._3)
    assert(byLine("BOILERPLATE").forall(r => r._4 == 4L && !r._5))
    assert(byLine("echo").forall(r => r._4 == 1L && r._5))
    assert(byLine("body one").forall(r => r._4 == 1L && r._5))
    // line_idx preserves reassembly order per doc
    assert(out.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq ==
      Seq("intro one", "BOILERPLATE", "body one"))
  }

  test("urlColumns counts URLs and lists sorted distinct domains") {
    val df = Seq(
      "read https://b.org/x and http://a.net and https://b.org/y",
      "no links here").toDF("text")
    val out = df.select(TextStats.urlColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
      .as[(Long, String)].collect()
    assert(out(0) == ((3L, "a.net,b.org")))
    assert(out(1) == ((0L, "")))
  }

  test("stopwordRatio counts repeated hits") {
    val df = Seq("the the the word").toDF("text")
    val r = df.select(TextStats.stopwordRatio(TextStats.tokens(col("text")), Seq("the"))).as[Double].head()
    assert(r == 0.75)
  }

  test("bigramLmScore scores transition probability in exact micro-units") {
    val df = Seq(
      (1L, "a b a b"), // transitions: a->b (x2), b->a
      (2L, "a c"), // a->c once
      (3L, "solo") // no transitions
    ).toDF("doc_id", "text")
    val out = TextStats.bigramLmScore(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // corpus: c(a)=3, c(b)=2, c(c)=1, c(solo)=1; c(a,b)=2, c(b,a)=1, c(a,c)=1
    // doc 1: p(b|a)=2*1e6/3=666666 (x2), p(a|b)=1e6/2=500000
    //        mean = floor((666666+666666+500000)/3) = 611110
    assert(out(1L) == ((3L, 611110L)))
    // doc 2: p(c|a)=1e6/3=333333
    assert(out(2L) == ((1L, 333333L)))
    assert(out(3L) == ((0L, 0L)))
  }

  test("corpusReport aggregates per stratum with exact micro-unit ratios") {
    val df = Seq(
      ("en", "web", "one two three"),
      ("en", "web", "one two three"), // exact dup
      ("en", "web", "four five six seven"),
      ("fr", "web", "un deux")
    ).toDF("lang", "source", "text")
    val out = TextStats.corpusReport(df, "text", Seq("lang", "source"))
      .select("lang", "n_docs", "n_unique_texts", "dup_frac_micro",
        "n_tokens", "mean_tokens_micro", "min_chars", "max_chars")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // en: 3 docs, 2 unique -> dup frac 1/3 -> 333333 micro; tokens 3+3+4=10
    assert(out("en") == (("en", 3L, 2L, 333333L, 10L, 3333333L, 13L, 19L)))
    assert(out("fr") == (("fr", 1L, 1L, 0L, 2L, 2000000L, 7L, 7L)))
  }

  test("gopherColumns: hand-computed signals on a 3-line page") {
    val text = "- first bullet\nGood words here ...\nThe cat and dog"
    // tokens (split \s+ across newlines): 11; non-ws chars: 40
    val out = Seq(text).toDF("t")
      .select(TextStats.gopherColumns(col("t")).map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].head()
    assert(out._1 == 11L)                 // n_words
    assert(out._2 == 40L * 1000000 / 11)  // mean_word_len_micro = 3636363
    assert(out._3 == 1000000L / 11)       // one "..." symbol / 11 words
    assert(out._4 == 1000000L / 3)        // 1 of 3 lines is a bullet
    assert(out._5 == 1000000L / 3)        // 1 of 3 lines ends in ellipsis
    assert(out._6 == 9L * 1000000 / 11)   // 9 of 11 tokens contain a letter
    assert(out._7 == 1L)                  // only "and" (case-sensitive: "The" is not "the")
    assert(!out._8)                       // n_words < 50
  }

  test("gopherColumns: a clean prose page passes the full conjunction") {
    val text = Seq.fill(7)("the data and value look right here to stay").mkString(" ")
    val out = Seq(text).toDF("t")
      .select(TextStats.gopherColumns(col("t")).map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].head()
    assert(out._1 == 63L)
    assert(out._2 == 238L * 1000000 / 63) // mean word length ~3.78 chars
    assert(out._7 >= 3L)                  // the, and, to
    assert(out._8, out.toString)
  }

  test("c4Columns: kept-line rule, sentence count, lorem/brace markers") {
    val text = "One two three four five.\nshort line\nlorem ipsum here\n" +
      "Six seven eight nine ten okay!"
    val out = Seq(text).toDF("t")
      .select(TextStats.c4Columns(col("t")).map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Long, Boolean, Boolean, Boolean)].head()
    assert(out == ((4L, 2L, 2L, true, false, false)))
    val ok = Seq("Alpha beta gamma delta one. Two of three four five! Six seven eight nine ten?")
      .toDF("t")
      .select(TextStats.c4Columns(col("t")).map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Long, Boolean, Boolean, Boolean)].head()
    assert(ok._3 == 3L && ok._6, ok.toString) // 3 sentences, keep
    val brace = Seq("{ json: 1 }").toDF("t")
      .select(TextStats.c4Columns(col("t")).map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Long, Boolean, Boolean, Boolean)].head()
    assert(brace._5 && !brace._6)
  }

  test("blocklistColumns: word-boundary case-insensitive presence; adjacent terms both count") {
    val cases = Seq(
      ("clean words only here", 0L),
      ("the BAD word", 1L),            // case-insensitive
      ("bad worse adjacent", 2L),      // shared separator, both present
      ("embedded badge unharmed", 0L), // word boundary: 'badge' != 'bad'
      ("bad", 1L),                     // whole-string match
      ("ends with worse", 1L))
    val out = cases.map(_._1).toDF("t")
      .select(col("t") +: TextStats.blocklistColumns(col("t"), Seq("bad", "worse"))
        .map { case (n, c) => c.as(n) }: _*)
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    cases.foreach { case (t, n) => assert(out(t) == ((n, n == 0L)), s"for '$t'") }
  }

  test("urlCanonicalize folds case/www/default-port/tracking/fragment; keeps semantics") {
    val cases = Seq(
      // the full fold: scheme+host case, www, :443, utm_* pair, fragment,
      // trailing slash — param order of survivors preserved
      "HTTPS://WWW.Ex.COM:443/A/b/?utm_source=x&id=1&utm_campaign=y#f"
        -> "https://ex.com/A/b?id=1",
      // root slash survives; :80 is http's default
      "http://ex.com:80/" -> "http://ex.com/",
      // no path at all -> canonical root
      "https://ex.com" -> "https://ex.com/",
      // only tracking params -> no query at all
      "https://ex.com/?utm_source=a" -> "https://ex.com/",
      // non-default port is semantic
      "https://ex.com:8080/x" -> "https://ex.com:8080/x",
      // :443 is NOT http's default port
      "http://ex.com:443/x" -> "http://ex.com:443/x",
      // consecutive tracking params, fbclid, survivors keep order
      "https://ex.com/p?utm_a=1&utm_b=2&keep=2&fbclid=z&x=3"
        -> "https://ex.com/p?keep=2&x=3",
      // other schemes: host lowercased, path case kept, no port defaults
      "FTP://Ex.com/X/" -> "ftp://ex.com/X",
      // a '?' inside the fragment is NOT a query
      "https://ex.com/p#f?x=1" -> "https://ex.com/p",
      // query before fragment still survives
      "https://ex.com/p?a=1#f?b=2" -> "https://ex.com/p?a=1",
      // query with no path
      "https://ex.com?x=1" -> "https://ex.com/?x=1",
      // not an absolute URL: untouched
      "not a url" -> "not a url")
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), TextStats.urlCanonicalize(col("u")).as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"for $in") }
    // canonicalization is IDEMPOTENT: a canonical URL is its own canonical
    // form (dedup keys stay stable when a pipeline re-canonicalizes)
    val twice = cases.map(_._2).toDF("u")
      .select(col("u"), TextStats.urlCanonicalize(col("u")).as("c"))
      .as[(String, String)].collect()
    twice.foreach { case (in, out) => assert(out == in, s"not idempotent on $in") }
  }

  test("piiRedactColumns: ordered redaction — NHS claims 10-digit runs before long ids") {
    val t = "mail bob@x.co.uk ip 10.0.0.1 nhs 943 476 5919 id 9434765919 long 123456789012"
    val cols = TextStats.piiRedactColumns(col("t"))
    val out = Seq(t).toDF("t")
      .select(cols.map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Long, Long, String)].head()
    assert(out._1 == 1L && out._2 == 1L)
    assert(out._3 == 2L) // both the spaced and the contiguous 10-digit form
    assert(out._4 == 1L) // only the 12-digit run
    assert(out._5 ==
      "mail [EMAIL] ip [IP] nhs [NHS] id [NHS] long [NUMBER]")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("scriptColumns detects dominant scripts and ties keep precedence order") {
    val cases = Seq(
      (1L, "hello world"),          // latin
      (2L, "Привет мир"),           // cyrillic
      (3L, "你好世界"),              // cjk
      (4L, "γειά σου"),             // greek
      (5L, "مرحبا"),                // arabic
      (6L, "ab Пр"),                // 2 latin vs 2 cyrillic: tie -> latin (precedence)
      (7L, "123 !!!"))              // no letters at all
    val cols = TextStats.scriptColumns(col("t"))
    val out = cases.toDF("id", "t")
      .select(col("id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> (r.getString(7), r.getLong(6))).toMap
    assert(out(1L)._1 == "latin" && out(2L)._1 == "cyrillic")
    assert(out(3L)._1 == "cjk" && out(4L)._1 == "greek" && out(5L)._1 == "arabic")
    assert(out(6L)._1 == "latin") // strict > keeps the first on ties
    assert(out(7L) == (("", 0L)))
  }

  test("readabilityColumns: simple prose outranks dense run-ons; hand-checked score") {
    val cases = Seq(
      (1L, "The cat sat. The dog ran. It was fun."),
      (2L, "Notwithstanding interdepartmental considerations necessitating comprehensive reorganizational methodologies evaluation continues indefinitely"))
    val cols = TextStats.readabilityColumns(col("t"))
    val out = cases.toDF("id", "t")
      .select(col("id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val (w, s, y, f) = out(1L)
    assert(w == 9L && s == 3L)
    // hand check: 206835000 - (1015*9*1e6)//(1000*3) - (846*y*1e6)//(10*9)
    val expect = 206835000L - (1015L * 9 * 1000000) / (1000 * 3) -
      (846L * y * 1000000) / (10 * 9)
    assert(f == expect)
    assert(out(1L)._4 > out(2L)._4) // prose scores higher than the run-on
  }

  test("charEntropyColumns: spam scores near zero, varied text higher, empty zero") {
    val cases = Seq(
      (1L, "aaaaaaaaaaaa"),                     // single bin: H = 0
      (2L, "the quick brown fox jumps over it"),// varied prose
      (3L, ""))                                 // no chars
    val cols = TextStats.charEntropyColumns(col("t"))
    val out = cases.toDF("id", "t")
      .select(col("id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((12L, 0L)))
    assert(out(2L)._2 > 2000000L) // > 2 nats: spread across many bins
    assert(out(3L) == ((0L, 0L)))
    // hand check: "aabb" -> H = -2*(0.5 ln 0.5) = ln 2 = 0.693147...
    val h = Seq((1L, "aabb")).toDF("id", "t")
      .select(cols(1)._2).as[Long].head()
    assert(h == 693147L)
  }

  test("bigramPmi ranks an always-together pair above independent fillers") {
    // "new york" always adjacent; "the" pairs with everything
    val docs = (1 to 30).map(i =>
      (i.toLong, s"the w$i of new york and the w${i + 100} to")).toDF("id", "text")
    val out = TextStats.bigramPmi(docs, "text", minCount = 20L, k = 5)
      .select("bigram").as[String].collect().toSeq
    assert(out.contains("new york"))
    // hapax pairs ("of new" appears 30x too... check "the w$i" excluded by min count)
    assert(out.head == "new york" || out.take(3).contains("new york"))
  }

  test("codeColumns separates code from prose") {
    val code = "def main() {\n    val xValue = run();\n    return xValue;\n}"
    val prose = "This is a perfectly ordinary sentence about nothing much."
    val cols = TextStats.codeColumns(col("t"))
    val out = Seq((1L, code), (2L, prose)).toDF("id", "t")
      .select(col("id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(5), r.getBoolean(6))).toMap
    val (codeIndent, codeKw, codeFlag) = out(1L)
    assert(codeIndent == 500000L) // 2 of 4 lines indented
    assert(codeKw >= 3L && codeFlag)
    val (_, _, proseFlag) = out(2L)
    assert(!proseFlag)
  }

  test("licenseColumns: match order and copyright-line detection") {
    val cases = Seq(
      (1L, "Dedicated to the public domain (CC0); see Creative Commons."),
      (2L, "Creative Commons Attribution-ShareAlike 4.0"),
      (3L, "Creative Commons Attribution 4.0 International"),
      (4L, "Released under the MIT License. Copyright 2021 Acme."),
      (5L, "All rights reserved."),
      (6L, "no license text at all"))
    val cols = TextStats.licenseColumns(col("t"))
    val out = cases.toDF("id", "t")
      .select(col("id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out(1L)._1 == "public-domain") // CC0 wins over the CC mention
    assert(out(2L)._1 == "cc-by-sa")      // share-alike before plain by
    assert(out(3L)._1 == "cc-by")
    assert(out(4L) == (("mit", true, true)))
    assert(out(5L) == (("all-rights-reserved", false, false)))
    assert(out(6L) == (("", false, false)))
  }

  test("intraDocLineDedup keeps first occurrences only, reassembled in order") {
    val docs = Seq(
      (1L, "alpha line\nnav bar\nbeta line\nnav bar\nalpha line\ntail"),
      (2L, "only\nunique\nlines")).toDF("doc_id", "text")
    val out = TextStats.intraDocLineDedup(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().map(t => t._1 -> t).toMap
    assert(out(1L) == ((1L, 6L, 2L, "alpha line\nnav bar\nbeta line\ntail")))
    assert(out(2L) == ((2L, 3L, 0L, "only\nunique\nlines")))
  }

  test("c4LineClean drops rule-failing lines and reassembles the rest") {
    val text = Seq(
      "This is a proper sentence with enough words.",   // kept
      "Home | About | Contact",                          // no terminal punct
      "Too short.",                                      // < 5 words
      "Please enable JavaScript to continue reading.",   // javascript
      "Does a question with five words count?",          // kept (?)
      "").mkString("\n")                                 // blank line dropped
    val out = TextStats.c4LineClean(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").as[(Long, Long, Long, String)].head()
    assert(out == ((1L, 6L, 2L,
      "This is a proper sentence with enough words.\n" +
        "Does a question with five words count?")))
  }
}
