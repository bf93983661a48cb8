package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Synthetic-case coverage for the text cleaning / curation composition
  * and the thresholded contamination ratio (VERDICT r4 #1): fixture-scale
  * oracle rows are the driver's gate; these pin the SEMANTICS on
  * hand-constructed documents where the expected outcome is derivable by
  * eye. */
class TextCurateSpec extends SparkSpec {

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("grafttext").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("synthetic"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val messy =
    "wow!!!! what??? is this....... \t ok -----------end"
  private val messyCleaned = "wow! what? is this... ok ---end"

  private val piiRaw =
    "Visit https://spam.example/x!!!! or email a.b@ex.com now ok"
  private val piiCurated = "Visit <URL> or email <EMAIL> now ok"

  test("cleanExpr caps punctuation runs, strips control chars, collapses whitespace") {
    import spark.implicits._
    val r = Seq(messy).toDF("text")
      .select(TextAnalysis.cleanExpr($"text").as("c")).head().getString(0)
    assert(r == messyCleaned, s"got: '$r'")
  }

  test("clean_text emits the cleaned text and the exact removed-char count") {
    val dir = writeDocs(Seq(0L -> messy, 1L -> piiRaw))
    val rows = TextAnalysis.cleanText(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(0L).getAs[String]("clean") == messyCleaned)
    assert(rows(0L).getAs[Int]("n_removed") == messy.length - messyCleaned.length)
    // case and real punctuation are PRESERVED (unlike the analysis norm)
    assert(rows(1L).getAs[String]("clean").startsWith("Visit https://"))
  }

  test("curate_text composes clean -> scrub -> re-tokenize with a keep flag") {
    val dir = writeDocs(Seq(0L -> messy, 1L -> piiRaw))
    val rows = TextAnalysis.curateText(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // scrub saw the CLEANED text: the "!!!!" run was capped before the URL
    // match, so the trailing "!" is inside the <URL> mask
    assert(rows(1L).getAs[String]("curated") == piiCurated,
      s"got: '${rows(1L).getAs[String]("curated")}'")
    assert(rows(1L).getAs[Int]("n_redacted") == 2)
    assert(rows(1L).getAs[Int]("n_tokens") == 7)
    assert(rows(1L).getAs[Boolean]("keep"))
    // the messy doc has nothing to redact and too few tokens to keep? it
    // has 7 tokens -> kept; its n_removed matches clean_text's
    assert(rows(0L).getAs[Int]("n_redacted") == 0)
    assert(rows(0L).getAs[Int]("n_removed") == messy.length - messyCleaned.length)
  }

  test("oov_rate is zero for vocabulary-covered docs and positive past the top-N cut") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // corpus with MORE distinct tokens than VocabTopN: doc 0 repeats
    // high-frequency tokens (all land in the induced vocabulary), doc 1
    // is 60 singleton junk tokens (some must fall past the top-N cut)
    val junk = (1 to 60).map(i => s"junktok$i").mkString(" ")
    // every doc-0 token appears twice: frequency 2 outranks all the
    // singleton junk whatever the lexicographic tie-break does
    val dir = writeDocs(Seq(
      0L -> "the the a a of of and and is is",
      1L -> junk))
    val out = TextAnalysis.oovRate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Double]("oov_rate") == 0.0,
      s"high-frequency tokens fell out of vocabulary: ${out(0L)}")
    assert(out(1L).getAs[Double]("oov_rate") > 0.0,
      "singleton junk past the top-N cut must count as OOV")
    assert(out(1L).getAs[Long]("n_tokens") == 60L)
    // totals line up with the shared tokenization
    val tc = TextAnalysis.tokenCount(spark, dir).select($"doc_id", $"ws_tokens")
    val joined = TextAnalysis.oovRate(spark, dir).join(tc, "doc_id")
    assert(joined.filter($"n_tokens" =!= $"ws_tokens").count() == 0)
  }

  // --- thresholded contamination ------------------------------------------

  // eval set = doc_ids 0-4 (EvalDocCount); doc 0 is the benchmark text the
  // corpus docs quote, 1-4 are letter-run padding sharing no 8-gram with
  // the corpus docs' digit-heavy junk
  private val evalText =
    "the quick brown fox jumps over the lazy dog near the river bank"
  private val contaminationCorpus = Seq(
    0L -> evalText,
    1L -> "bbbbb ccccc ddddd eeeee fffff",
    2L -> "ggggg hhhhh iiiii jjjjj kkkkk",
    3L -> "lllll mmmmm nnnnn ooooo ppppp",
    4L -> "qqqqq rrrrr sssss ttttt uuuuu",
    // one embedded eval window ("quick br") inside long unique junk: a
    // COINCIDENTAL hit — any-hit decontamination drops it, the ratio rule
    // must keep it (shared grams ≪ 5% of its grams)
    5L -> "z1x2c3v4 b5n6m7a8 quick br s9d0f1g2 h3j4k5l7 q8w9e0r1 t2y3u4i5 o6p7a8s9 d0f1g2h3 j4k5l6z7 x8c9v0b1 n2m3a4s5",
    // a doc that QUOTES a long span of the benchmark: far over the bar
    6L -> "intro junk quick brown fox jumps over the lazy closing")

  test("contamination_ratio separates one shared 8-gram from a quoted benchmark span") {
    val dir = writeDocs(contaminationCorpus)
    val out = TextAnalysis.contaminationRatio(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(5L, 6L), "report must cover exactly the corpus docs")
    val d5 = out(5L)
    assert(d5.getAs[Long]("n_shared") >= 1L, "embedded eval window not detected")
    assert(d5.getAs[Double]("share_ratio") < TextAnalysis.ContaminationBar)
    assert(!d5.getAs[Boolean]("contaminated"),
      "one coincidental shared gram must stay under the ratio bar")
    val d6 = out(6L)
    assert(d6.getAs[Double]("share_ratio") > TextAnalysis.ContaminationBar)
    assert(d6.getAs[Boolean]("contaminated"), "quoted benchmark span not flagged")
    // sanity: ratio = n_shared / n_grams exactly
    Seq(d5, d6).foreach { r =>
      assert(r.getAs[Double]("share_ratio") ==
        r.getAs[Long]("n_shared").toDouble / r.getAs[Long]("n_grams").toDouble)
    }
  }

  test("any-hit decontamination and the ratio rule agree on n_shared but differ on the flag") {
    val dir = writeDocs(contaminationCorpus)
    val anyHit = TextAnalysis.decontaminate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val ratio = TextAnalysis.contaminationRatio(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // identical numerators: both count distinct eval-shared grams per doc
    Seq(5L, 6L).foreach { id =>
      assert(anyHit(id).getAs[Long]("n_shared") == ratio(id).getAs[Long]("n_shared"))
    }
    // doc 5 is exactly the case the two rules decide differently
    assert(anyHit(5L).getAs[Boolean]("contaminated"), "any-hit must flag doc 5")
    assert(!ratio(5L).getAs[Boolean]("contaminated"), "ratio must keep doc 5")
    assert(anyHit(6L).getAs[Boolean]("contaminated") &&
      ratio(6L).getAs[Boolean]("contaminated"))
  }

  // exactly LineTokens (10) tokens — one full segment shared by 3 docs,
  // which crosses MaxLineDf = 2 and must be pruned from all of them
  private val boiler =
    "this content is licensed under the demo corpus license v1"

  test("line_dedup prunes a cross-doc boilerplate line, keeps unique tails in order") {
    assert(boiler.split(" ").length == TextAnalysis.LineTokens)
    val tails = Seq(
      "alpha beta gamma delta tail one",
      "epsilon zeta eta theta tail two",
      "iota kappa lambda mu tail three")
    val dir = writeDocs(
      tails.zipWithIndex.map { case (t, i) => i.toLong -> s"$boiler $t" } :+
        (3L -> "a wholly unique document with no shared boilerplate at all") :+
        (4L -> boiler)) // 100% boilerplate — must survive as an empty row
    val rows = TextAnalysis.lineDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 5, "every doc must be retained, even fully-pruned ones")
    tails.zipWithIndex.foreach { case (t, i) =>
      assert(rows(i.toLong).getAs[String]("kept_text") == t,
        s"doc $i must keep exactly its unique tail")
      assert(rows(i.toLong).getAs[Long]("n_pruned") == 1L)
      assert(rows(i.toLong).getAs[Long]("n_lines") == 2L)
    }
    assert(rows(3L).getAs[Long]("n_pruned") == 0L)
    assert(rows(3L).getAs[String]("kept_text") ==
      "a wholly unique document with no shared boilerplate at all")
    assert(rows(4L).getAs[String]("kept_text") == "")
    assert(rows(4L).getAs[Long]("n_pruned") == 1L)
  }

  test("line_dedup df counts distinct docs: within-doc repetition is not boilerplate") {
    // the segment repeats TWICE in one doc but exists in only 2 docs
    // total — df = 2 is NOT > MaxLineDf, so nothing is pruned
    val dir = writeDocs(Seq(
      0L -> s"$boiler $boiler",
      1L -> s"$boiler plus six more distinct trailing filler tokens here"))
    val rows = TextAnalysis.lineDedup(spark, dir).collect()
    assert(rows.forall(_.getAs[Long]("n_pruned") == 0L),
      "df must count DISTINCT docs, not occurrences")
  }

  test("token_rarity computes exact per-doc corpus-frequency stats") {
    val dir = writeDocs(Seq(0L -> "a a b", 1L -> "c"))
    val rows = TextAnalysis.tokenRarity(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // corpus freq: a=2, b=1, c=1
    assert(rows(0L).getAs[Long]("n_tokens") == 3L)
    assert(rows(0L).getAs[Long]("min_freq") == 1L) // rarest token: b
    assert(rows(0L).getAs[Long]("sum_freq") == 5L) // 2 + 2 + 1
    assert(rows(0L).getAs[Double]("mean_freq") == 5.0 / 3.0)
    assert(rows(1L).getAs[Long]("min_freq") == 1L)
    assert(rows(1L).getAs[Double]("mean_freq") == 1.0)
  }

  test("dup_ngram_coverage: shared span covered exactly, unique doc zero, identical pair full") {
    import spark.implicits._
    // normalized span well over DupSpanChars (32) chars, shared verbatim
    val span = "this exact clause is repeated verbatim across two documents"
    assert(span.length > TextAnalysis.DupSpanChars)
    val docs = Seq(
      1L -> "completely original prose sharing nothing with any neighbor",
      2L -> s"alpha beta $span gamma delta",
      3L -> s"omega psi chi $span upsilon",
      4L -> "twin payload sentence duplicated wholesale between five four",
      5L -> "twin payload sentence duplicated wholesale between five four",
      6L -> "tiny").toDF("doc_id", "text")
    val rows = TextAnalysis.dupNgramCoverageOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Long]("dup_chars") == 0L)
    assert(rows(1L).getAs[Double]("dup_frac") == 0.0)
    // the shared region includes the space on each side of the span
    // (both docs normalize to "... <span> ..."), so the interval union
    // of duplicated 32-gram starts covers exactly span.length + 2 chars
    assert(rows(2L).getAs[Long]("dup_chars") == span.length + 2L)
    assert(rows(3L).getAs[Long]("dup_chars") == span.length + 2L)
    // an identical pair is fully covered: every gram is duplicated
    assert(rows(4L).getAs[Double]("dup_frac") == 1.0)
    assert(rows(4L).getAs[Long]("dup_chars") == rows(4L).getAs[Long]("n_chars"))
    assert(rows(5L).getAs[Double]("dup_frac") == 1.0)
    // shorter than one span width: no grams, zero coverage
    assert(rows(6L).getAs[Double]("dup_frac") == 0.0)
  }

  test("span_dedup excises the shared region, keeps unique docs intact, empties identical twins") {
    import spark.implicits._
    val span = "this exact clause is repeated verbatim across two documents"
    val unique = "completely original prose sharing nothing with any neighbor"
    val twin = "twin payload sentence duplicated wholesale between five four"
    val docs = Seq(
      1L -> unique,
      2L -> s"alpha beta $span gamma delta",
      3L -> s"omega psi chi $span upsilon",
      4L -> twin,
      5L -> twin).toDF("doc_id", "text")
    val rows = TextAnalysis.spanDedupOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // unique doc: untouched (normalized form)
    assert(rows(1L).getAs[String]("kept_text") == unique)
    assert(rows(1L).getAs[Long]("removed_chars") == 0L)
    // the removed region includes the space on each side of the span,
    // so the surviving halves are glued with no separator
    assert(rows(2L).getAs[String]("kept_text") == "alpha betagamma delta")
    assert(rows(3L).getAs[String]("kept_text") == "omega psi chiupsilon")
    assert(rows(2L).getAs[Long]("removed_chars") == span.length + 2L)
    // identical twins both lose everything — keep-one-copy is document
    // dedup's job upstream, span removal is the boilerplate pass
    assert(rows(4L).getAs[String]("kept_text") == "")
    assert(rows(5L).getAs[String]("kept_text") == "")
    assert(rows(4L).getAs[Long]("removed_chars") == rows(4L).getAs[Long]("n_chars"))
    // structural invariant: removed_chars is the same interval union
    // dup_ngram_coverage scores, and the surviving text length is the
    // complement — for EVERY doc
    val cov = TextAnalysis.dupNgramCoverageOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_chars")).toMap
    rows.foreach { case (id, r) =>
      assert(r.getAs[Long]("removed_chars") == cov(id),
        s"doc $id: removed != coverage dup_chars")
      assert(r.getAs[String]("kept_text").length ==
        r.getAs[Long]("n_chars") - r.getAs[Long]("removed_chars"),
        s"doc $id: kept length != n_chars - removed")
    }
  }

  test("decontaminate_spans removes only the eval-quoted region, keeps the rest") {
    import spark.implicits._
    // doc_id < EvalDocCount (5) plays the benchmark; a corpus doc quotes
    // one of its clauses verbatim, another shares nothing
    val benchClause = "the quick brown fox question appears in the benchmark"
    val docs = Seq(
      0L -> s"benchmark item one: $benchClause",
      1L -> "benchmark item two: unrelated held out question text here",
      10L -> s"training page intro $benchClause trailing original prose",
      11L -> "fully original training document with no benchmark overlap")
      .toDF("doc_id", "text")
    val rows = TextAnalysis.decontaminateSpansOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // eval docs are NOT in the output (they are the benchmark)
    assert(rows.keySet == Set(10L, 11L))
    // the quoting doc loses exactly the quoted region (plus the LEADING
    // space — shared in both texts; the trailing side diverges, the
    // clause ends the eval doc, so that space survives)
    assert(rows(10L).getAs[String]("kept_text") == "training page intro trailing original prose")
    assert(rows(10L).getAs[Long]("removed_chars") == benchClause.length + 1L)
    // the clean doc is untouched
    assert(rows(11L).getAs[String]("kept_text") ==
      "fully original training document with no benchmark overlap")
    assert(rows(11L).getAs[Long]("removed_chars") == 0L)
    // contrast with flag-level decontamination: it would DROP doc 10
    // entirely; the surgical form keeps its original prose
    assert(rows(10L).getAs[String]("kept_text").nonEmpty)
  }

  test("lm_score: bigram model from the train slice, per-language, exact moments") {
    import spark.implicits._
    // train slice (src0, en): "a b a b c" -> bigram counts (a,b)=2,
    // (b,a)=1, (b,c)=1; context counts a=2, b=2. Everything else scores.
    val docs = Seq(
      (0L, "a b a b c", "en", "src0"),
      (1L, "a b x", "en", "src9"),
      (2L, "z z", "en", "src9"),
      (3L, "a b", "fr", "src9"),
      (4L, "hi", "en", "src0")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.lmScoreOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // a one-token doc has no conditional to score
    assert(!out.contains(4L))
    // the training doc predicts itself perfectly
    val d0 = out(0L)
    assert(d0.getAs[Long]("n_bigrams") == 4 && d0.getAs[Long]("n_hits") == 4)
    assert(d0.getAs[Long]("sum_cvw") == 6 && d0.getAs[Long]("sum_cv") == 8)
    assert(d0.getAs[Double]("hit_rate") == 1.0)
    // (a,b) is in-model, (b,x) is an unseen continuation of a SEEN context
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_bigrams") == 2 && d1.getAs[Long]("n_hits") == 1)
    assert(d1.getAs[Long]("n_ctx_hits") == 2)
    assert(d1.getAs[Long]("sum_cvw") == 2 && d1.getAs[Long]("sum_cv") == 4)
    assert(d1.getAs[Double]("hit_rate") == 0.5)
    // fully out-of-model text bottoms out at zero everywhere
    val d2 = out(2L)
    assert(d2.getAs[Long]("n_hits") == 0 && d2.getAs[Long]("sum_cv") == 0)
    // per-language isolation: "a b" is in the en model, not the fr one
    val d3 = out(3L)
    assert(d3.getAs[Long]("n_hits") == 0 && d3.getAs[Long]("n_ctx_hits") == 0)
  }

  test("gopher_rules: each rule fails in isolation on a doc built to trip it") {
    val good = "the solid table stands of heavy wood and is quite strong"
    val docs = Seq(
      0L -> Seq.fill(3)(good).mkString(" "),               // all rules pass
      1L -> "the house of wood",                           // too few words
      2L -> (Seq.fill(18)("incomprehensibilities the").mkString(" ")
        + " of is and"),                                   // mean len > 10
      3L -> (Seq.fill(3)(good).mkString(" ") + " # # # #"),// symbol ratio
      4L -> (Seq.fill(3)(good).mkString(" ")
        + " 1234 5678 9012 3456 7890 1234 5678 9012 3456"),// alpha frac
      5L -> Seq.fill(3)(
        "solid table stands heavy wood quite strong near door cat")
        .mkString(" "))                                    // no stopwords
    val dir = writeDocs(docs)
    val rows = TextAnalysis.gopherRules(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val ruleCols = Seq("r_word_count", "r_word_len", "r_symbol", "r_alpha",
      "r_stopword")
    assert(ruleCols.forall(rows(0L).getAs[Boolean]) &&
      rows(0L).getAs[Boolean]("keep"))
    val expectFail = Map(1L -> "r_word_count", 2L -> "r_word_len",
      3L -> "r_symbol", 4L -> "r_alpha", 5L -> "r_stopword")
    expectFail.foreach { case (id, failing) =>
      val r = rows(id)
      assert(!r.getAs[Boolean](failing), s"doc $id should fail $failing")
      ruleCols.filterNot(_ == failing).foreach { c =>
        assert(r.getAs[Boolean](c), s"doc $id should pass $c")
      }
      assert(!r.getAs[Boolean]("keep"))
    }
    // measured values are the rule inputs, one division of exact ints
    assert(rows(1L).getAs[Long]("n_words") == 4L)
    assert(rows(0L).getAs[Long]("n_stop_distinct") == 4L)
    assert(rows(3L).getAs[Double]("symbol_ratio") == 4.0 / 37.0)
  }

  test("ngram_diversity: repeated text collapses distinct-n, varied text does not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftdiv").toString
    Seq(
      (0L, "a a a a a a", "rep"),        // 6 uni occurrences, 1 type
      (1L, "b b b b b b", "rep"),        // 5 identical bigrams each
      (2L, "one two three four five six", "var"),
      (3L, "seven eight nine ten eleven twelve", "var")
    ).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("synthetic"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.ngramDiversity(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("n")) -> r).toMap
    // repetitive pool: 12 unigram occurrences, 2 types
    assert(rows(("rep", 1)).getAs[Long]("total_ngrams") == 12L)
    assert(rows(("rep", 1)).getAs[Long]("distinct_ngrams") == 2L)
    // varied pool: every unigram and bigram is its own type
    assert(rows(("var", 1)).getAs[Double]("diversity") == 1.0)
    assert(rows(("var", 2)).getAs[Double]("diversity") == 1.0)
    // the synthetic-pool signal: rep bigram diversity collapses
    assert(rows(("rep", 2)).getAs[Long]("total_ngrams") == 10L)
    assert(rows(("rep", 2)).getAs[Long]("distinct_ngrams") == 2L)
  }
}
