package graft

import graft.ops.{Dsl, Search}
import org.apache.spark.sql.DataFrame

/** The ES query-DSL compiler's semantics the generated oracle can't
  * express alone: clause-context rules (filter gates without scoring,
  * should scores without gating beside a must, minimum_should_match
  * defaults), loud refusal of unsupported clauses, equivalence with
  * the hand-built bm25 path on a plain match, and the pure-filter
  * plan reaching the parquet scan as pushed filters. */
class DslSpec extends SparkSpec {

  import spark.implicits._

  private def run(json: String, docs: DataFrame = null): Seq[Seq[Any]] = {
    val d = if (docs == null) Tables.documentsPar(spark, sfDir) else docs
    Dsl.searchDslOf(d, json).collect().map(_.toSeq).toSeq
  }

  private def ids(rows: Seq[Seq[Any]]): Seq[Long] =
    rows.map(_(1).asInstanceOf[Long])

  /** Controlled corpus: text + keyword + numeric fields. */
  private lazy val tiny = Seq(
    (0L, "rare alpha alpha", "en", "src0", 16L),
    (1L, "alpha beta", "en", "src1", 10L),
    (2L, "beta gamma", "de", "src0", 10L),
    (3L, "rare beta", "en", "src1", 9L),
    (4L, "alpha beta gamma", "fr", "src2", 16L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("a plain match compiles to exactly the bm25TopK ranking") {
    val dsl = run(s"""{"query": {"match": {"text":
      "${Search.QueryTerms.mkString(" ")}"}}, "size": ${Search.TopK}}""")
    val hand = Search.bm25TopK(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(dsl == hand,
      "the DSL compiler and the hand-built path must share one ranking")
  }

  test("bool semantics: must gates and scores, filter gates scoreless, must_not excludes") {
    // must alone: docs with alpha, ranked
    val must = ids(run("""{"query": {"bool": {"must": [
      {"match": {"text": "alpha"}}]}}}""", tiny))
    assert(must.toSet == Set(0L, 1L, 4L))
    // doc 0 has tf=2 and is shortest-normalized → ranks first
    assert(must.head == 0L, s"tf=2 must outrank tf=1: $must")
    // + filter term: same score order, gated to lang=en
    val filtered = ids(run("""{"query": {"bool": {
      "must": [{"match": {"text": "alpha"}}],
      "filter": [{"term": {"lang": "en"}}]}}}""", tiny))
    assert(filtered == must.filter(Set(0L, 1L)),
      "filter must gate without disturbing the score order")
    // + must_not phrase: "alpha beta" adjacency excludes docs 1 and 4
    val notPhrase = ids(run("""{"query": {"bool": {
      "must": [{"match": {"text": "alpha"}}],
      "must_not": [{"match_phrase": {"text": "alpha beta"}}]}}}""", tiny))
    assert(notPhrase == Seq(0L),
      s"adjacent-pair docs must be excluded: $notPhrase")
  }

  test("should: optional-but-scoring beside a must; the only gate alone (msm default 1)") {
    // beside a must, a should hit ADDS score but non-hits still match:
    // docs 1 and 4 both match beta; 4 also matches gamma → 4 outranks 1
    // despite identical beta tf and longer dl only if the should bites
    val withShould = ids(run("""{"query": {"bool": {
      "must": [{"match": {"text": "beta"}}],
      "should": [{"match": {"text": "gamma"}}]}}}""", tiny))
    assert(withShould.toSet == Set(1L, 2L, 3L, 4L),
      "should must not gate beside a must")
    val gammaDocs = Set(2L, 4L)
    assert(withShould.take(2).toSet == gammaDocs,
      s"should hits must outrank non-hits: $withShould")
    // alone, should IS the match condition (minimum_should_match = 1)
    val alone = ids(run("""{"query": {"bool": {
      "should": [{"match": {"text": "gamma"}}]}}}""", tiny))
    assert(alone.toSet == gammaDocs, "a lone should must gate")
    // explicit minimum_should_match = 2 of three clauses
    val msm2 = ids(run("""{"query": {"bool": {
      "should": [{"match": {"text": "rare"}}, {"term": {"lang": "en"}},
                 {"term": {"source": "src1"}}],
      "minimum_should_match": 2}}}""", tiny))
    // rare∧en: 0,3; en∧src1: 1,3; rare∧src1: 3 → {0,1,3}
    assert(msm2.toSet == Set(0L, 1L, 3L), s"msm=2 gate wrong: $msm2")
  }

  test("terms / range / exists compile to exact predicates") {
    val t = ids(run("""{"query": {"terms": {"lang": ["de", "fr"]}}}""", tiny))
    assert(t.toSet == Set(2L, 4L))
    val r = ids(run(
      """{"query": {"range": {"n_chars": {"gte": 10, "lt": 16}}}}""", tiny))
    assert(r.toSet == Set(1L, 2L))
    val e = ids(run("""{"query": {"exists": {"field": "source"}}}""",
      tiny.withColumn("source",
        org.apache.spark.sql.functions.when($"doc_id" =!= 2L, $"source"))))
    assert(e.toSet == Set(0L, 1L, 3L, 4L))
    val all = ids(run("""{"query": {"match_all": {}}, "size": 3}""", tiny))
    assert(all == Seq(0L, 1L, 2L), "match_all scores 0 → doc_id order, size-cut")
  }

  test("unsupported clauses, fields, and malformed bodies refuse loudly") {
    def msg(json: String): String =
      intercept[IllegalArgumentException](run(json, tiny)).getMessage
    assert(msg("""{"query": {"fuzzy": {"text": "x"}}}""")
      .contains("supported"), "unknown clause must name the supported set")
    assert(msg("""{"query": {"bool": {"boost_mode": []}}}""")
      .contains("boost_mode"))
    assert(msg("""{"query": {"term": {"nope": "x"}}}""").contains("nope"),
      "an unknown field must be named")
    assert(msg("""{"query": {"match": {"lang": "en"}}}""")
      .contains("analyzed text field"),
      "match on a keyword field must refuse, not silently scan nothing")
    assert(msg("""{"size": 10}""").contains("query"))
    assert(msg("""{"query": {"range": {"n_chars": {"between": 1}}}}""")
      .contains("gte"), "bad range op must name the supported bounds")
  }

  test("the generated oracle SQL mirrors the compiled clause structure") {
    val sql = Dsl.searchDslSql
    // every clause family of the registered query appears
    assert(sql.contains("qtf1 > 0 OR"), "match OR-of-terms")
    assert(sql.contains("NOT f.qpf1 > 0"), "must_not phrase")
    assert(sql.contains("f.n_chars >= 60 AND f.n_chars < 520"), "range")
    assert(sql.contains("f.source IS NOT NULL"), "exists")
    assert(sql.contains("CASE WHEN"), "should contributions are gated")
    assert(sql.contains("f.lang = 'en'"), "keyword should clause")
    // the keyword should scores pure idf off its value's df statistic
    assert(sql.contains("WHERE lang = 'en') AS qkd1") &&
      sql.contains("s.qkd1"), "term-in-query-context must score idf")
    // match_all generates a scoreless (0.0) oracle
    val scoreless = Dsl.dslSql("""{"query": {"match_all": {}}}""")
    assert(scoreless.contains("0.0 AS score"))
  }

  test("a pure-filter DSL query pushes its predicates to the parquet scan") {
    val plan = Dsl.searchDslOf(Tables.documentsPar(spark, sfDir),
      """{"query": {"bool": {"filter": [
        {"range": {"n_chars": {"gte": 100}}},
        {"term": {"lang": "en"}}]}}, "size": 20}""")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(n_chars,100)") &&
      plan.contains("EqualTo(lang,en)"),
      s"filter context must reach the scan as pushed filters:\n$plan")
  }
}
