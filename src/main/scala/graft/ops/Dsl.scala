package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.Tables

/** ES Query-DSL compiler — the JSON query language the reference's
  * consumers actually write against the index the service maintains
  * (es.go builds its cluster for exactly this API; mapping.json:13-38
  * declares the text + keyword fields the clauses below address). A
  * user migrating from the reference hands the SAME JSON to
  * [[searchDslOf]] and gets the same bool/match/term/range semantics,
  * compiled into ONE declarative Spark plan instead of interpreted
  * per-document.
  *
  * Supported clauses (the ES core an ingest-search service serves):
  * `bool` (must / should / must_not / filter / minimum_should_match),
  * `match` (analyzed OR-of-terms, BM25-scored), `match_phrase`
  * (adjacency, scored as a term with tf = phrase frequency), `term`
  * (keyword/numeric equality — scores PURE IDF in query context, the
  * exact Lucene number for a norms-off keyword field: tf=1 and dl=1
  * make BM25's tf part (1·(k1+1))/(1+k1) ≡ 1), `terms`
  * (OR-of-equalities, unscored — the constant-score convention),
  * `range` (gte/gt/lte/lt), `exists`, `match_all`. Anything else
  * refuses LOUDLY with the supported list named — a silently-dropped
  * clause would return wrong hits, the worst failure mode a query
  * language can have.
  *
  * Scoring: query-context clauses (must, should) sum their
  * contributions — [[Search.bm25ScoreOf]], the ONE score expression
  * the scan and index paths share, so a DSL `match` ranks
  * bit-identically to [[Search.bm25TopK]]. Filter-context clauses
  * (filter, must_not) gate matching with no score — ES's own
  * filter-context contract. A `should` beside a `must` is optional
  * (minimum_should_match defaults 0) but still adds score when it
  * hits; alone it defaults to minimum_should_match 1 — both ES
  * defaults.
  *
  * The ORACLE IS GENERATED FROM THE SAME AST ([[dslSql]]): one
  * recursion emits the Spark Column and the DuckDB SQL text in
  * lockstep, so predicate structure and floating-point ADDITION ORDER
  * are identical by construction — any supported DSL query is
  * oracle-checkable for free, not just the registered one.
  *
  * Shape at 100 TB: identical to [[Search.bm25ScoredOf]] — one corpus
  * scan projecting codegen'd per-term counts plus ONLY the fields the
  * query references (column pruning reaches the parquet scan), one
  * 1-row broadcast stats aggregate, top-k as TakeOrderedAndProject.
  * The filter-context predicates ride the same scan: a pure-filter
  * DSL query is a pushed-down parquet filter, nothing more. */
object Dsl {

  // ------------------------------------------------------------- AST

  sealed trait Node
  final case class BoolQ(must: Seq[Node], should: Seq[Node],
      mustNot: Seq[Node], filter: Seq[Node],
      minShould: Option[Int]) extends Node
  final case class MatchQ(field: String, terms: Seq[String]) extends Node
  final case class PhraseQ(field: String, terms: Seq[String]) extends Node
  final case class TermQ(field: String, value: Scalar) extends Node
  final case class TermsQ(field: String, values: Seq[Scalar]) extends Node
  final case class RangeQ(field: String, bounds: Seq[(String, Scalar)])
    extends Node
  final case class ExistsQ(field: String) extends Node
  case object MatchAllQ extends Node

  /** A JSON scalar a term/range clause compares against, carrying its
    * Spark literal and its SQL literal so both compilers emit the
    * same value. Whole numbers stay integral (a `10` in the JSON must
    * not become `10.0` in the SQL — integer comparisons hash-stably,
    * double formatting doesn't). */
  sealed trait Scalar { def column: Column; def sql: String }
  final case class SStr(v: String) extends Scalar {
    def column: Column = lit(v)
    def sql: String = s"'${v.replace("'", "''")}'"
  }
  final case class SNum(v: BigDecimal) extends Scalar {
    def column: Column =
      if (v.isWhole) lit(v.toLong) else lit(v.toDouble)
    def sql: String =
      if (v.isWhole) v.toBigInt.toString else v.underlying.toPlainString
  }
  final case class SBool(v: Boolean) extends Scalar {
    def column: Column = lit(v)
    def sql: String = v.toString
  }

  /** ES's default result size. */
  val DefaultSize = 10

  // ----------------------------------------------------------- parse

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"dsl: $msg")

  /** Parse an ES search body: `{"query": {...}, "size": n}`. */
  def parseQuery(json: String): (Node, Int) = {
    val root = JsonMethods.parse(json)
    val size = root \ "size" match {
      case JNothing => DefaultSize
      case JInt(n) if n > 0 => n.toInt
      case v => fail(s"size must be a positive integer, got $v")
    }
    root \ "query" match {
      case JNothing => fail("body has no \"query\"")
      case q => (node(q), size)
    }
  }

  /** The same normalization [[TextAnalysis.norm]]+tokenize applies to
    * documents — match text must analyze identically to the corpus or
    * 'Dup Vector' would never match 'dup vector'. */
  private def analyzed(s: String): Seq[String] =
    s.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  private def scalar(v: JValue): Scalar = v match {
    case JString(s) => SStr(s)
    case JInt(n) => SNum(BigDecimal(n))
    case JLong(n) => SNum(BigDecimal(n))
    case JDouble(d) => SNum(BigDecimal(d))
    case JDecimal(d) => SNum(d)
    case JBool(b) => SBool(b)
    case other => fail(s"expected a scalar value, got $other")
  }

  private def nodeSeq(v: JValue, ctx: String): Seq[Node] = v match {
    case JNothing => Seq.empty
    case JArray(items) => items.map(node)
    case single: JObject => Seq(node(single)) // ES allows bare object
    case other => fail(s"bool.$ctx must be an array of clauses, got $other")
  }

  /** One text argument: `{"match": {"text": "a b"}}` or the long form
    * `{"match": {"text": {"query": "a b"}}}`. */
  private def queryText(body: JValue, clause: String): (String, String) =
    body match {
      case JObject(List((field, JString(s)))) => (field, s)
      case JObject(List((field, o: JObject))) => o \ "query" match {
        case JString(s) => (field, s)
        case _ => fail(s"$clause.$field needs a \"query\" string")
      }
      case other => fail(s"$clause expects {field: text}, got $other")
    }

  private val RangeOps = Seq("gte", "gt", "lte", "lt")

  private def node(v: JValue): Node = v match {
    case JObject(List((name, body))) => name match {
      case "bool" =>
        val known = Set("must", "should", "must_not", "filter",
          "minimum_should_match")
        body match {
          case JObject(fields) =>
            fields.collectFirst {
              case (k, _) if !known.contains(k) => k
            }.foreach(k => fail(s"bool has unsupported section '$k' — " +
              s"supported: ${known.toSeq.sorted.mkString(", ")}"))
          case other => fail(s"bool expects an object, got $other")
        }
        val msm = body \ "minimum_should_match" match {
          case JNothing => None
          case JInt(n) => Some(n.toInt)
          case o => fail(s"minimum_should_match must be an integer, got $o")
        }
        BoolQ(nodeSeq(body \ "must", "must"),
          nodeSeq(body \ "should", "should"),
          nodeSeq(body \ "must_not", "must_not"),
          nodeSeq(body \ "filter", "filter"), msm)
      case "match" =>
        val (field, text) = queryText(body, "match")
        val terms = analyzed(text)
        if (terms.isEmpty) fail(s"match.$field has no terms after analysis")
        MatchQ(field, terms)
      case "match_phrase" =>
        val (field, text) = queryText(body, "match_phrase")
        val terms = analyzed(text)
        if (terms.isEmpty)
          fail(s"match_phrase.$field has no terms after analysis")
        PhraseQ(field, terms)
      case "term" => body match {
        case JObject(List((field, o: JObject))) => o \ "value" match {
          case JNothing => fail(s"term.$field needs a \"value\"")
          case value => TermQ(field, scalar(value))
        }
        case JObject(List((field, value))) => TermQ(field, scalar(value))
        case other => fail(s"term expects {field: value}, got $other")
      }
      case "terms" => body match {
        case JObject(List((field, JArray(values)))) =>
          if (values.isEmpty) fail(s"terms.$field has an empty value list")
          TermsQ(field, values.map(scalar))
        case other => fail(s"terms expects {field: [values]}, got $other")
      }
      case "range" => body match {
        case JObject(List((field, JObject(bounds)))) =>
          if (bounds.isEmpty) fail(s"range.$field has no bounds")
          bounds.collectFirst {
            case (op, _) if !RangeOps.contains(op) => op
          }.foreach(op => fail(s"range.$field has unsupported bound " +
            s"'$op' — supported: ${RangeOps.mkString(", ")}"))
          RangeQ(field, bounds.map { case (op, b) => (op, scalar(b)) })
        case other => fail(s"range expects {field: {gte/gt/lte/lt}}, got $other")
      }
      case "exists" => body \ "field" match {
        case JString(f) => ExistsQ(f)
        case _ => fail("exists needs {\"field\": name}")
      }
      case "match_all" => MatchAllQ
      case other => fail(s"unsupported query type '$other' — supported: " +
        "bool, match, match_phrase, term, terms, range, exists, match_all")
    }
    case JObject(fields) =>
      fail(s"a query clause must have exactly one key, got " +
        s"${fields.map(_._1).mkString(", ")}")
    case other => fail(s"a query clause must be an object, got $other")
  }

  // ------------------------------------------- clause/field inventory

  private def children(n: Node): Seq[Node] = n match {
    case BoolQ(m, s, mn, f, _) => m ++ s ++ mn ++ f
    case _ => Seq.empty
  }

  private def collect[A](n: Node)(pf: PartialFunction[Node, Seq[A]]): Seq[A] =
    pf.applyOrElse(n, (_: Node) => Seq.empty[A]) ++
      children(n).flatMap(collect(_)(pf))

  /** Distinct match terms in first-appearance order — the column
    * order of the feature frame, shared by both compilers. */
  private def matchTerms(n: Node): Seq[String] =
    collect(n) { case MatchQ(_, ts) => ts }.distinct

  private def phraseList(n: Node): Seq[Seq[String]] =
    collect(n) { case PhraseQ(_, ts) => Seq(ts) }.distinct

  /** Non-text fields the query references (term/terms/range/exists) —
    * ONLY these are projected, so column pruning reaches the scan. */
  private def exactFields(n: Node): Seq[String] = collect(n) {
    case TermQ(f, _) => Seq(f)
    case TermsQ(f, _) => Seq(f)
    case RangeQ(f, _) => Seq(f)
    case ExistsQ(f) => Seq(f)
  }.distinct

  /** Distinct `term` clauses — each needs a doc-frequency statistic,
    * because ES scores a term query on a keyword field as PURE IDF:
    * keyword fields index one token with norms off, so Lucene's BM25
    * tf part is (tf·(k1+1))/(tf+k1) = 2.2/2.2 = 1 and the clause's
    * query-context contribution is idf(df(value)) exactly. */
  private def termClauses(n: Node): Seq[(String, Scalar)] =
    collect(n) { case TermQ(f, v) => Seq((f, v)) }.distinct

  // ----------------------------------------------------- compilation

  /** Both compilers' output, emitted by ONE recursion so the Spark
    * plan and the oracle SQL agree on predicate structure and on
    * floating-point addition order (double + is not associative — a
    * reordered sum is a hash mismatch waiting to happen). `score` is
    * None for filter-context-only clauses. */
  private case class C(pred: Column, predSql: String,
      score: Option[(Column, String)])

  private def termScoreSql(tf: String, df: String): String = {
    val avgdl = "(CAST(s.sumdl AS DOUBLE) / CAST(s.n AS DOUBLE))"
    val t = s"CAST(f.$tf AS DOUBLE)"
    s"(ln(1.0 + (CAST(s.n - s.$df AS DOUBLE) + 0.5) / " +
      s"(CAST(s.$df AS DOUBLE) + 0.5)) * (($t * 2.2) / " +
      s"($t + 1.2 * (0.25 + 0.75 * (CAST(f.dl AS DOUBLE) / $avgdl)))))"
  }

  /** The keyword idf — same literal shape as [[Search.bm25ScoreOf]]'s
    * idf factor, tf part elided (≡ 1 on a norms-off keyword field). */
  private def keywordIdfOf(i: Int): (Column, String) =
    (log(lit(1.0) +
      ((col("n") - col(s"qkd$i")).cast("double") + lit(0.5)) /
      (col(s"qkd$i").cast("double") + lit(0.5))),
      s"ln(1.0 + (CAST(s.n - s.qkd$i AS DOUBLE) + 0.5) / " +
        s"(CAST(s.qkd$i AS DOUBLE) + 0.5))")

  private def sumScores(parts: Seq[(Column, String)]): (Column, String) =
    (parts.map(_._1).reduce(_ + _),
      parts.map(_._2).mkString("(", "\n   + ", ")"))

  private def compile(n: Node, tfIdx: Map[String, Int],
      pfIdx: Map[Seq[String], Int], ktIdx: Map[(String, Scalar), Int],
      textField: String): C = n match {
    case MatchQ(field, terms) =>
      if (field != textField)
        fail(s"match.$field: the corpus has one analyzed text field " +
          s"('$textField'); index-served multi-field queries are " +
          "Search.bm25Multifield's business")
      val parts = terms.map { t =>
        val i = tfIdx(t)
        (Search.bm25ScoreOf(1, _ => col(s"qtf$i"), _ => col(s"qdf$i"),
          col("dl"), col("sumdl"), col("n")),
          termScoreSql(s"qtf$i", s"qdf$i"))
      }
      val pred = terms.map(t => col(s"qtf${tfIdx(t)}") > 0).reduce(_ || _)
      val predSql = terms.map(t => s"f.qtf${tfIdx(t)} > 0")
        .mkString("(", " OR ", ")")
      C(pred, predSql, Some(sumScores(parts)))
    case PhraseQ(field, terms) =>
      if (field != textField)
        fail(s"match_phrase.$field: the corpus has one analyzed text " +
          s"field ('$textField')")
      val i = pfIdx(terms)
      C(col(s"qpf$i") > 0, s"f.qpf$i > 0",
        Some((Search.bm25ScoreOf(1, _ => col(s"qpf$i"), _ => col(s"qpd$i"),
          col("dl"), col("sumdl"), col("n")),
          termScoreSql(s"qpf$i", s"qpd$i"))))
    case TermQ(field, v) =>
      // query-context score = idf of the value's doc frequency (the
      // exact ES/Lucene number for a norms-off keyword field — see
      // [[termClauses]]); bool ignores it in filter/must_not context
      C(col(field) === v.column, s"f.$field = ${v.sql}",
        Some(keywordIdfOf(ktIdx((field, v)))))
    case TermsQ(field, vs) =>
      // OR-of-equalities rather than isin(): the two are equivalent
      // and this mirrors the SQL text exactly, clause for clause
      C(vs.map(v => col(field) === v.column).reduce(_ || _),
        vs.map(v => s"f.$field = ${v.sql}").mkString("(", " OR ", ")"),
        None)
    case RangeQ(field, bounds) =>
      val (preds, sqls) = bounds.map {
        case ("gte", v) => (col(field) >= v.column, s"f.$field >= ${v.sql}")
        case ("gt", v) => (col(field) > v.column, s"f.$field > ${v.sql}")
        case ("lte", v) => (col(field) <= v.column, s"f.$field <= ${v.sql}")
        case ("lt", v) => (col(field) < v.column, s"f.$field < ${v.sql}")
        case (op, _) => fail(s"range bound $op") // unreachable post-parse
      }.unzip
      C(preds.reduce(_ && _), sqls.mkString("(", " AND ", ")"), None)
    case ExistsQ(field) =>
      C(col(field).isNotNull, s"f.$field IS NOT NULL", None)
    case MatchAllQ => C(lit(true), "TRUE", None)
    case BoolQ(must, should, mustNot, filterCtx, minShould) =>
      val mc = must.map(compile(_, tfIdx, pfIdx, ktIdx, textField))
      val sc = should.map(compile(_, tfIdx, pfIdx, ktIdx, textField))
      val nc = mustNot.map(compile(_, tfIdx, pfIdx, ktIdx, textField))
      val fc = filterCtx.map(compile(_, tfIdx, pfIdx, ktIdx, textField))
      // ES defaults: a should beside a must/filter is optional scoring
      // (msm 0); alone it is the only matching condition (msm 1)
      val msm = minShould.getOrElse(
        if (must.nonEmpty || filterCtx.nonEmpty) 0 else 1)
      val shouldGate: Option[(Column, String)] =
        if (sc.isEmpty || msm <= 0) None
        else Some((
          sc.map(c => when(c.pred, 1).otherwise(0)).reduce(_ + _) >= msm,
          sc.map(c => s"CASE WHEN ${c.predSql} THEN 1 ELSE 0 END")
            .mkString("(", " + ", s") >= $msm")))
      val preds = mc.map(c => (c.pred, c.predSql)) ++
        fc.map(c => (c.pred, c.predSql)) ++
        nc.map(c => (!c.pred, s"NOT ${c.predSql}")) ++ shouldGate
      val (pred, predSql) =
        if (preds.isEmpty) (lit(true), "TRUE")
        else (preds.map(_._1).reduce(_ && _),
          preds.map(_._2).mkString("(", " AND ", ")"))
      // query context scores: must scores always count (the doc
      // matched), should scores count only when their clause matched
      val scores = mc.flatMap(_.score) ++ sc.flatMap(c =>
        c.score.map { case (s, sql) =>
          (when(c.pred, s).otherwise(lit(0.0)),
            s"CASE WHEN ${c.predSql} THEN $sql ELSE 0.0 END")
        })
      C(pred, predSql,
        if (scores.isEmpty) None else Some(sumScores(scores)))
  }

  // -------------------------------------------------- engine serving

  /** Compile and run a DSL search over a documents frame. Emits the
    * engine's rank-plus-integer-provenance shape — (rk, doc_id,
    * n_matched, tf_total, dl), the [[Search.bm25TopK]] convention (the
    * double score stays internal; see Search's class doc). */
  def searchDslOf(docs: DataFrame, json: String): DataFrame = {
    import docs.sparkSession.implicits._
    val (q, k) = parseQuery(json)
    val terms = matchTerms(q)
    val phrases = phraseList(q)
    val fields = exactFields(q)
    fields.foreach { f =>
      if (!docs.columns.contains(f))
        fail(s"field '$f' is not in the corpus schema " +
          s"(${docs.columns.mkString(", ")})")
    }
    val tfIdx = terms.zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap
    val pfIdx = phrases.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
    val kts = termClauses(q)
    val ktIdx = kts.zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap
    val nt = TextAnalysis.norm($"text")
    val tfCols = terms.map(t =>
      TextAnalysis.hitCount(nt, Seq(t)).as(s"qtf${tfIdx(t)}"))
    val pfCols = phrases.map(p =>
      TextAnalysis.hitCount(nt, Seq(p.mkString(" "))).as(s"qpf${pfIdx(p)}"))
    val passthrough = fields.filter(_ != "doc_id").map(col)
    val f = docs.select(($"doc_id" +: passthrough) ++
      (size(TextAnalysis.toks($"text")).cast("long").as("dl") +:
        (tfCols ++ pfCols)): _*)
    val statCols =
      Seq(count(lit(1)).as("n"), sum($"dl").as("sumdl")) ++
        terms.map(t => count(when(col(s"qtf${tfIdx(t)}") > 0, 1))
          .as(s"qdf${tfIdx(t)}")) ++
        phrases.map(p => count(when(col(s"qpf${pfIdx(p)}") > 0, 1))
          .as(s"qpd${pfIdx(p)}")) ++
        kts.map { case kt @ (fld, v) =>
          count(when(col(fld) === v.column, 1)).as(s"qkd${ktIdx(kt)}")
        }
    val stats = f.agg(statCols.head, statCols.tail: _*)
    val c = compile(q, tfIdx, pfIdx, ktIdx, DslTextField)
    val score = c.score.map(_._1).getOrElse(lit(0.0))
    val nMatched =
      if (terms.isEmpty) lit(0)
      else terms.map(t => when(col(s"qtf${tfIdx(t)}") > 0, 1).otherwise(0))
        .reduce(_ + _)
    val tfTotal =
      if (terms.isEmpty) lit(0L)
      else terms.map(t => col(s"qtf${tfIdx(t)}").cast("long")).reduce(_ + _)
    val w = Window.orderBy($"score".desc, $"doc_id")
    f.crossJoin(broadcast(stats))
      .filter(c.pred)
      .select($"doc_id", $"dl", nMatched.as("n_matched"),
        tfTotal.as("tf_total"), score.as("score"))
      .orderBy($"score".desc, $"doc_id").limit(k)
      .withColumn("rk", row_number().over(w))
      .select($"rk", $"doc_id", $"n_matched", $"tf_total", $"dl")
      .orderBy($"rk")
  }

  /** The corpus's one analyzed text field — [[Search.DefaultField]]. */
  val DslTextField: String = Search.DefaultField

  // ------------------------------------------------- oracle generator

  /** DuckDB SQL for the same DSL query — generated from the same AST
    * by the same recursion, so any supported query is oracle-checked,
    * not just the registered one. */
  def dslSql(json: String): String = {
    val (q, k) = parseQuery(json)
    val terms = matchTerms(q)
    val phrases = phraseList(q)
    val fields = exactFields(q)
    val tfIdx = terms.zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap
    val pfIdx = phrases.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
    val kts = termClauses(q)
    val ktIdx = kts.zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap
    val tfDefs = terms.map(t =>
      s"len(list_filter(toks, x -> x = '${t.replace("'", "''")}')) " +
        s"AS qtf${tfIdx(t)}")
    val pfDefs = phrases.map { p =>
      val conds = p.zipWithIndex.map { case (w, j) =>
        s"toks[i + $j] = '${w.replace("'", "''")}'"
      }.mkString(" AND ")
      s"len(list_filter(range(1, len(toks) - ${p.length - 2}), " +
        s"i -> $conds)) AS qpf${pfIdx(p)}"
    }
    val fieldDefs = fields.filter(_ != "doc_id")
    val dfDefs =
      terms.map(t => s"COUNT(*) FILTER (WHERE qtf${tfIdx(t)} > 0) " +
        s"AS qdf${tfIdx(t)}") ++
      phrases.map(p => s"COUNT(*) FILTER (WHERE qpf${pfIdx(p)} > 0) " +
        s"AS qpd${pfIdx(p)}") ++
      kts.map { case kt @ (fld, v) =>
        s"COUNT(*) FILTER (WHERE $fld = ${v.sql}) AS qkd${ktIdx(kt)}"
      }
    val c = compile(q, tfIdx, pfIdx, ktIdx, DslTextField)
    val scoreSql = c.score.map(_._2).getOrElse("0.0")
    val nMatched =
      if (terms.isEmpty) "0"
      else terms.map(t => s"CASE WHEN f.qtf${tfIdx(t)} > 0 THEN 1 ELSE 0 END")
        .mkString(" + ")
    val tfTotal =
      if (terms.isEmpty) "CAST(0 AS BIGINT)"
      else terms.map(t => s"CAST(f.qtf${tfIdx(t)} AS BIGINT)")
        .mkString(" + ")
    val fCols = (Seq("doc_id") ++ fieldDefs ++ Seq("len(toks) AS dl") ++
      tfDefs ++ pfDefs).mkString(",\n    ")
    val sCols = (Seq("COUNT(*) AS n", "SUM(dl) AS sumdl") ++ dfDefs)
      .mkString(", ")
    s"""WITH f AS (
       |  SELECT $fCols
       |  FROM (SELECT *,
       |          string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |        FROM documents)),
       |s AS (SELECT $sCols FROM f),
       |sc AS (
       |  SELECT f.doc_id, f.dl, $nMatched AS n_matched, $tfTotal AS tf_total,
       |    $scoreSql AS score
       |  FROM f CROSS JOIN s
       |  WHERE ${c.predSql})
       |SELECT ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk,
       |  doc_id, n_matched, tf_total, dl
       |FROM sc ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  // --------------------------------------------------- registered form

  /** The registered DSL search: every clause family in one body —
    * scored must-match over the [[Search.QueryTerms]] text, an
    * optional scored should-match plus a keyword should (hits add
    * BM25 / idf score, gate nothing — msm 0 beside a must), a phrase
    * must_not, and filter-context range + exists. */
  val DslQuery: String =
    """{"query": {"bool": {
      |  "must":     [{"match": {"text": "dup vector merge"}}],
      |  "should":   [{"match": {"text": "hash"}},
      |               {"term":  {"lang": "en"}}],
      |  "must_not": [{"match_phrase": {"text": "slow scan"}}],
      |  "filter":   [{"range": {"n_chars": {"gte": 60, "lt": 520}}},
      |               {"exists": {"field": "source"}}]
      |}}, "size": 50}""".stripMargin

  def searchDsl(spark: SparkSession, dir: String): DataFrame =
    searchDslOf(Tables.documentsPar(spark, dir), DslQuery)

  val searchDslSql: String = dslSql(DslQuery)
}
