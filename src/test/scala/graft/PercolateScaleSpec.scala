package graft

import graft.ops.Search

/** Registry-scale stress for the join-form percolator: the production
  * shape is thousands of authored alert rules against every arriving
  * document, and the correctness of percolateWithRegistry's two load-
  * bearing moves — the (doc, tok)-DISTINCT projection (a token repeated
  * in a doc must count once toward presence) and the COUNT-EQUALITY
  * arity gate (a rule fires only when every distinct term is present) —
  * must hold when the registry is 10⁴ rules, not the 5-row demo set.
  * The expected match set is recomputed driver-side with plain Scala
  * set algebra, so the assertion is independent of every Spark
  * operator under test. */
class PercolateScaleSpec extends SparkSpec {

  import spark.implicits._

  private val Vocab = (0 until 100).map(i => f"v$i%02d")

  /** 10⁴ rules: even ids one-term, odd ids two-term conjunctions —
    * both arities exercised at scale; term choice is deterministic
    * modular arithmetic so the expected set replays exactly. */
  private val NRules = 10000
  private lazy val rules: Seq[(Long, Seq[String])] =
    (0 until NRules).map { i =>
      val a = Vocab(i % 100)
      val b = Vocab((i * 7 + 3) % 100)
      // a == b is possible under the modular pick: keep it — a rule
      // authored with a duplicated term must behave as its distinct
      // set (the array_distinct discipline under test)
      (i.toLong, if (i % 2 == 0) Seq(a) else Seq(a, b))
    }

  /** 2000 docs × 8 tokens, with REPEATED tokens inside each doc (the
    * distinct-projection hazard: tf > 1 must not double-count toward
    * a 2-term rule's arity gate). */
  private val NDocs = 2000
  private lazy val docs: Seq[(Long, String)] =
    (0 until NDocs).map { d =>
      val toks = (0 until 8).map(j => Vocab((d * 13 + j * j) % 100))
      // duplicate the first token so every doc carries a tf=2 term
      (d.toLong, (toks.head +: toks).mkString(" "))
    }

  test("10⁴-rule registry: join-form matches the driver-side reference exactly") {
    val docDf = docs.toDF("doc_id", "text")
    val regDf = rules.toDF("query_id", "terms")
    val got = Search.percolateWithRegistry(docDf, regDf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docToks: Map[Long, Set[String]] =
      docs.map { case (id, t) => id -> t.split(" ").toSet }.toMap
    val expected = (for {
      (qid, ts) <- rules
      tset = ts.toSet
      (did, dset) <- docToks
      if tset.subsetOf(dset)
    } yield (did, qid)).toSet
    assert(expected.nonEmpty && expected.size < NDocs.toLong * NRules,
      s"stress preconditions: selective but non-empty (got ${expected.size})")
    assert(got == expected,
      s"registry percolation diverged at scale: " +
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("the arity gate counts distinct presence, not tf, at scale") {
    // one doc where a two-term rule's FIRST term appears 5 times and
    // the second never: tf-summing would fire the rule, distinct
    // presence must not
    val doc = Seq((0L, Seq.fill(5)(Vocab(1)).mkString(" "))).toDF("doc_id", "text")
    val reg = Seq((1L, Seq(Vocab(1), Vocab(2)))).toDF("query_id", "terms")
    assert(Search.percolateWithRegistry(doc, reg).isEmpty,
      "a rule must not fire on repeated hits of one term")
    // and a rule whose authored terms repeat must fire on one presence
    val reg2 = Seq((2L, Seq(Vocab(1), Vocab(1)))).toDF("query_id", "terms")
    val hit = Search.percolateWithRegistry(doc, reg2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hit == Set((0L, 2L)),
      "a duplicated-term rule is its distinct set (arity 1)")
  }
}
