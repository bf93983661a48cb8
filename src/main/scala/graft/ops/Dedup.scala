package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines over the
  * `documents` fixture — the north-star extension surface (SURVEY §7.2.5).
  *
  * All hash functions are md5 hex strings so the DuckDB oracle computes
  * bit-identical values (Spark's xxhash64/murmur and DuckDB's hash() are
  * engine-specific; md5 is standardized). Minima over hex strings are
  * lexicographic — a valid uniform order for minhash purposes.
  *
  * Execution shape (this matters at any scale, and 40× at 100 TB): the
  * shingle set is EXPLODED to (doc_id, shingle) rows once, and every
  * hash is computed in a codegen'd projection over those rows, then
  * reduced with a map-side-combining min/sum aggregate keyed by doc_id.
  * The tempting alternative — per-doc array lambdas
  * (`transform(shingles, md5)` × NumHashes) — evaluates interpreted,
  * re-evaluates the shingle pipeline per hash column, and benched 40×
  * slower at sf0.1. Explode + partial agg is also exactly the shape that
  * distributes: shuffle carries only (doc_id, min-digest) pairs.
  *
  * Scale notes:
  * - exact dedup: one hash-partitioned aggregate on the digest; shuffles
  *   one (digest, id) pair per row, never text.
  * - LSH candidates: self-equi-join on (band, key) buckets — O(Σ bucket²)
  *   instead of O(n²); at real scale cap bucket size (boilerplate docs)
  *   before the join.
  * - nothing collects to the driver; no crossJoin anywhere.
  */
object Dedup {

  /** Normalized text: lower, trim, whitespace collapsed — the canonical
    * form hashed for exact dedup (matches common LLM-corpus practice). */
  private def norm(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  private def toks(c: Column): Column = split(norm(c), " ")

  /** Distinct word-2-gram shingles, built argument-position-only (zip of
    * the token array with its shift) so each base expression evaluates
    * once per row. 2-grams (not the usual 3–5) because the fixture's
    * 31-word vocabulary makes 3-gram sets nearly disjoint and 1-gram sets
    * nearly identical; the mechanism is n-independent. Docs with < 2
    * tokens shingle to the empty set. */
  private def shingles(c: Column): Column = {
    val t = toks(c)
    array_distinct(array_compact(
      zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (x, y) => concat(x, lit(" "), y))))
  }

  /** Exploded (doc_id, sh) rows — the hot-path layout (see class doc).
    * explode_outer keeps shingle-less docs as a null row so their
    * signature aggregates to null rather than the doc vanishing. */
  private def shingleRows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", explode_outer(shingles($"text")).as("sh"))
  }

  /** Exact dedup: normalize → digest → keep the smallest doc_id per
    * digest. Output is the per-digest group (keeper + multiplicity) so
    * the oracle can check group structure, not just survivor count. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", md5(norm($"text")).as("digest"))
      .groupBy($"digest")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keep_id")
  }

  val dedupExactSql: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS digest,
      |       MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Number of minhash functions; banded into pairs for LSH. */
  val NumHashes = 8

  /** Signature aggregate: min over the exploded shingle rows of the
    * first 60 bits of md5(j ':' shingle) as a long — codegen'd md5,
    * map-side-combined min. Longs (not hex strings) on purpose: a
    * primitive agg buffer keeps this a HashAggregate; min(string) would
    * fall back to SortAggregate and sort every exploded row. Truncating
    * the digest to 15 hex chars preserves lexicographic = numeric order
    * and loses nothing for minhash purposes. */
  private def sig(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mhAggs = (0 until NumHashes).map { j =>
      min(conv(substring(md5(concat(lit(s"$j:"), col("sh"))), 1, 15), 16, 10)
        .cast("long")).as(s"mh$j")
    }
    shingleRows(spark, dir).groupBy($"doc_id").agg(mhAggs.head, mhAggs.tail: _*)
  }

  /** Per-document minhash signature (one row per doc, NumHashes columns):
    * what you'd persist next to the corpus at scale. */
  def minhashSig(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sig(spark, dir).orderBy($"doc_id")
  }

  private def minhashSqlExprs: Seq[String] =
    (0 until NumHashes).map { j =>
      s"list_aggregate(list_transform(toks, t -> ('0x' || substr(md5('$j:' || t), 1, 15))::BIGINT), 'min') AS mh$j"
    }

  /** Shared DuckDB CTE text: (doc_id, toks = distinct 2-gram shingles). */
  private val duckShingleFrom: String =
    """FROM (SELECT doc_id,
      |          list_distinct(list_transform(range(1, len(toks0)), i -> toks0[i] || ' ' || toks0[i + 1])) AS toks
      |        FROM (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks0
      |              FROM documents))""".stripMargin

  val minhashSigSql: String =
    s"""SELECT doc_id, ${minhashSqlExprs.mkString(",\n       ")}
       |$duckShingleFrom
       |ORDER BY doc_id""".stripMargin

  /** The DuckDB band-bucket expression: one struct per band, exploded via
    * UNNEST in the select list (DuckDB's lateral-unnest form). */
  private def duckBands: String =
    (0 until NumHashes / 2)
      .map(b => s"{band: ${b}, key: md5(mh${2 * b} || '|' || mh${2 * b + 1})}")
      .mkString(", ")

  /** LSH candidate pairs: band the signature into NumHashes/2 bands of 2
    * rows; docs sharing any band key are candidates. Self-equi-join on
    * (band, key) — shuffles only (band, key, doc_id) triples. At real
    * scale add a bucket-size cap (skip buckets with > ~1000 members:
    * boilerplate) before the join; unnecessary for the fixture. */
  def lshPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = (0 until NumHashes / 2).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))).as("key"))
    }
    val buckets = sig(spark, dir)
      .select($"doc_id", explode(array(bands: _*)).as("bk"))
      .select($"doc_id", $"bk.band", $"bk.key")
    buckets.as("a")
      .join(buckets.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .distinct()
      .orderBy($"id_a", $"id_b")
  }

  val lshPairsSql: String =
    s"""WITH sig AS (
       |  SELECT doc_id, ${minhashSqlExprs.mkString(", ")}
       |  $duckShingleFrom),
       |buckets0 AS (SELECT doc_id, UNNEST([$duckBands]) AS bk FROM sig),
       |buckets AS (SELECT doc_id, bk.band AS band, bk.key AS key FROM buckets0)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |FROM buckets a JOIN buckets b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |ORDER BY id_a, id_b""".stripMargin

  /** Candidate verification: exact 2-gram-shingle jaccard for the LSH
    * candidate pairs, thresholded at 0.1 (2-gram jaccard tops out ~0.2 in
    * the fixture). |A∩B| and |A∪B| are exact ints so the double ratio is
    * bit-identical across engines. Shingle sets are rebuilt per keeper
    * from the exploded rows (sorted for determinism) and joined to the
    * candidate list — broadcast-able when candidates are few. */
  def dedupJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // One pass builds signatures AND shingle sets, persisted — the DAG
    // consumes it four times (bucket self-join sides + both set lookups);
    // at corpus scale this is the signature table you'd materialize
    // anyway. A few MB here; spill-safe via MEMORY_AND_DISK.
    val mhAggs = (0 until NumHashes).map { j =>
      min(conv(substring(md5(concat(lit(s"$j:"), col("sh"))), 1, 15), 16, 10)
        .cast("long")).as(s"mh$j")
    }
    val sigSets = shingleRows(spark, dir).filter($"sh".isNotNull)
      .groupBy($"doc_id")
      .agg(mhAggs.head, (mhAggs.tail :+ collect_set($"sh").as("tokset")): _*)
      .withColumn("n", size($"tokset"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = (0 until NumHashes / 2).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))).as("key"))
    }
    val buckets = sigSets.select($"doc_id", explode(array(bands: _*)).as("bk"))
      .select($"doc_id", $"bk.band", $"bk.key")
    val pairs = buckets.as("a")
      .join(buckets.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .distinct()
    val sets = sigSets.select($"doc_id", $"tokset", $"n")
    pairs
      .join(sets.select($"doc_id".as("id_a"), $"tokset".as("set_a"), $"n".as("n_a")), "id_a")
      .join(sets.select($"doc_id".as("id_b"), $"tokset".as("set_b"), $"n".as("n_b")), "id_b")
      .withColumn("inter", size(array_intersect($"set_a", $"set_b")))
      // |A∪B| = |A|+|B|-|A∩B|: avoids materializing the union array per pair
      .withColumn("uni", $"n_a" + $"n_b" - $"inter")
      .withColumn("jaccard", $"inter".cast("double") / $"uni".cast("double"))
      .filter($"jaccard" >= 0.1)
      .select($"id_a", $"id_b", $"jaccard")
      .orderBy($"id_a", $"id_b")
  }

  val dedupJaccardSql: String =
    s"""WITH sig AS (
       |  SELECT doc_id, ${minhashSqlExprs.mkString(", ")}, toks
       |  $duckShingleFrom),
       |buckets0 AS (SELECT doc_id, UNNEST([$duckBands]) AS bk FROM sig),
       |buckets AS (SELECT doc_id, bk.band AS band, bk.key AS key FROM buckets0),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM buckets a JOIN buckets b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b,
       |  CAST(len(list_intersect(sa.toks, sb.toks)) AS DOUBLE) /
       |  CAST(len(list_distinct(list_concat(sa.toks, sb.toks))) AS DOUBLE) AS jaccard
       |FROM pairs
       |JOIN sig sa ON sa.doc_id = id_a
       |JOIN sig sb ON sb.doc_id = id_b
       |WHERE CAST(len(list_intersect(sa.toks, sb.toks)) AS DOUBLE) /
       |      CAST(len(list_distinct(list_concat(sa.toks, sb.toks))) AS DOUBLE) >= 0.1
       |ORDER BY id_a, id_b""".stripMargin

  /** SimHash bits (16). bit_j votes +1/-1 per distinct token by the top
    * bit of md5(j ':' token); the doc's bit is 1 iff the vote sum is
    * positive. Integer votes — no FP, bit-identical across engines. */
  val SimHashBits = 16

  /** Per-doc 16-bit simhash, via exploded distinct-token rows (codegen'd
    * md5 + map-side-combined sums; see class doc). Near-dup lookup at
    * scale = group by simhash (or by simhash with one band of bits
    * masked, for 1-bit tolerance). */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tokRows = Tables.documents(spark, dir)
      .select($"doc_id", explode_outer(array_distinct(toks($"text"))).as("tok"))
    val voteAggs = (0 until SimHashBits).map { j =>
      sum(when($"tok".isNull, lit(null)).otherwise(
        when(substring(md5(concat(lit(s"$j:"), $"tok")), 1, 1)
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)))
        .as(s"v$j")
    }
    val bitSum = (0 until SimHashBits)
      .map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    tokRows.groupBy($"doc_id").agg(voteAggs.head, voteAggs.tail: _*)
      .select($"doc_id", bitSum.as("simhash"))
      .orderBy($"doc_id")
  }

  val dedupSimhashSql: String = {
    val bitExprs = (0 until SimHashBits).map { j =>
      s"""CASE WHEN list_sum(list_transform(toks, t ->
         |  CASE WHEN strpos('89abcdef', substr(md5('$j:' || t), 1, 1)) > 0 THEN 1 ELSE -1 END)) > 0
         |  THEN ${1L << j} ELSE 0 END""".stripMargin
    }
    s"""SELECT doc_id, CAST(${bitExprs.mkString(" + ")} AS BIGINT) AS simhash
       |FROM (SELECT doc_id,
       |        list_distinct(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS toks
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** Duplicate clusters: connected components over the jaccard-verified
    * pair graph via iterative min-label propagation — the final step of
    * LSH dedup (each transitive group keeps cluster_id = its smallest
    * doc_id; survivors = one doc per cluster). Converges in
    * O(component diameter) rounds; near-dup components are tiny, and the
    * iteration is bounded as a backstop. The per-round action is the
    * fixpoint check every iterative Spark algorithm needs (GraphX-style);
    * localCheckpoint truncates lineage so round N's plan doesn't replay
    * rounds 1..N-1. Oracle: recursive-CTE transitive closure in DuckDB.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = dedupJaccard(spark, dir).select($"id_a", $"id_b")
    val edges = pairs.union(pairs.select($"id_b", $"id_a"))
      .toDF("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select($"src".as("id")).distinct()
      .withColumn("label", $"id")
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < 20) {
      val prop = edges
        .join(labels.select($"id".as("src"), $"label".as("srcLabel")), "src")
        .groupBy($"dst".as("id")).agg(min($"srcLabel").as("nbrMin"))
      val next = labels.join(prop, Seq("id"), "left")
        .select($"id", least($"label", coalesce($"nbrMin", $"label")).as("label"))
        .localCheckpoint()
      val changed = next.join(labels.select($"id", $"label".as("old")), "id")
        .filter($"label" =!= $"old").count()
      labels = next
      converged = changed == 0
      i += 1
    }
    labels.select($"id".as("doc_id"), $"label".as("cluster_id"))
      .orderBy($"doc_id")
  }

  val dedupClustersSql: String = {
    val jacc = dedupJaccardSql.replace("ORDER BY id_a, id_b", "")
    s"""WITH RECURSIVE jp AS ($jacc),
       |edges AS (SELECT id_a AS a, id_b AS b FROM jp UNION SELECT id_b, id_a FROM jp),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       |SELECT a AS doc_id, least(a, min(b)) AS cluster_id
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin
  }
}
