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
  * Scale design (100 TB):
  * - exact dedup: one hash-partitioned aggregate on the digest — the
  *   partial/final agg shuffles one (digest, id) pair per row, never text.
  * - minhash/LSH: signatures are a narrow per-row projection; candidate
  *   generation joins on (band, key) buckets — the classic banding trick
  *   keeps it at O(Σ bucket²) instead of O(n²). Hot buckets (boilerplate
  *   docs) would need a bucket-size cap at real scale; noted inline.
  * - nothing collects to the driver; no crossJoin anywhere.
  */
object Dedup {

  /** Normalized text: lower, trim, whitespace collapsed — the canonical
    * form hashed for exact dedup (matches common LLM-corpus practice). */
  private def norm(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  private def toks(c: Column): Column = split(norm(c), " ")

  /** Distinct word-2-gram shingles. 2-grams (not the usual 3–5) because
    * the fixture's 31-word vocabulary makes 3-gram sets nearly disjoint
    * and 1-gram sets nearly identical; the mechanism is n-independent.
    * Docs with < 2 tokens shingle to the empty set (null minhash). */
  private def shingles(c: Column): Column = {
    val t = toks(c)
    when(size(t) >= 2,
      array_distinct(transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1)))))
      .otherwise(array().cast("array<string>"))
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

  /** minhash_j(doc) = min over the doc's shingle set of
    * md5(j ':' shingle) — lexicographic min over hex strings. */
  private def minhashCols: Seq[Column] =
    (0 until NumHashes).map { j =>
      array_min(transform(shingles(col("text")),
        t => md5(concat(lit(s"$j:"), t)))).as(s"mh$j")
    }

  /** Per-document minhash signature (one row per doc, NumHashes columns).
    * Narrow projection — no shuffle; signatures are what you'd persist
    * next to the corpus at scale. */
  def minhashSig(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id") +: minhashCols: _*)
      .orderBy($"doc_id")
  }

  private def minhashSqlExprs: Seq[String] =
    (0 until NumHashes).map { j =>
      s"list_aggregate(list_transform(toks, t -> md5('$j:' || t)), 'min') AS mh$j"
    }

  val minhashSigSql: String =
    s"""SELECT doc_id, ${minhashSqlExprs.mkString(",\n       ")}
       |FROM (SELECT doc_id,
       |        list_distinct(list_transform(range(1, len(toks0)), i -> toks0[i] || ' ' || toks0[i + 1])) AS toks
       |      FROM (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks0
       |            FROM documents))
       |ORDER BY doc_id""".stripMargin

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
    val sig = Tables.documents(spark, dir)
      .select(col("doc_id") +: minhashCols: _*)
    val buckets = sig.select($"doc_id", explode(array(bands: _*)).as("bk"))
      .select($"doc_id", $"bk.band", $"bk.key")
    buckets.as("a")
      .join(buckets.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .distinct()
      .orderBy($"id_a", $"id_b")
  }

  /** The DuckDB band-bucket expression: one struct per band, exploded via
    * UNNEST in the select list (DuckDB's lateral-unnest form). */
  private def duckBands: String =
    (0 until NumHashes / 2)
      .map(b => s"{band: ${b}, key: md5(mh${2 * b} || '|' || mh${2 * b + 1})}")
      .mkString(", ")

  val lshPairsSql: String =
    s"""WITH sig AS (
       |  SELECT doc_id, ${minhashSqlExprs.mkString(", ")}
       |  FROM (SELECT doc_id,
       |          list_distinct(list_transform(range(1, len(toks0)), i -> toks0[i] || ' ' || toks0[i + 1])) AS toks
       |        FROM (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks0
       |              FROM documents))),
       |buckets0 AS (SELECT doc_id, UNNEST([$duckBands]) AS bk FROM sig),
       |buckets AS (SELECT doc_id, bk.band AS band, bk.key AS key FROM buckets0)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |FROM buckets a JOIN buckets b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |ORDER BY id_a, id_b""".stripMargin

  /** Candidate verification: exact token-set jaccard for the
    * LSH candidate pairs, thresholded at 0.1 (2-gram jaccard tops out ~0.2 in the fixture). |A∩B| and |A∪B| are exact ints so
    * the double ratio is bit-identical across engines. The join fetches
    * each candidate's token set by key — broadcast-able when the
    * candidate list is small, shuffle-join otherwise. */
  def dedupJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", shingles($"text").as("tokset"))
    val pairs = lshPairs(spark, dir)
    pairs
      .join(docs.withColumnRenamed("doc_id", "id_a").withColumnRenamed("tokset", "set_a"), "id_a")
      .join(docs.withColumnRenamed("doc_id", "id_b").withColumnRenamed("tokset", "set_b"), "id_b")
      .withColumn("inter", size(array_intersect($"set_a", $"set_b")))
      .withColumn("uni", size(array_union($"set_a", $"set_b")))
      .withColumn("jaccard", $"inter".cast("double") / $"uni".cast("double"))
      .filter($"jaccard" >= 0.1)
      .select($"id_a", $"id_b", $"jaccard")
      .orderBy($"id_a", $"id_b")
  }

  val dedupJaccardSql: String =
    s"""WITH sig AS (
       |  SELECT doc_id, ${minhashSqlExprs.mkString(", ")}, toks
       |  FROM (SELECT doc_id,
       |          list_distinct(list_transform(range(1, len(toks0)), i -> toks0[i] || ' ' || toks0[i + 1])) AS toks
       |        FROM (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks0
       |              FROM documents))),
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

  /** Per-doc 16-bit simhash. Near-dup lookup at scale = group by simhash
    * (or by simhash with one band of bits masked, for 1-bit tolerance). */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ts = array_distinct(toks($"text"))
    val bitCols = (0 until SimHashBits).map { j =>
      // vote: top bit of the first hex nibble (chars 8..f)
      val votes = transform(ts, t =>
        when(substring(md5(concat(lit(s"$j:"), t)), 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"),
          lit(1)).otherwise(lit(-1)))
      when(aggregate(votes, lit(0), (acc, x) => acc + x) > 0, lit(1L << j)).otherwise(lit(0L))
    }
    Tables.documents(spark, dir)
      .select($"doc_id", bitCols.reduce(_ + _).as("simhash"))
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
}
