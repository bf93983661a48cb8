package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sketching over `documents` — the streaming-friendly
  * approximate counters a 100 TB ingest pipeline keeps beside the
  * exact aggregates. [[cmsCounts]] is a count-min sketch (Cormode &
  * Muthukrishnan 2005, J. Algorithms 55(1)) with md5-derived hash
  * rows, the [[Select]] k60 convention — shared deterministic
  * randomness both engines rederive, so unlike a seeded-random
  * sketch the whole structure is oracle-checkable bit-for-bit.
  *
  * Why a CMS when the engine has exact vocab counts and HLL: the
  * exact count needs VOCAB-grain state (millions of keys at web
  * scale, one shuffle per refresh) while the CMS is a FIXED
  * [[CmsDepth]]×[[CmsWidth]] counter grid — mergeable across
  * partitions, batches, and days by plain addition, which is what a
  * streaming heavy-hitters monitor actually maintains. The
  * registered query materializes both and emits them side by side,
  * which is simultaneously the correctness proof (est ≥ exact
  * always, equality when a term's cells are collision-free) and the
  * calibration report (how much the 4×64 grid over-counts at this
  * vocabulary size).
  */
object Sketch {

  /** Counter-grid geometry: [[CmsDepth]] hash rows × [[CmsWidth]]
    * buckets. Width 64 against a 31-term fixture vocabulary keeps
    * collisions present-but-rare — the est>exact rows in the output
    * are real, measured collision behavior, not a degenerate case. */
  val CmsDepth = 4
  val CmsWidth = 64

  /** 60-bit md5 key — the [[Select]] hashing convention. */
  private def k60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** CMS bucket of a token under hash row `j`. */
  private def cmsBucket(j: Column, tok: Column): Column =
    (k60(concat(lit("cms:"), j.cast("string"), lit(":"), tok)) %
      CmsWidth).cast("int")

  /** The counter grid (j, b, c) of a (token) stream — the MERGEABLE
    * artifact: grids of two corpus slices add cell-wise to the grid of
    * their union (plain counter addition, the property that lets a
    * stream maintain one grid per batch and fold them), proven in
    * SketchSpec. */
  private[graft] def cmsGridOf(toks: DataFrame): DataFrame = {
    import toks.sparkSession.implicits._
    toks
      .select(explode(sequence(lit(0), lit(CmsDepth - 1))).as("j"),
        $"token")
      .select($"j", cmsBucket($"j", $"token").as("b"))
      .groupBy($"j", $"b").agg(count(lit(1)).as("c"))
  }

  /** Registered query: per-term exact count vs count-min estimate.
    *
    * Shape at 100 TB: the counter grid is ONE map-side-combined
    * aggregate at (depth × width ≤ 256)-key grain — the token stream
    * explodes ×[[CmsDepth]] but combines to the fixed grid inside
    * each map task, so the shuffle carries ≤ 256 rows per partition
    * regardless of corpus size (this is the CMS's whole point: the
    * aggregation state is O(1) in the corpus). The estimate join
    * broadcasts the 256-row grid back against the vocab-grain exact
    * counts; min-over-rows is a [[CmsDepth]]-row groupBy at vocab
    * grain. */
  def cmsCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // ONE tokenize pass (the chiSquareSplit convention): fold to
    // vocab-grain exact counts first — materialized, they feed BOTH
    // the grid (cell sums of per-token counts ≡ cmsGridOf's per-
    // occurrence counts, SketchSpec pins the equivalence) and the
    // estimate join
    val exact = Tables.documentsPar(spark, dir)
      .select(explode(TextAnalysis.toks($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("exact"))
      .localCheckpoint(eager = false)
    val grid = gridFromCounts(exact.select($"token", $"exact".as("cnt")))
    exact
      .select($"token", $"exact",
        explode(sequence(lit(0), lit(CmsDepth - 1))).as("j"))
      .withColumn("b", cmsBucket($"j", $"token"))
      .join(broadcast(grid), Seq("j", "b"))
      .groupBy($"token", $"exact").agg(min($"c").as("est"))
      .orderBy($"token")
  }

  /** The counter grid from a weighted (token, cnt) vocab frame —
    * cell-wise identical to [[cmsGridOf]] over the raw occurrence
    * stream (a cell's counter is the sum of its tokens' counts either
    * way); vocab-grain work ×[[CmsDepth]] instead of corpus-grain. */
  private[graft] def gridFromCounts(counts: DataFrame): DataFrame = {
    import counts.sparkSession.implicits._
    counts
      .select($"token", $"cnt",
        explode(sequence(lit(0), lit(CmsDepth - 1))).as("j"))
      .select($"j", cmsBucket($"j", $"token").as("b"), $"cnt")
      .groupBy($"j", $"b").agg(sum($"cnt").as("c"))
  }

  val cmsCountsSql: String = {
    def bucket(j: String, tok: String): String =
      s"('0x' || substr(md5('cms:' || CAST($j AS VARCHAR) || ':' || $tok), 1, 15))::BIGINT % $CmsWidth"
    s"""WITH tr AS (
       |  SELECT UNNEST(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS token
       |  FROM documents),
       |jj AS (SELECT UNNEST(range($CmsDepth)) AS j),
       |grid AS (
       |  SELECT j, ${bucket("j", "token")} AS b, COUNT(*) AS c
       |  FROM tr CROSS JOIN jj GROUP BY 1, 2),
       |exact AS (SELECT token, COUNT(*) AS exact FROM tr GROUP BY token)
       |SELECT e.token, e.exact, MIN(g.c) AS est
       |FROM exact e CROSS JOIN jj
       |JOIN grid g ON g.j = jj.j AND g.b = ${bucket("jj.j", "e.token")}
       |GROUP BY e.token, e.exact
       |ORDER BY e.token""".stripMargin
  }
}
