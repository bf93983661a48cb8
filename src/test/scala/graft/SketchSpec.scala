package graft

import graft.ops.{Sketch, TextAnalysis}
import org.apache.spark.sql.functions._

/** Sketch/drift invariants beyond the row/hash oracle: the count-min
  * estimate dominates the exact count (never under-counts), the grid
  * actually measures collisions at this geometry, and the chi-square
  * drift report ranks a genuinely over-used term first. */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("cms estimate dominates the exact count, with real collisions measured") {
    val rows = Sketch.cmsCounts(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS under-counted '${r.getString(0)}': est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    val collided = rows.count(r => r.getLong(2) > r.getLong(1))
    info(s"cms: ${rows.length} terms, $collided with collision over-count")
  }

  test("weighted vocab-grain grid equals the per-occurrence grid") {
    val toks = Seq("x", "y", "x", "z", "x", "y").toDF("token")
    val occ = Sketch.cmsGridOf(toks)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val weighted = Sketch.gridFromCounts(
      toks.groupBy($"token").agg(count(lit(1)).as("cnt")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(weighted == occ,
      "cell sums of per-token counts must equal per-occurrence counts")
  }

  test("cms grids merge: grid(A) + grid(B) cell-wise equals grid(A union B)") {
    val a = Seq("x", "y", "x", "z").toDF("token")
    val b = Seq("y", "w", "w", "x").toDF("token")
    val merged = Sketch.cmsGridOf(a)
      .unionByName(Sketch.cmsGridOf(b))
      .groupBy($"j", $"b").agg(sum($"c").as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val whole = Sketch.cmsGridOf(a.unionByName(b))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == whole,
      "the counter grid must be mergeable by plain cell addition")
  }

  test("vocab_drift ranks the slice's over-used term first, balanced terms near zero") {
    // src0 says 'anomaly' constantly; every source shares the filler
    val fill = "alpha beta gamma delta"
    val docs = ((0 until 20).map(i => (s"anomaly anomaly anomaly $fill", "src0")) ++
      (0 until 20).map(i => (fill, "src1")) ++
      (0 until 20).map(i => (fill, "src2")))
      .toDF("text", "source")
    val drift = TextAnalysis.vocabDriftOf(docs).collect()
    assert(drift.head.getString(0) == "anomaly",
      s"the over-used term must top the report: ${drift.toSeq}")
    // 'anomaly' appears ONLY in the slice: c_b = 0
    assert(drift.head.getLong(2) == 0L)
    // perfectly balanced filler terms contribute ~0 (not exactly 0 only
    // because slice token totals differ via 'anomaly' itself)
    val fillerChi = drift.filter(r => fill.split(' ').contains(r.getString(0)))
      .map(_.getDouble(3))
    assert(fillerChi.forall(_ < drift.head.getDouble(3) / 10),
      "shared-rate terms must contribute far less than the drifted term")
  }
}
