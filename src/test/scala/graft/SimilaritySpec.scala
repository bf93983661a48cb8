package graft

import graft.ops.Similarity

/** ANN quality beyond the oracle's exact-value checks: the recall cost of
  * the IVF/LSH pruning vs brute-force ground truth (VERDICT r2 item 9 —
  * the tradeoff the IVF comment claims, measured). */
class SimilaritySpec extends SparkSpec {

  test("ann_ivf recall@5 vs brute-force ground truth is measured and bounded") {
    val truth = Similarity.annTopK(spark, sfDir)
      .limit(5).select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = Similarity.annIvf(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = truth.intersect(ivf).size / 5.0
    val probed = (0 to Similarity.ProbeRadius)
      .map(i => choose(Similarity.NumPlanes, i)).sum
    info(f"ann_ivf recall@5 = $recall%.2f " +
      f"(multi-probe radius ${Similarity.ProbeRadius}: " +
      f"$probed of ${1 << Similarity.NumPlanes} inverted lists)")
    // Fixture neighbors sit at cosine ≈ 0.4 (θ ≈ 66°): single-bucket
    // recall measured 0.2; Hamming-radius-1 multi-probe recovers the
    // majority of the true top-5 while still scanning ~5/16 of the
    // corpus. Fixture is fixed/seeded so this is deterministic.
    assert(recall >= 0.6, f"recall@5 $recall%.2f below the measured bound")
  }

  private def choose(n: Int, k: Int): Int =
    if (k == 0) 1 else n * choose(n - 1, k - 1) / k

  test("multi-probe radius sweep: recall@5 vs scan fraction, monotone") {
    val truth = Similarity.annTopK(spark, sfDir)
      .limit(5).select("vec_id").collect().map(_.getLong(0)).toSet
    val sweep = (0 to 2).map { r =>
      val got = Similarity.annIvfAt(spark, sfDir, r)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val recall = truth.intersect(got).size / 5.0
      val lists = (0 to r).map(i => choose(Similarity.NumPlanes, i)).sum
      info(f"radius $r: recall@5 = $recall%.2f, " +
        f"scans $lists/${1 << Similarity.NumPlanes} inverted lists")
      r -> recall
    }.toMap
    // Monotone by construction: a larger radius scores a SUPERSET of
    // candidates, and any candidate that displaces a true top-5 member
    // under exact scoring must itself be in the true top-5 — so recall
    // can only rise with radius. The sweep records where it saturates.
    assert(sweep(1) >= sweep(0), s"radius-1 recall below radius-0: $sweep")
    assert(sweep(2) >= sweep(1), s"radius-2 recall below radius-1: $sweep")
    assert(sweep(2) >= 0.6, s"radius-2 recall unexpectedly low: $sweep")
  }

  test("ann_ivf scores only the probed buckets (candidate set shrinks)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.bit_count
    val total = Tables.embeddings(spark, sfDir).count() - 1 // minus query vec
    val bucketed = Tables.embeddings(spark, sfDir)
      .withColumn("bucket", Similarity.lshBucket($"embedding"))
    val qBucket = bucketed.filter($"vec_id" === 0).select($"bucket").head().getLong(0)
    val candidates = bucketed.filter($"vec_id" =!= 0 &&
      bit_count($"bucket".bitwiseXOR(qBucket)) <= Similarity.ProbeRadius).count()
    info(s"ann_ivf candidates: $candidates of $total vectors")
    assert(candidates < total, "bucket pruning did not shrink the candidate set")
  }
}
