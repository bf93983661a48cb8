package graft

import graft.ops.Classifier
import org.apache.spark.sql.functions._

/** Trained-quality-classifier invariants the row/hash oracle can't
  * express: the GD trajectory actually descends (convergence is
  * measured, not assumed — the kmeans-sweep convention), the trained
  * scorer separates the teacher's classes, and training is
  * deterministic across runs. */
class ClassifierSpec extends SparkSpec {

  private lazy val docs = Tables.documentsPar(spark, sfDir)

  test("MSE decreases every sweep from the zero init") {
    val traj = (0 to Classifier.ClsIters).map(Classifier.mseAt(docs, _))
    info(s"MSE trajectory: ${traj.map(m => f"$m%.4f").mkString(" -> ")}")
    traj.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"sweep did not descend: $traj")
    }
    // zero init predicts 0 for everything: MSE(0) == base rate of y=1
    val base = Classifier.featureFrame(docs)
      .agg(avg(col("y"))).head().getDouble(0)
    assert(math.abs(traj.head - base) < 1e-12)
  }

  test("trained scores separate the teacher's classes") {
    val scored = Classifier.qualityClassifier(spark, sfDir)
    val Array(neg, pos) = scored.groupBy(col("teacher"))
      .agg(avg(col("score")).as("m"))
      .orderBy(col("teacher")).collect().map(_.getDouble(1))
    info(f"mean score: teacher=0 -> $neg%.4f, teacher=1 -> $pos%.4f")
    assert(pos > neg, "positive class must score higher on average")
  }

  test("the top-decile keep budget concentrates teacher positives") {
    val scored = Classifier.qualityClassifier(spark, sfDir)
    val n = scored.count()
    val positives = scored.filter(col("teacher") === 1.0).count()
    val kept = scored.filter(col("keep")).count()
    val hits = scored.filter(col("keep") && col("teacher") === 1.0).count()
    val base = positives.toDouble / n
    val prec = hits.toDouble / kept
    val recall = hits.toDouble / positives
    info(f"kept $kept/$n, precision $prec%.3f (base $base%.3f, lift ${prec / base}%.1f), recall $recall%.3f")
    // measured on the fixture: lift 9.5, recall 0.95 — bars leave a
    // wide margin so feature/teacher drift fails loudly, noise doesn't
    assert(prec >= 4 * base, "keep budget should concentrate positives >=4x over random")
    assert(recall >= 0.7, "keep budget should capture most teacher positives")
    // budget size: within interpolation slack of 10% of the corpus
    assert(math.abs(kept - n / 10.0) <= n / 50.0)
  }

  test("weights are deterministic across runs and name every feature") {
    val a = Classifier.classifierWeights(spark, sfDir).collect().toSeq
    val b = Classifier.classifierWeights(spark, sfDir).collect().toSeq
    assert(a == b)
    assert(a.map(_.getString(0)).sorted ==
      Seq("avg_token_len_10", "bias", "len_cap", "stopword_ratio", "unique_ratio"))
  }

  test("persisted model scores a stream bit-identically to training-time scores") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graftclsmodel").toString
    Classifier.materializeModel(spark, sfDir, out)
    val model = spark.read.parquet(out)
    // batch reference scores from the registered query
    val want = Classifier.qualityClassifier(spark, sfDir)
      .select($"doc_id", $"score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // replay a slice of the corpus as a stream, score at ingest time
    val rows = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").limit(50).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    mem.addData(rows.toSeq)
    val q = Classifier.scoreWithModel(
      mem.toDF.toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("cls_stream")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("cls_stream").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 50)
    got.foreach { case (id, s) =>
      assert(s == want(id), s"stream score for doc $id diverged: $s vs ${want(id)}")
    }
  }

  test("serving path: scoring plan has no shuffle of the corpus") {
    // the scorer is feature projection + broadcast 1-row join + dot
    // product; the only Exchange allowed below the final sort is the
    // GD aggregate's own (which feeds the broadcast), never a
    // repartition of the scored documents
    val plan = Classifier.qualityClassifier(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast weight join in:\n$plan")
  }
}
