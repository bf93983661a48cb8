package graft

import graft.functions.Bottom2.bottom2
import org.apache.spark.sql.functions._

/** The Bottom2 DeclarativeAggregate: agreement with the reference
  * collect_set form, distinctness/null transitions, merge across
  * partitions, and the SQL registration. */
class Bottom2Spec extends SparkSpec {

  test("bottom2 equals sorted-collect_set bottom slice on the fixture") {
    import spark.implicits._
    val hashes = Tables.documentsPar(spark, sfDir)
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .select($"doc_id", md5($"t").as("h"))
    val viaSet = hashes.groupBy($"doc_id")
      .agg(sort_array(collect_set($"h")).as("hs"))
      .select($"doc_id", try_element_at($"hs", lit(1)).as("m1"),
        try_element_at($"hs", lit(2)).as("m2"))
    val viaAgg = hashes.groupBy($"doc_id")
      .agg(bottom2($"h").as("b"))
      .select($"doc_id", try_element_at($"b", lit(1)).as("a1"),
        try_element_at($"b", lit(2)).as("a2"))
    val diff = viaSet.join(viaAgg, "doc_id")
      .filter(!($"m1" <=> $"a1") || !($"m2" <=> $"a2"))
    assert(diff.count() == 0, "bottom2 diverges from collect_set reference")
  }

  test("bottom2 handles duplicates, nulls, and sub-2 groups") {
    import spark.implicits._
    val df = Seq(
      ("g1", Some("b")), ("g1", Some("a")), ("g1", Some("a")), ("g1", Some("c")),
      ("g2", Some("z")), ("g2", Some("z")),
      ("g3", None), ("g3", None),
      ("g4", None), ("g4", Some("q"))).toDF("g", "v")
      .repartition(4) // force merge paths across partitions
    val got = df.groupBy($"g").agg(bottom2($"v").as("b"))
      .select($"g", $"b"(0).as("m1"), $"b"(1).as("m2"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got("g1") == ("a", "b"))   // dup "a" not counted twice
    assert(got("g2") == ("z", null))  // one distinct value
    assert(got("g3") == (null, null)) // all null
    assert(got("g4") == ("q", null))  // null ignored
  }

  test("bottom2 aggregate strategy: HashAggregate for longs, SortAggregate for strings") {
    import spark.implicits._
    val longs = Seq((1, 5L), (2, 7L)).toDF("g", "v")
      .groupBy($"g").agg(bottom2($"v"))
      .queryExecution.executedPlan.toString
    assert(longs.contains("HashAggregate") && !longs.contains("SortAggregate"),
      s"long-typed bottom2 should hash-aggregate:\n$longs")
    val strings = Seq((1, "a"), (2, "b")).toDF("g", "v")
      .groupBy($"g").agg(bottom2($"v"))
      .queryExecution.executedPlan.toString
    // documented fallback: var-length buffer slots are not UnsafeRow-
    // mutable, so Spark 4 plans SortAggregate — if a future Spark makes
    // this hash-aggregate, the scaladoc's guidance should be updated
    assert(strings.contains("SortAggregate"),
      s"string-typed bottom2 expected SortAggregate:\n$strings")
  }

  test("bottom2 works over longs and via SQL registration") {
    import spark.implicits._
    val df = Seq((1, 5L), (1, 3L), (1, 9L), (1, 3L), (2, 7L)).toDF("g", "v")
    df.createOrReplaceTempView("b2_input")
    val sql = spark.sql(
      "SELECT g, bottom2(v) AS b FROM b2_input GROUP BY g ORDER BY g")
      .collect()
    assert(sql(0).getSeq[java.lang.Long](1) == Seq(3L, 5L))
    assert(sql(1).getSeq[java.lang.Long](1) == Seq(7L, null))
    // arity error is a clean analysis error
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bottom2(v, 2) FROM b2_input").collect()
    }
    assert(e.getMessage.contains("bottom2"))
  }
}
