package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric","value","unit","queries","sf"}.
  *
  * Each query is materialized via `queryExecution.toRdd.foreach` — a full
  * execution of the physical plan including all column computation — NOT
  * `count()`, which would let Catalyst prune projections away and
  * benchmark a row-count scan (VERDICT r1). Failures are recorded as
  * negative times AND listed in "failed" so a broken query can never
  * masquerade as a fast one.
  *
  * Each query runs twice and the reported time is the best of the two —
  * the first run absorbs codegen compilation and JIT warmup for that
  * query's expressions, so round-over-round regressions in the min are
  * attributable to plan changes rather than compile noise (VERDICT r2
  * item 10).
  */
object Bench {
  @volatile private var calibSink = 0L // defeats dead-code elimination

  /** Fixed single-thread CPU workload (2^27 xorshift steps): a
    * machine-speed index reported beside the query times, so
    * round-over-round deltas can be normalized for shared-host drift.
    * Motivating measurement (r6): IDENTICAL code benched 43.0 s one day
    * and 58.3 s the next at sf0.1 while the sf0.01 pass moved 3% — the
    * host's big-data path (memory/IO), not the code, had drifted. */
  private def calibCpu(): Double = {
    val t0 = System.nanoTime
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < (1 << 27)) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    calibSink = x
    (System.nanoTime - t0) / 1e9
  }

  /** Fixed memory-bandwidth sweep (4 sequential reads of a 512 MB long
    * array): the resource the sf0.1 pass actually contends on — see
    * [[calibCpu]]'s motivating numbers. */
  private def calibMem(): Double = {
    val a = new Array[Long](1 << 26)
    var i = 0
    while (i < a.length) { a(i) = i.toLong; i += 1 }
    (sweepMem(a), calibSink)._1
  }

  private def sweepMem(a: Array[Long]): Double = {
    val t0 = System.nanoTime
    var s = 0L
    var r = 0
    while (r < 4) { var j = 0; while (j < a.length) { s += a(j); j += 1 }; r += 1 }
    calibSink = s
    (System.nanoTime - t0) / 1e9
  }

  /** CONTENDED memory sweep: [[calibMem]]'s 512 MB scan run on every
    * core at once (all threads share one read-only array — N readers on
    * one memory subsystem is exactly the contention of interest; private
    * arrays would need N×512 MB). Reported as the SUM of per-thread
    * sweep times: uncontended it ≈ threads × calib_mem, so
    * calib_mem32 / (threads × calib_mem) is the host's bandwidth
    * contention factor. Why it exists (r6): two runs of IDENTICAL code
    * differed 23% in 32-thread suite total while their single-thread
    * calibs agreed within 1% — a lone probe cannot see multi-core
    * bandwidth contention, so per-query deltas need a contended
    * normalizer (PLANS.md documents the use). */
  private def calibMem32(): Double = {
    val n = Runtime.getRuntime.availableProcessors
    val a = new Array[Long](1 << 26)
    var i = 0
    while (i < a.length) { a(i) = i.toLong; i += 1 }
    val times = new Array[Double](n)
    val threads = (0 until n).map { t =>
      new Thread(() => { times(t) = sweepMem(a) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    times.sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JVM/codegen/parquet machinery on the smoke SF so the first
    // timed query doesn't absorb one-time startup cost
    try SparkEntry.entry(spark).queryExecution.toRdd.foreach(_ => ())
    catch { case _: Throwable => () }
    // optionally cache the input tables once (Tables.warm) so each
    // query's time is the operator's compute + shuffle, not a repeat of
    // the same serial single-row-group scan (VERDICT r3 item 8)
    if (sys.env.get("SPARK_GRAFT_WARM").contains("1"))
      try Tables.warm(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm failed (continuing uncached): ${e.getMessage}")
      }
    // per-query shuffle write bytes (diagnostic column, VERDICT r3 #3):
    // accumulated from completed-stage task metrics, snapshotted after
    // draining the listener bus so deltas attribute to the right query
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) { shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
      }
    })
    def shuffleSnapshot(): Long = {
      org.apache.spark.graftbench.BenchBridge.drainListeners(spark.sparkContext)
      shuffleBytes.get()
    }
    var failed = List.empty[String]
    def timeOnceAt(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): (Boolean, Double, Long) = {
      val s0 = shuffleSnapshot()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, dir).queryExecution.toRdd.foreach(_ => ()); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      (ok, (System.nanoTime() - t0) / 1e9, shuffleSnapshot() - s0)
    }
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Boolean, Double, Long) =
      timeOnceAt(name, fn, sfDir)
    // optional args = query names to bench (iteration aid); no args = all
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (ok1, dt1, sh1) = timeOnce(name, fn)
      val (ok, dt, sh) =
        if (!ok1) (false, dt1, sh1)
        else {
          // time = best of 2 (codegen warm-up); shuffle bytes from the
          // second, warm run (deterministic, but the shared-funnel temp
          // views materialize during run 1 — run 2 is the steady state)
          val (ok2, dt2, sh2) = timeOnce(name, fn)
          (ok2, math.min(dt1, dt2), sh2)
        }
      if (!ok) failed ::= name
      (name, if (ok) dt else -dt, sh)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val shuffles = results.map { case (k, _, s) => "\"" + k + "\":" + s }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // WARM pass (VERDICT r4 #7): cache the input tables, re-run each query
    // once — separates operator compute from the fixtures' serial
    // single-row-group scan noise, so compute regressions are visible even
    // when a round reshuffles scan costs. Skippable for quick iteration.
    val warmResults: Seq[(String, Double)] =
      if (sys.env.get("SPARK_GRAFT_NOWARM").contains("1")) Seq.empty
      else {
        // the warm pass runs LAST and has measured slower than cold two
        // rounds running — it inherits the cold pass's accumulated
        // garbage and heap fragmentation. Settle the heap first so the
        // pass measures operator compute, not the previous pass's debris.
        System.gc()
        Thread.sleep(500)
        try Tables.warm(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[bench] warm failed (skipping warm pass): ${e.getMessage}")
        }
        selected.toSeq.sortBy(_._1).map { case (name, fn) =>
          // best of 2 here too: the cached-relation plan differs from the
          // parquet plan, so run 1 pays a fresh whole-stage-codegen
          // compile — measured ~+1 s/query, which would drown exactly the
          // compute signal this pass exists to expose
          val (ok1, dt1, _) = timeOnce(name, fn)
          if (!ok1) (name, -dt1)
          else {
            val (ok2, dt2, _) = timeOnce(name, fn)
            (name, if (ok2) math.min(dt1, dt2) else -dt2)
          }
        }
      }
    val totalWarm = warmResults.collect { case (_, v) if v >= 0 => v }.sum
    val qsWarm = warmResults.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Second scale point (VERDICT r5 #8): one cold pass per query at
    // sf0.01 rides along in the same JSON line, so round-over-round
    // comparisons get a SLOPE (two SFs) instead of one noisy number.
    // Single-run on purpose — it's a trend indicator, not a tuned
    // measurement; the JVM/codegen warmup is already paid by the main
    // pass. Skippable for quick iteration (SPARK_GRAFT_NOSF2=1).
    val sf2 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR2", "/root/testdata/sf0.01")
    val sf2Results: Seq[(String, Double)] =
      if (sf2 == sfDir || sys.env.get("SPARK_GRAFT_NOSF2").contains("1") ||
          !new java.io.File(sf2).isDirectory) Seq.empty
      else selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        val (ok, dt, _) = timeOnceAt(name, fn, sf2)
        (name, if (ok) dt else -dt)
      }
    val totalSf2 = sf2Results.collect { case (_, v) if v >= 0 => v }.sum
    val qsSf2 = sf2Results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Funnel serving-path pass (VERDICT r6 #4): the registered dedup
    // queries rebuild the shared funnel in-session; production serves
    // them from the PERSISTED bucketed funnel (bootstrapFunnel). Persist
    // once (build time reported), invalidate the session views, point
    // the conf at the funnel, and re-time the funnel consumers — the
    // two paths land side by side in this line for PLANS.md to compare.
    // Skipped when benching a hand-picked query subset.
    val funnelQueryNames = Seq("lsh_pairs", "dedup_jaccard", "dedup_clusters",
      "dedup_containment", "corpus_curate")
    val (funnelBuild, funnelResults): (Double, Seq[(String, Double)]) =
      if (args.nonEmpty || sys.env.get("SPARK_GRAFT_NOFUNNEL").contains("1"))
        (0.0, Seq.empty)
      else try {
        val fd = sys.env.getOrElse("SPARK_GRAFT_FUNNEL_DIR",
          java.nio.file.Files.createTempDirectory("graftbenchfunnel").toString)
        val tb0 = System.nanoTime()
        graft.ops.Dedup.persistFunnel(spark, sfDir, fd)
        val build = (System.nanoTime() - tb0) / 1e9
        graft.ops.Dedup.invalidate(spark, sfDir)
        spark.conf.set(graft.ops.Dedup.FunnelDirConf, fd)
        val r = funnelQueryNames
          .flatMap(n => SparkEntry.queries.get(n).map(n -> _))
          .map { case (name, fn) =>
            // best of 2, like the main pass: run 1 pays the bootstrap
            // (catalog registration), run 2 is the steady serving state
            val (ok1, dt1, _) = timeOnce(name, fn)
            val (ok2, dt2, _) = timeOnce(name, fn)
            (name, if (ok1 && ok2) math.min(dt1, dt2) else -math.max(dt1, dt2))
          }
        (build, r)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] funnel pass failed (skipping): ${e.getMessage}")
        (-1.0, Seq.empty)
      } finally {
        // a failure mid-pass must not leave the session pointed at a
        // half-built temp funnel for everything run later (ADVICE r7)
        try {
          spark.conf.unset(graft.ops.Dedup.FunnelDirConf)
          graft.ops.Dedup.invalidate(spark, sfDir)
        } catch { case _: Throwable => () }
      }
    val totalFunnel = funnelResults.collect { case (_, v) if v >= 0 => v }.sum
    val qsFunnel = funnelResults.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // host-speed calibration, measured AFTER the query passes so it
    // reflects the machine state the times were taken under; a calib
    // failure (e.g. the 512 MB allocation) must cost its field, never
    // the round's results (ADVICE r6)
    def safeCalib(f: () => Double): Double =
      try f() catch { case _: Throwable => -1.0 }
    val calCpu = safeCalib(() => calibCpu())
    val calMem = safeCalib(() => calibMem())
    val calMem32 = safeCalib(() => calibMem32())
    // headline fields lead the line so a truncated tail (BENCH_r04) still
    // carries the totals and the failure list
    val line = s"""{"metric":"total","value":$total,"unit":"sec","total_warm":$totalWarm,"total_sf2":$totalSf2,"total_funnel":$totalFunnel,"funnel_build":$funnelBuild,"sf2":"$sf2","calib_cpu":$calCpu,"calib_mem":$calMem,"calib_mem32":$calMem32,"failed":$failedJson,"sf":"$sfDir","queries":$qs,"queries_warm":$qsWarm,"queries_funnel":$qsFunnel,"shuffle_bytes":$shuffles,"queries_sf2":$qsSf2}"""
    println(line)
    // stdout capture has truncated this line two rounds running
    // (BENCH_r04/r05 `parsed: null`) — persist it whole to a file the
    // driver/judge can read without relying on the pipe
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.out"))
    java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    System.err.println(s"[bench] wrote ${out.toAbsolutePath}")
    spark.stop()
  }
}
