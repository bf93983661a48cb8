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
  *
  * Timeout-proofing (VERDICT r15 #1): the r15 driver run was killed at
  * its 3600 s budget AFTER all the work but BEFORE the single
  * end-of-main write, so the round's gate recorded `parsed: null`. Now
  * the headline JSON (cold-pass totals — the gated metric) is printed
  * and written to BENCH.out immediately after the cold pass, and the
  * file is REWRITTEN as each later pass (warm, sf2, funnel) completes;
  * a kill at any point after the cold pass leaves a parseable artifact.
  * A soft budget (SPARK_GRAFT_BUDGET_S, default 3300 s — under the
  * driver's 3600 s) skips remaining optional passes when exceeded, so
  * the process exits cleanly with whatever it finished instead of dying
  * 90% done.
  *
  * In-pass bailout + host telemetry (VERDICT r16 #1): the budget is
  * also checked between queries INSIDE each pass ([[boundedPass]]) —
  * on a degraded host a pass in flight can no longer overrun the
  * caller's hard kill with nothing emitted; the artifact carries the
  * completed prefix plus the pass name in "bailed". Every line also
  * carries "calib_cpu_pre" (a single-thread probe taken before any
  * query work) and "loadavg" (/proc/loadavg at start and after each
  * pass), so a drifted pin self-adjudicates instead of needing the
  * manual A/B/A experiment r16's did.
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

  /** Mutable snapshot of everything the JSON line reports. Passes fill
    * their slice and call [[render]] — any prefix of completed passes
    * renders to a valid, parseable line (missing passes show as empty
    * maps / 0 totals / -1 calibs, same shapes the skip paths always
    * produced). */
  final class State(val sfDir: String, val sf2: String) {
    var cold: Seq[(String, Double, Long)] = Seq.empty
    var failed: List[String] = Nil
    var warm: Seq[(String, Double)] = Seq.empty
    var sf2Results: Seq[(String, Double)] = Seq.empty
    var funnel: Seq[(String, Double)] = Seq.empty
    var funnelBuild: Double = 0.0
    var calCpu: Double = -1.0
    var calMem: Double = -1.0
    var calMem32: Double = -1.0
    var passesDone: List[String] = Nil // newest first
    // passes cut short by the soft budget MID-pass (VERDICT r16 #1):
    // their query maps hold the completed prefix only — a short map is
    // attributable to time, never silence
    var bailed: List[String] = Nil
    // host telemetry (VERDICT r16 #1): single-thread calib probe taken
    // BEFORE any query work + /proc/loadavg snapshots at run start and
    // after each pass, so every pin carries the evidence a degraded-host
    // adjudication needs (r16's needed a manual A/B/A)
    var calCpuPre: Double = -1.0
    var telemetry: List[(String, String)] = Nil // newest first
  }

  /** Runs `f` over `items` in order, stopping LOUDLY once `over()`
    * reports the soft budget exceeded mid-pass; the completed prefix is
    * returned and `onBail` records the pass name. At least one item
    * always runs so a blown budget still yields a non-empty pass. The
    * remaining failure mode this closes (VERDICT r16 #1): a pass in
    * flight on a degraded host overrunning the caller's hard kill with
    * nothing emitted since the previous pass boundary. */
  def boundedPass[A, B](pass: String, items: Seq[A], over: () => Boolean,
      onBail: String => Unit)(f: A => B): Seq[B] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[B]
    val it = items.iterator
    var bailed = false
    while (it.hasNext && !bailed) {
      if (out.nonEmpty && over()) {
        bailed = true
        onBail(pass)
        System.err.println(s"[bench] BAILING out of '$pass' mid-pass — " +
          s"soft budget exceeded; emitting ${out.size}/${items.size} queries")
      } else out += f(it.next())
    }
    out.toSeq
  }

  /** Raw `/proc/loadavg` line ("" where unreadable — never throws). */
  def readLoadavg(): String =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").trim
    catch { case _: Throwable => "" }

  /** Renders the one-line JSON artifact from whatever [[State]] holds.
    * Headline fields lead the line so even a truncated tail (BENCH_r04)
    * still carries the totals and the failure list. */
  def render(st: State): String = {
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(st.cold.map { case (k, v, _) => (k, v) })
    val shuffles = st.cold.map { case (k, _, s) => "\"" + k + "\":" + s }
      .mkString("{", ",", "}")
    val total = st.cold.collect { case (_, v, _) if v >= 0 => v }.sum
    val failedJson = st.failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val totalWarm = st.warm.collect { case (_, v) if v >= 0 => v }.sum
    val totalSf2 = st.sf2Results.collect { case (_, v) if v >= 0 => v }.sum
    val totalFunnel = st.funnel.collect { case (_, v) if v >= 0 => v }.sum
    val passes = st.passesDone.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val bailedJson = st.bailed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val loadavg = st.telemetry.reverse
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":$total,"unit":"sec","total_warm":$totalWarm,"total_sf2":$totalSf2,"total_funnel":$totalFunnel,"funnel_build":${st.funnelBuild},"sf2":"${st.sf2}","calib_cpu":${st.calCpu},"calib_mem":${st.calMem},"calib_mem32":${st.calMem32},"calib_cpu_pre":${st.calCpuPre},"bailed":$bailedJson,"loadavg":$loadavg,"passes_done":$passes,"failed":$failedJson,"sf":"${st.sfDir}","queries":$qs,"queries_warm":${jmap(st.warm)},"queries_funnel":${jmap(st.funnel)},"shuffle_bytes":$shuffles,"queries_sf2":${jmap(st.sf2Results)}}"""
  }

  /** Atomically (write temp + move) rewrites the artifact file so a kill
    * mid-write can't leave a truncated line. */
  def writeOut(line: String, out: java.nio.file.Path): java.nio.file.Path = {
    val tmp = out.resolveSibling(out.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp, (line + "\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, out,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    out
  }

  def main(args: Array[String]): Unit = {
    val wall0 = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    // soft self-deadline (sec): optional passes are skipped once exceeded
    // so the run finishes and emits rather than being killed 90% done by
    // the caller's hard budget (the r15 failure mode)
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BUDGET_S", "3300").toDouble
    def elapsedS: Double = (System.nanoTime() - wall0) / 1e9
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Logs.quietBoundedWindows()
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
    val sf2 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR2", "/root/testdata/sf0.01")
    val st = new State(sfDir, sf2)
    def safeCalib(f: () => Double): Double =
      try f() catch { case _: Throwable => -1.0 }
    // telemetry the pin needs to self-adjudicate host drift: a calib
    // probe BEFORE any query work + loadavg at start / after each pass
    def mark(key: String): Unit = st.telemetry ::= (key -> readLoadavg())
    st.calCpuPre = safeCalib(() => calibCpu())
    mark("start")
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.out"))
    def emit(pass: String, toStdout: Boolean): Unit = {
      st.passesDone ::= pass
      mark(pass)
      val line = render(st)
      if (toStdout) println(line)
      val out = writeOut(line, outPath)
      System.err.println(
        f"[bench] pass '$pass' done at $elapsedS%.0f s — wrote ${out.toAbsolutePath}")
    }
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

    def overBudget(): Boolean = elapsedS > budgetS
    def onBail(pass: String): Unit = st.bailed ::= pass

    // ── COLD pass: the gated metric ─────────────────────────────────
    st.cold = boundedPass("cold", selected.toSeq.sortBy(_._1),
        () => overBudget(), onBail) { case (name, fn) =>
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
      if (!ok) st.failed ::= name
      (name, if (ok) dt else -dt, sh)
    }
    // the headline (cold totals + failed) hits stdout AND disk here —
    // everything after this point only enriches the artifact
    emit("cold", toStdout = true)

    // a pass is attempted only while under the soft budget; skipping is
    // loud so a short artifact is attributable to time, not silence
    def underBudget(pass: String): Boolean = {
      val ok = elapsedS < budgetS
      if (!ok) System.err.println(
        f"[bench] SKIPPING $pass pass: elapsed $elapsedS%.0f s > budget $budgetS%.0f s")
      ok
    }

    // ── WARM pass (VERDICT r4 #7): cache the input tables, re-run each
    // query once — separates operator compute from the fixtures' serial
    // single-row-group scan noise, so compute regressions are visible
    // even when a round reshuffles scan costs. ──────────────────────
    if (!sys.env.get("SPARK_GRAFT_NOWARM").contains("1") && underBudget("warm")) {
      // the warm pass has measured slower than cold two rounds running —
      // it inherits the cold pass's accumulated garbage and heap
      // fragmentation. Settle the heap first so the pass measures
      // operator compute, not the previous pass's debris.
      System.gc()
      Thread.sleep(500)
      try Tables.warm(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm failed (skipping warm pass): ${e.getMessage}")
      }
      st.warm = boundedPass("warm", selected.toSeq.sortBy(_._1),
          () => overBudget(), onBail) { case (name, fn) =>
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
      emit("warm", toStdout = false)
    }

    // ── Second scale point (VERDICT r5 #8): one cold pass per query at
    // sf0.01 rides along in the same JSON line, so round-over-round
    // comparisons get a SLOPE (two SFs) instead of one noisy number.
    // Single-run on purpose — a trend indicator, not a tuned
    // measurement; the JVM/codegen warmup is already paid. ──────────
    if (sf2 != sfDir && !sys.env.get("SPARK_GRAFT_NOSF2").contains("1") &&
        new java.io.File(sf2).isDirectory && underBudget("sf2")) {
      st.sf2Results = boundedPass("sf2", selected.toSeq.sortBy(_._1),
          () => overBudget(), onBail) { case (name, fn) =>
        val (ok, dt, _) = timeOnceAt(name, fn, sf2)
        (name, if (ok) dt else -dt)
      }
      emit("sf2", toStdout = false)
    }

    // ── Funnel serving-path pass (VERDICT r6 #4): the registered dedup
    // queries rebuild the shared funnel in-session; production serves
    // them from the PERSISTED bucketed funnel (bootstrapFunnel). Persist
    // once (build time reported), invalidate the session views, point
    // the conf at the funnel, and re-time the funnel consumers — the two
    // paths land side by side in this line for PLANS.md to compare.
    // Skipped when benching a hand-picked query subset. ─────────────
    val funnelQueryNames = Seq("lsh_pairs", "dedup_jaccard", "dedup_clusters",
      "dedup_containment", "corpus_curate")
    if (args.isEmpty && !sys.env.get("SPARK_GRAFT_NOFUNNEL").contains("1") &&
        underBudget("funnel")) {
      try {
        val fd = sys.env.getOrElse("SPARK_GRAFT_FUNNEL_DIR",
          java.nio.file.Files.createTempDirectory("graftbenchfunnel").toString)
        val tb0 = System.nanoTime()
        graft.ops.Dedup.persistFunnel(spark, sfDir, fd)
        st.funnelBuild = (System.nanoTime() - tb0) / 1e9
        graft.ops.Dedup.invalidate(spark, sfDir)
        spark.conf.set(graft.ops.Dedup.FunnelDirConf, fd)
        st.funnel = boundedPass("funnel", funnelQueryNames
            .flatMap(n => SparkEntry.queries.get(n).map(n -> _)),
            () => overBudget(), onBail) { case (name, fn) =>
            // best of 2, like the main pass: run 1 pays the bootstrap
            // (catalog registration), run 2 is the steady serving state
            val (ok1, dt1, _) = timeOnce(name, fn)
            val (ok2, dt2, _) = timeOnce(name, fn)
            (name, if (ok1 && ok2) math.min(dt1, dt2) else -math.max(dt1, dt2))
          }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] funnel pass failed (skipping): ${e.getMessage}")
        st.funnelBuild = -1.0
      } finally {
        // a failure mid-pass must not leave the session pointed at a
        // half-built temp funnel for everything run later (ADVICE r7)
        try {
          spark.conf.unset(graft.ops.Dedup.FunnelDirConf)
          graft.ops.Dedup.invalidate(spark, sfDir)
        } catch { case _: Throwable => () }
      }
      emit("funnel", toStdout = false)
    }

    // host-speed calibration, measured AFTER the query passes so it
    // reflects the machine state the times were taken under; a calib
    // failure (e.g. the 512 MB allocation) must cost its field, never
    // the round's results (ADVICE r6)
    st.calCpu = safeCalib(() => calibCpu())
    st.calMem = safeCalib(() => calibMem())
    st.calMem32 = safeCalib(() => calibMem32())
    // final, complete line — the stdout contract's LAST JSON line and
    // the artifact's final state coincide
    emit("calib", toStdout = true)
    spark.stop()
  }
}
