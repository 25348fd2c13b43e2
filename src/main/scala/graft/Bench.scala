package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Benchmark main: runs the full query surface over multiple passes and
  * emits ONE compact JSON line (the LAST stdout line) with per-query
  * MEDIAN seconds over clean passes. The driver parses that line from a
  * bounded tail of stdout, so the line is kept under ~1500 chars by
  * adaptively lowering the per-query decimal precision; full
  * per-iteration detail (every sample with its steal fraction,
  * min/median/max, dispersion, suspect flags) goes to BENCH_FULL.json.
  *
  * MULTI-PASS IS NOT OPTIONAL (round-9 VERDICT ask #2): a single pass
  * on this shared host has shown 9x per-query swings on unchanged
  * code, so one sample is not evidence in either direction. The loop
  * therefore (a) always attempts a SECOND pass when less than 85% of
  * the wall budget is spent — aborting it mid-pass at the budget line
  * rather than skipping it entirely, so most queries still get two
  * samples even when a noise-inflated first pass ate half the budget —
  * and (b) after the passes, re-runs DISPERSION SUSPECTS individually:
  * a query whose clean samples spread max/min > 3x (or which never got
  * two clean samples) is re-measured, most expensive first, while
  * budget remains. Each re-run carries its own /proc/stat steal
  * window, so a sample's contamination is attributed to the sample,
  * not the whole run.
  *
  * CONTAMINATION IS MEASURED, NOT PROSE (round-8 ask #3): cumulative
  * steal/total jiffies are sampled around every pass and every re-run;
  * a sample whose steal fraction exceeds [[stealThreshold]] is
  * excluded from the reported medians when at least one clean sample
  * exists. The stdout line carries the per-pass steal list ("steal"),
  * the clean-pass count ("clean_n"), the sum of per-query minima
  * ("value_min" — the honest compute cost on a noisy host), and
  * per-query minima for the suspect set ("mins").
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Hypervisor steal fraction guard. The host floats at 5-10% steal
    * even when "idle" (measured round-8), which inflates a pass only
    * ~1.1x; the catastrophic passes the round-7 forensics found ran
    * at far higher theft. 15% excludes the poisoned passes without
    * permanently flagging the host's background hum — and the raw
    * per-sample fractions are always in the artifacts for the reader
    * to re-threshold. */
  private val stealThreshold = 0.15

  /** Suspect = clean samples spread more than 3x AND by more than
    * 0.3 s absolute (sub-second queries jitter multiplicatively on
    * any shared host without that meaning anything). */
  private val dispRatio = 3.0
  private val dispFloor = 0.3

  /** (steal, total) cumulative jiffies from /proc/stat's cpu line;
    * None off-Linux (bench then reports steal -1 = unmeasured). */
  private def procStat(): Option[(Long, Long)] =
    try {
      val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu "))
      cpu.map { l =>
        val f = l.trim.split("\\s+").drop(1).map(_.toLong)
        // user nice system idle iowait irq softirq steal [guest...]
        (if (f.length > 7) f(7) else 0L, f.take(8).sum)
      }
    } catch { case _: Throwable => None }

  private def stealSince(s0: Option[(Long, Long)]): Double =
    (s0, procStat()) match {
      case (Some((st0, tt0)), Some((st1, tt1))) if tt1 > tt0 =>
        (st1 - st0).toDouble / (tt1 - tt0)
      case _ => -1.0
    }

  /** One timed measurement with its contamination forensics: the
    * steal fraction of its window, the JVM GC milliseconds spent
    * INSIDE the window (heap-pressure blowups show gc_ms ≈ the
    * inflation; external ones show gc_ms ≈ 0), and the /dev/shm
    * fill level when it finished (spark.local.dir sits on tmpfs —
    * accumulated shuffle litter is RAM pressure for the whole host).
    * Round-14 instrumentation for the residual pass-2 blowups the
    * eager-free did not kill (g18h 7.5→189.8 s at steal 0.03). */
  private case class Sample(t: Double, steal: Double,
    gcMs: Long, shmMb: Long, jitMb: Long)

  /** Cumulative stop-the-world milliseconds across all collectors. */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  /** Used MB across the JIT code-cache pools (segmented CodeHeaps on
    * JDK 9+). A full bench run generates thousands of whole-stage-
    * codegen classes; when the cache fills the JVM silently disables
    * compilation — a 10-25× slowdown at zero host steal that looks
    * exactly like cross-query contamination. Recording occupancy per
    * sample makes that failure mode attributable from the artifact. */
  private def codeCacheUsedMb(): Long =
    try {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans
        .asScala
        .filter(p => p.getName.contains("CodeHeap") ||
          p.getName.contains("Code Cache"))
        .map(_.getUsage.getUsed).sum >> 20
    } catch { case _: Throwable => -1L }

  /** Whole-tmpfs fill of /dev/shm in MB (statfs — O(1); measures the
    * host view, which is what matters: other tenants' fill slows our
    * writes too). -1 when unavailable. */
  private def shmUsedMb(): Long =
    try {
      val fs = Files.getFileStore(Paths.get("/dev/shm"))
      (fs.getTotalSpace - fs.getUsableSpace) >> 20
    } catch { case _: Throwable => -1L }

  /** Round to `dp` decimals, drop trailing zeros ("2.100" -> "2.1"). */
  private def fmt(v: Double, dp: Int): String = {
    val bd = new java.math.BigDecimal(v)
      .setScale(dp, java.math.RoundingMode.HALF_UP)
      .stripTrailingZeros()
    bd.toPlainString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    // Total wall budget: a full pass beyond this is skipped; the
    // mandatory second pass and suspect re-runs stop AT it.
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "1500").toDouble
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      // Spark's generated-class cache holds 100 entries (static conf,
      // spark.sql.codegen.cache.maxEntries). One bench pass compiles
      // a multiple of that across 360+ queries, so by the time pass 2
      // reaches a query its classes are evicted and EVERY SAMPLE pays
      // janino compile + fresh JIT again (measured r14: rrf1 8.0 s on
      // both passes vs 1.4 s with warm code — the cost is compilation,
      // not data). Sizing the cache to the surface makes pass 2+ and
      // the dispersion re-runs measure the QUERY, not the compiler.
      // This caches compiled code keyed on generated source — results
      // are still computed from parquet on every invocation. Same
      // knob a long-lived production driver (Thrift server) would set.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4000"))
      // Stopped streaming queries' state-store providers hold their
      // last-version maps until the maintenance thread notices the
      // query is gone; with ~25 streaming replays per pass, the
      // default 60 s sweep lets tens of store instances linger —
      // sweep more often so their memory returns promptly.
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "15s")
    // Shuffle/spill files on tmpfs when available: at bench scale they are
    // small, and it removes disk-contention noise from a shared machine
    // (round-1 driver runs saw 8-37x inflation consistent with slow /tmp).
    val shm = Paths.get("/dev/shm")
    if (Files.isWritable(shm)) {
      val local = shm.resolve("graft_spark_local")
      Files.createDirectories(local)
      builder.config("spark.local.dir", local.toString)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The inter-query cleanup below unpersists locally-checkpointed
    // RDDs that are finished by design; Spark warns per RDD, and
    // thousands of stderr lines risk interleaving into the driver's
    // bounded output capture around the final JSON line.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd",
      org.apache.logging.log4j.Level.ERROR)
    // Warm the JVM once on the smallest SF (codegen compilation, parquet
    // reader, shuffle + streaming machinery) so first-query JIT cost
    // doesn't land on an arbitrary query's timing.
    val warmDir = "/root/testdata/sf0.001"
    // The four streaming entries at the end warm paths the batch ones
    // can't reach: checkpoint restart, foreachBatch fan-out,
    // stream-stream joins, session windows — the topologies whose
    // pass-1 samples otherwise carry first-use JIT cost. A warm-up
    // failure is LOGGED (not fatal): a silently dead warm entry would
    // degrade that topology back to first-sample JIT noise with no
    // trace in the artifact.
    // The streaming entries warm paths the batch ones can't reach;
    // the ITERATIVE GRAPH entries (round-14, VERDICT ask 1a) warm the
    // loop machinery — localCheckpoint, eager free, integer
    // fixed-point codegen, HyperBall's register algebra — whose
    // first-use JIT cost otherwise lands on pass-1 samples (driver
    // r13: g1 59.2 s, g17h 43.5 s cold vs ~5 s warm).
    Seq("a1_gold_hourly", "ml_feature_matrix", "q5_revenue_by_nation",
      "sim3_cosine_neardup", "d1_exact_dedup", "s2_stream_silver",
      "mm2_decode_stub", "er1_fuzzy_match", "g2_triangle_count",
      "g1_pagerank", "g18h_diameter_hll", "g25_betweenness",
      "x65_kmeans_lloyd",
      "s19_checkpoint_recovery", "s18_fanout_sinks",
      "x37_stream_full_join", "x32_stream_session_window").foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(f) =>
          try f(spark, warmDir).count() catch {
            case t: Throwable => System.err.println(
              s"[bench] WARM-UP FAILED for $n: ${t.getClass.getName}")
          }
        case None => System.err.println(
          s"[bench] WARM-UP entry $n no longer registered")
      }
    }
    // Optional comma-separated filter for iterating on specific queries.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    // Bench-scoped workload substitutions (explicit parameter, not a
    // JVM-global flag): the override map swaps a handful of
    // fixture-heavy entries (d15 store rebuild, t39 planted corpus)
    // for the same composition at bench scale. Names are recorded in
    // BENCH_FULL.json so the artifact carries the workload delta.
    val overrides = SparkEntry.benchOverrides
    val selected = (SparkEntry.queries ++ overrides)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .toSeq.sortBy(_._1)
    val overridden = selected.map(_._1).filter(overrides.contains)
    // Post-query litter sweep (runs OUTSIDE every timed window).
    // clearCache/unpersist release the finished query's frames, but
    // BROADCASTS and SHUFFLE FILES are freed only when the weak-ref
    // ContextCleaner sees them collected — and spark.local.dir sits on
    // /dev/shm, so hundreds of queries' shuffle litter accumulates IN
    // RAM until a full GC happens to run (observed: mid-alphabet
    // queries 2-3x their solo times with disp ~1, both passes agreeing
    // — contamination, not variance). A time-throttled System.gc()
    // gives the cleaner its collection point at a bounded (~1/min,
    // untimed) cost instead of waiting for heap pressure.
    var lastGcNs = System.nanoTime()
    // /dev/shm watermark: above this fill the throttle is bypassed —
    // tmpfs shuffle litter is RAM the ContextCleaner can only return
    // after a collection, and letting it ride to heap pressure is
    // exactly the residual pass-2 contamination pattern (round-14)
    val shmGcMb =
      sys.env.getOrElse("SPARK_GRAFT_SHM_GC_MB", "4096").toLong
    def sweep(): Unit = {
      try {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        if (System.nanoTime() - lastGcNs > 60e9.toLong ||
            shmUsedMb() > shmGcMb) {
          System.gc()
          lastGcNs = System.nanoTime()
        }
      } catch { case _: Throwable => () }
    }
    // per query: every timed sample with its forensic context
    val samples = mutable.LinkedHashMap[String, List[Sample]]()
    selected.foreach { case (n, _) => samples(n) = Nil }
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    var passes = 0
    var partialPasses = 0
    var lastPass = 0.0
    val passSteal = mutable.ListBuffer[Double]()
    def wantMore: Boolean =
      // 1.15 margin: a third pass is only attempted when it fits even
      // if the host degrades ~15% — an aborted pass 3 would trade a
      // complete 2-pass + re-run artifact for a partial_passes flag
      (passes < iters && elapsed + lastPass * 1.15 <= budgetSec) ||
        // the mandatory second pass: attempted (possibly partial)
        // whenever <85% of the budget is spent — one sample per query
        // is never evidence on this host
        (passes < 2 && elapsed <= budgetSec * 0.85)
    while (passes == 0 || wantMore) {
      val p0 = System.nanoTime()
      val s0 = procStat()
      val ran = mutable.ListBuffer[(String, Double, Long, Long, Long)]()
      var aborted = false
      // pass 2+ iterates MOST-EXPENSIVE-FIRST (by best sample so far):
      // when the wall budget aborts a later pass mid-way, the queries
      // left single-sampled are the cheap tail, not the expensive
      // high-variance ones the artifact's evidence quality hinges on
      val order = if (passes == 0) selected
        else selected.sortBy { case (n, _) =>
          -samples(n).map(_.t).minOption.getOrElse(Double.MaxValue) }
      order.foreach { case (name, fn) =>
        // pass >= 2 may abort mid-pass at the budget line; pass 1
        // always completes (every query needs >= 1 sample)
        if (passes >= 1 && elapsed > budgetSec) aborted = true
        if (!aborted) {
          val g0 = gcMillis()
          val q0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
          ran += ((name, (System.nanoTime() - q0) / 1e9,
            gcMillis() - g0, shmUsedMb(), codeCacheUsedMb()))
          // Outside the timed window: drop the finished query's
          // leavings (see sweep() for why the GC point is load-bearing).
          sweep()
        }
      }
      val steal = stealSince(s0)
      ran.foreach { case (n, t, gc, shm, jit) =>
        samples(n) = samples(n) :+ Sample(t, steal, gc, shm, jit) }
      passSteal += steal
      lastPass = (System.nanoTime() - p0) / 1e9
      passes += 1
      if (aborted) partialPasses += 1
      System.err.println(
        f"[bench] pass $passes%d done in $lastPass%.1f s " +
          f"(${ran.size}%d/${selected.size}%d queries, " +
          f"total $elapsed%.1f s, steal ${steal * 100}%.1f%%)")
    }
    def clean(v: List[Sample]): List[Double] = {
      val c = v.collect { case s if s.steal <= stealThreshold => s.t }
      if (c.nonEmpty) c else v.map(_.t)
    }
    def spreadBlown(xs: List[Double]): Boolean =
      xs.max / math.max(xs.min, 1e-9) > dispRatio &&
        xs.max - xs.min > dispFloor
    // (suspect, dropResolved): with >= 3 clean samples the single worst
    // one is attributable (first-use JIT, a stray host spike the steal
    // window missed) — drop it before the spread test, so a query whose
    // REMAINING evidence is consistent counts as resolved instead of
    // being re-flagged forever. Round-13 forensics: after the re-run
    // phase every flagged query had exactly this shape (one inflated
    // pass-1 sample + tight re-runs), which kept the artifact's suspect
    // count at 16 with no information content. dropResolved is the
    // honesty marker: true iff the drop is what cleared the flag — a
    // chronically bimodal query (one slow sample EVERY pass) then shows
    // drop_resolved:true in the artifact instead of silently passing.
    def suspectDetail(v: List[Sample]): (Boolean, Boolean) = {
      val c = clean(v)
      if (c.size < 2) (true, false)
      else {
        val considered = if (c.size >= 3) c.sorted.dropRight(1) else c
        val flagged = spreadBlown(considered)
        (flagged, !flagged && spreadBlown(c))
      }
    }
    def suspect(v: List[Sample]): Boolean = suspectDetail(v)._1
    // DISPERSION RE-RUNS: suspects re-measure individually (own steal
    // window), most expensive first, while budget remains — so even a
    // budget-truncated run replaces its noisiest samples with evidence.
    var reruns = 0
    var round = 0
    while (round < 2 && elapsed < budgetSec) {
      val sus = selected
        .filter { case (n, _) => suspect(samples(n)) }
        .sortBy { case (n, _) => -clean(samples(n)).min }
      if (sus.isEmpty) round = 2
      else {
        sus.foreach { case (name, fn) =>
          if (elapsed < budgetSec) {
            val s0 = procStat()
            val g0 = gcMillis()
            val q0 = System.nanoTime()
            try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
            val t = (System.nanoTime() - q0) / 1e9
            samples(name) = samples(name) :+
              Sample(t, stealSince(s0), gcMillis() - g0, shmUsedMb(),
                codeCacheUsedMb())
            reruns += 1
            // same post-query litter sweep as the pass loop: a re-run
            // exists to REPLACE a contaminated sample, so it must not
            // hand its own persists/checkpoints to the next suspect
            sweep()
          }
        }
        round += 1
        System.err.println(
          f"[bench] rerun round $round%d: ${sus.size}%d suspects, " +
            f"$reruns%d total reruns, elapsed $elapsed%.1f s")
      }
    }
    val med = samples.map { case (k, v) => k -> median(clean(v)) }
    val total = med.values.sum
    val mins = samples.map { case (k, v) => k -> v.map(_.t).min }
    val totalMin = mins.values.sum
    // unmeasured (-1, off-Linux) counts as clean — same convention as
    // the per-sample filter
    val cleanPassN =
      passSteal.count(s => s < 0 || s <= stealThreshold)
    // Full-precision detail for humans/the repo (not the parsed artifact).
    try {
      val detail = samples.map { case (k, v) =>
        val ts = v.map(_.t)
        val disp =
          if (ts.size < 2) 1.0
          else ts.max / math.max(ts.min, 1e-9)
        val (sus, dropResolved) = suspectDetail(v)
        s""""$k":{"samples":[${ts.map(x => f"$x%.3f").mkString(",")}],""" +
          s""""steal":[${v.map(x => f"${x.steal}%.3f").mkString(",")}],""" +
          s""""gc_ms":[${v.map(_.gcMs).mkString(",")}],""" +
          s""""shm_mb":[${v.map(_.shmMb).mkString(",")}],""" +
          s""""jit_mb":[${v.map(_.jitMb).mkString(",")}],""" +
          f""""median":${med(k)}%.3f,"min":${ts.min}%.3f,""" +
          f""""max":${ts.max}%.3f,"disp":$disp%.2f,""" +
          (if (dropResolved) """"drop_resolved":true,""" else "") +
          s""""suspect":$sus}"""
      }.mkString("{", ",", "}")
      val outPath = sys.env.get("SPARK_GRAFT_BENCH_OUT")
        .map(Paths.get(_))
        .getOrElse(Paths.get(sys.props("user.dir"), "BENCH_FULL.json"))
      val stealArr =
        passSteal.map(s => f"$s%.4f").mkString("[", ",", "]")
      Files.writeString(outPath,
        s"""{"sf":"$sfDir","passes":$passes,""" +
          s""""partial_passes":$partialPasses,"reruns":$reruns,""" +
          s""""cpus":$cpus,""" +
          f""""total_median":$total%.3f,"sum_of_minima":$totalMin%.3f,""" +
          f""""wall":$elapsed%.1f,""" +
          s""""steal_per_pass":$stealArr,""" +
          s""""steal_threshold":$stealThreshold,""" +
          s""""clean_passes":$cleanPassN,""" +
          s""""code_cache_max_mb":${
            try {
              import scala.jdk.CollectionConverters._
              java.lang.management.ManagementFactory.getMemoryPoolMXBeans
                .asScala
                .filter(p => p.getName.contains("CodeHeap") ||
                  p.getName.contains("Code Cache"))
                .map(_.getUsage.getMax).sum >> 20
            } catch { case _: Throwable => -1L }},""" +
          overridden.map(n => s""""$n"""")
            .mkString(""""bench_overrides":[""", ",", "],") +
          s""""queries":$detail}""")
    } catch { case _: Throwable => () }
    // Final line LAST on stdout, adaptively sized to survive a bounded
    // stdout-tail capture: the driver keeps a tail of ~2000 chars, but
    // sbt can append GC warnings after us (r08's artifact was nulled by
    // exactly that), so the budget is 1500 — margin, not hope. The
    // ladder lowers per-query precision until it fits (sf is the dir
    // basename — the full path spends 15 chars the budget doesn't have).
    val lineBudget = 1500
    val sfName = sfDir.split('/').last
    // machine-readable contamination: per-pass steal fractions and
    // how many passes were clean (the medians' provenance)
    val stealJson = passSteal.map(s =>
      if (s < 0) "-1" else f"$s%.3f").mkString("[", ",", "]")
    val stealTail =
      s""""steal":$stealJson,"clean_n":$cleanPassN,"rr":$reruns,"""
    val line = Seq(3, 2, 1, 0).view.map { dp =>
      val qs = med.map { case (k, v) => s""""$k":${fmt(v, dp)}""" }
        .mkString("{", ",", "}")
      // value_min (sum of per-query minima) + per-query minima for
      // contention-suspect queries (median ≫ min): on a shared machine
      // samples swing 4-6x pass-to-pass, and the min is the honest
      // compute cost — this lets the single-number view discount noise
      // without growing the line by a full second map
      val sus = med.collect {
        case (k, v) if v > mins(k) * 1.5 && v - mins(k) > 0.3 =>
          s""""$k":${fmt(mins(k), dp max 2)}"""
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, 2)},""" +
        s""""value_min":${fmt(totalMin, 2)},"unit":"sec",""" +
        stealTail +
        s""""queries":$qs,"mins":$sus,"sf":"$sfName","n":$passes}"""
    }.find(_.length <= lineBudget).getOrElse {
      // Even dp=0 over the full surface no longer fits the driver's
      // stdout tail: emit the SLOWEST queries that do fit (the ones perf
      // grading cares about) instead of an empty map; the full detail is
      // always in BENCH_FULL.json.
      val prefix = s"""{"metric":"total","value":${fmt(total, 2)},""" +
        s""""value_min":${fmt(totalMin, 2)},""" + stealTail +
        s""""unit":"sec","sf":"$sfName","n":$passes,"queries":{"""
      val budget = lineBudget - prefix.length - 2
      val entries = scala.collection.mutable.ListBuffer[String]()
      var used = 0
      med.toSeq.sortBy(-_._2).foreach { case (k, v) =>
        val e = s""""$k":${fmt(v, 1)}"""
        val cost = e.length + (if (entries.isEmpty) 0 else 1)
        if (used + cost <= budget) { entries += e; used += cost }
      }
      prefix + entries.mkString(",") + "}}"
    }
    // stop FIRST so no Spark shutdown warning can print after the JSON
    // line — it must be the last stdout line for the driver's tail parse
    try spark.stop() catch { case _: Throwable => () }
    println(line)
  }
}
