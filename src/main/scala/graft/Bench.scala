package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — the driver's per-round BENCH_r{N}.json source.
  *
  * Executes every declared query with a `noop`-format write (NOT `count()`:
  * Catalyst's `EliminateSorts` removes an `orderBy` under an aggregate, so a
  * count-based harness would skip the very sorts this engine exists to
  * measure — the full physical plan, range shuffle + sort included, only runs
  * when every row is consumed by a sink). A warm-up pass at sf0.001 absorbs
  * JVM/codegen warm-up so the first timed query isn't charged ~7 s of JIT.
  * Failures are never swallowed: a failed query reports `-1` and the error
  * goes to stderr.
  *
  * TWO PROTOCOLS in one artifact:
  *
  *  - "suite": every declared query back-to-back in ONE session — the
  *    end-to-end number, interference (GC pressure, broadcast cleanup,
  *    shared-JVM contention) included. Fast, but round-over-round deltas
  *    on individual queries are polluted by whatever else the suite grew.
  *  - "solo": each query in a FRESH SparkContext (same JVM — which is what
  *    a warm executor reuse looks like on a cluster anyway; JIT state
  *    persists, Spark-side state does not). No caches, no broadcasts, no
  *    accumulated session debris from other queries. Round-over-round
  *    per-query comparisons should cite SOLO numbers; the suite total
  *    remains the workload-level number.
  *
  * By default the suite runs in full and the `SPARK_GRAFT_BENCH_SOLO`
  * heaviest queries (default 12, by suite time; "all" for a full sweep,
  * "none"/"0" to skip) re-run solo — bounding the added wall-clock while
  * covering exactly the queries whose regressions matter.
  *
  * LOAD GATE: each pass estimates the box's EXTERNAL load (mean sampled
  * loadavg minus this JVM's own measured core usage); a pass above
  * `SPARK_GRAFT_BENCH_LOAD_BOUND` (default 4) is contended, and if every
  * pass is, up to `SPARK_GRAFT_BENCH_LOAD_RETRIES` (default 2) extra
  * passes chase a clean one. Per-query mins come from clean passes when
  * any exist; otherwise the artifact carries `"contended": true`. Solo
  * re-runs are gated the same way (500 ms sampling — their sections are
  * seconds, not minutes), each row carrying its own estimate + flag; an
  * estimate needs ≥ 2 samples or it reports unmeasurable (-1, warned).
  *
  * IN-JVM GATE (r17: the committed closing run carried 28-34 GB pass
  * peak heaps — a 5x inherited-JVM signature its own solo rows
  * contradicted — yet read contended:false): a pass whose own GC seconds
  * exceed `SPARK_GRAFT_BENCH_GC_BOUND` (default 30) or whose peak heap
  * exceeds `SPARK_GRAFT_BENCH_HEAP_BOUND_MB` (default 20000, ~3x the
  * clean-box closing profile) is contended exactly like an external-load
  * pass; the retry after a JVM-contended pass rebuilds the SparkSession
  * first. The artifact records per-pass flags + both bounds.
  *
  * SELF-CLEANING (r18: the gate above DETECTED the driver's official run
  * as contended — inherited-JVM heap 24-35 GB from whatever ran
  * correctness first — but the artifact of record still documented a
  * polluted JVM): `main` now inspects the JVM it woke up in, and when it
  * is not the clean calibration profile (max heap beyond
  * `SPARK_GRAFT_BENCH_FORK_MAXHEAP_MB`, default 12288, or post-GC used
  * heap already beyond `SPARK_GRAFT_BENCH_FORK_USED_MB`, default 4096 —
  * a fresh 8 GB bench JVM starts under 1 GB), it RELAUNCHES itself in a
  * fresh child JVM sized to the clean profile (`-Xmx$SPARK_DRIVER_MEM`,
  * default 8g, same module opens as build.sbt) and relays the child's
  * stdout/artifact/exit code. `SPARK_GRAFT_BENCH_FORK` = auto (default)
  * | always | never; the artifact records `forked_fresh`. An
  * sbt-forked closing run skips the fork (it IS the clean profile); a
  * driver run inheriting a correctness JVM cannot produce a contended
  * official artifact anymore — the measurement never runs in that JVM.
  */
object Bench {

  /** build.sbt's jdk17AddOpens, duplicated for self-relaunch — Spark 4.x
    * on JDK 17 needs them when SparkSession is created outside
    * spark-submit.
    */
  private val jdk17AddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Relaunch the bench in a fresh clean-profile JVM when this one is
    * polluted (or always/never per SPARK_GRAFT_BENCH_FORK). Returns the
    * child's exit code, or None when no fork is needed.
    */
  private def relaunchFresh(): Option[Int] = {
    val mode = sys.env.getOrElse("SPARK_GRAFT_BENCH_FORK", "auto")
    if (mode == "never") return None
    def polluted: Boolean = {
      System.gc()
      val rt = Runtime.getRuntime
      val usedMb = (rt.totalMemory - rt.freeMemory) >> 20
      val maxMb = rt.maxMemory >> 20
      val maxBound =
        sys.env.getOrElse("SPARK_GRAFT_BENCH_FORK_MAXHEAP_MB", "12288").toLong
      val usedBound =
        sys.env.getOrElse("SPARK_GRAFT_BENCH_FORK_USED_MB", "4096").toLong
      val p = maxMb > maxBound || usedMb > usedBound
      if (p) System.err.println(s"[bench] JVM not the clean profile " +
        s"(maxHeap ${maxMb} MB, post-GC used ${usedMb} MB) — relaunching fresh")
      p
    }
    if (mode != "always" && !polluted) return None
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val cmd = Seq(javaBin) ++ jdk17AddOpens ++ Seq(
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
      "-cp", System.getProperty("java.class.path"),
      "graft.Bench")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_BENCH_FORK", "never") // recursion guard
    pb.environment().put("SPARK_GRAFT_BENCH_FORKED", "1")   // artifact marker
    pb.inheritIO()
    Some(pb.start().waitFor())
  }

  private def execute(
      spark: SparkSession, name: String, dir: String): Either[String, Double] = {
    val t0 = System.nanoTime()
    try {
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      Right((System.nanoTime() - t0) / 1e9)
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        Left(e.getClass.getSimpleName)
    }
  }

  private def minOf(
      a: Either[String, Double], b: Either[String, Double]): Either[String, Double] =
    (a, b) match {
      case (Right(x), Right(y)) => Right(math.min(x, y))
      case (Left(e), _) => Left(e)
      case (_, Left(e)) => Left(e)
    }

  def main(args: Array[String]): Unit = {
    relaunchFresh().foreach { code =>
      // the child produced the official line + artifact; propagate only
      // failure (callers that continue after Bench.main keep running)
      if (code != 0) sys.exit(code)
      return
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    def newSession(): SparkSession = {
      val s = GraftSession
        .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = newSession()

    // optional comma-separated subset for isolated profiling runs; the
    // driver sets no filter and measures everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // Suite-lifetime experiment knobs (the q_label_prop/q_kcore autopsy —
    // r11 saw a post-closing run hold the graph family 5-8x slow across
    // ALL passes of one suite JVM while closing/solo runs were fine):
    //  - ORDER=reverse runs the suite in reverse name order, so the graph
    //    family executes EARLY; if slowness follows suite position, it is
    //    accumulated session state, if it follows the family, it is the
    //    queries themselves.
    //  - RESTART=N stops and rebuilds the SparkSession every N queries
    //    (outside timed sections) — the "per-family session" mitigation.
    val order = sys.env.getOrElse("SPARK_GRAFT_BENCH_ORDER", "asc")
    val restartEvery = sys.env.getOrElse("SPARK_GRAFT_BENCH_RESTART", "0").toInt
    val sortedNames = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val names = if (order == "reverse") sortedNames.reverse else sortedNames
    // Flush accumulated session debris OUTSIDE timed sections: the
    // warm-up pass leaves thousands of weak-referenced broadcasts/shuffles
    // whose ContextCleaner reclamation otherwise fires mid-measurement —
    // observed as a wandering ~16x spike on whichever heavy query the
    // first post-warm-up GC lands on (r9: q_label_prop 64.8 s vs 3.5 solo;
    // r10 pre-fix: q_pack_bpe 107.9 s vs 6.6 on pass 2).
    def settle(): Unit = { System.gc(); Thread.sleep(2000); System.gc() }
    // Warm-up at the smallest SF: JIT + codegen caches, not data volume.
    names.foreach(execute(spark, _, "/root/testdata/sf0.001"))
    settle()
    // N timed passes (default 3), per-query MIN: single-pass numbers on a shared box
    // randomly attribute multi-second contention spikes to whichever query
    // was running; the min of two runs is the standard suppression.
    // Autopsy (r10): the spikes are HOST contention, not the engine — they
    // wander across queries and passes run-to-run (q_label_prop r9,
    // q_pack_bpe twice, then q_text_tfidf/q_sim_ivfpq), hit pass 1 and
    // pass 2 alike, never reproduce in subset mode, and a -Xlog:gc run
    // capped every GC pause at 278 ms while a 42 s spike landed — no
    // engine-side state explains that profile. SPARK_GRAFT_BENCH_PASSES
    // raises the suppression (min of N) when a box is known-noisy.
    // Default 3: the r10 autopsy showed this box lands multi-second host-
    // contention spikes often enough that min-of-2 still let one through
    // (q_pack_bpe pass1+pass2 both spiked once in r10). Three passes is the
    // recorded default so round-over-round suite totals stay comparable.
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(2)
    var sinceRestart = 0
    def maybeRestart(): Unit = if (restartEvery > 0) {
      sinceRestart += 1
      if (sinceRestart >= restartEvery) {
        spark.stop(); spark = newSession(); sinceRestart = 0
      }
    }
    // host-contention discriminator: 1-minute system load average sampled
    // at each pass's start and end, recorded in the artifact — the r10/
    // r12/r13 whole-run contention signature (uniform suite inflation with
    // no code change) becomes mechanically separable from a plan
    // regression (which moves one query, not the box)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def loadAvg(): Double = math.rint(osBean.getSystemLoadAverage * 100) / 100
    // Our own suite drives loadavg toward the cpu count (r14 committed
    // closing passes read 17/14 at pass end on an otherwise-IDLE box), so
    // raw loadavg cannot gate a pass. EXTERNAL load can: sample loadavg
    // every 2 s DURING the pass and subtract the cores this JVM actually
    // consumed (Δ getProcessCpuTime / wall) — on an idle box the two
    // track and the difference sits near 0; a competing driver run shows
    // up as the gap (r14: passes at load ~30 with 32 of our threads =
    // external ≈ the other run's appetite).
    def processCpuNs(): Long = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }
    // Reusable external-load estimator: samples loadavg every `periodMs`
    // for the lifetime of one measured section, then reports mean sampled
    // load minus this JVM's own consumed cores. FEWER THAN 2 SAMPLES is
    // unmeasurable (one sample of a 1-minute EWMA says nothing about the
    // section) — reported as -1 with a stderr warning, so a "clean"
    // verdict from an under-sampled section is at least visible instead
    // of silent. Solo sections (seconds, not minutes) sample at 500 ms.
    final class LoadSampler(periodMs: Long) {
      private val samples = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Double]()
      @volatile private var sampling = true
      private val cpu0 = processCpuNs()
      private val w0 = System.nanoTime()
      private val th = new Thread(() => {
        while (sampling) {
          val l = osBean.getSystemLoadAverage
          if (l >= 0) samples.add(l)
          Thread.sleep(periodMs)
        }
      }, "bench-load-sampler")
      th.setDaemon(true)
      th.start()
      /** external-load estimate, -1 when unmeasurable (warned). */
      def stop(tag: String): Double = {
        sampling = false
        th.join(3000)
        val wall = (System.nanoTime() - w0) / 1e9
        val ownCores =
          if (cpu0 >= 0) (processCpuNs() - cpu0) / 1e9 / wall else -1.0
        var s = 0.0; var k = 0
        val it = samples.iterator()
        while (it.hasNext) { s += it.next(); k += 1 }
        if (k < 2 || ownCores < 0) {
          System.err.println(s"[bench] $tag external load UNMEASURABLE " +
            s"($k samples, ownCores=$ownCores) — treated as clean")
          -1.0
        } else math.rint(math.max(0.0, s / k - ownCores) * 100) / 100
      }
    }
    val passLoads = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val passExternal = scala.collection.mutable.ArrayBuffer.empty[Double]
    // IN-JVM stall eyes (r16 verdict: the load gate measures EXTERNAL load
    // only and was blind to the r9-class GC ghost — q_label_prop's 139.7 s
    // pass-1 on an externally-CLEAN pass). Per measured section record the
    // JVM's own GC time (GarbageCollectorMXBean collection-time delta) and
    // the peak heap reached (MemoryPoolMXBean peak usage, reset at section
    // start) so a pass inflated from INSIDE the JVM is attributable
    // mechanically: high gc_sec with flat external load = GC ghost, not a
    // plan regression and not a neighbor.
    import scala.jdk.CollectionConverters._
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcTimeMs(): Long =
      gcBeans.asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .asScala.filter(_.getType == java.lang.management.MemoryType.HEAP)
    def resetHeapPeaks(): Unit =
      heapPools.foreach(p => if (p.isValid) p.resetPeakUsage())
    def peakHeapMb(): Long =
      heapPools.map(p => if (p.isValid) p.getPeakUsage.getUsed else 0L).sum >> 20
    final class GcMeter {
      private val gc0 = gcTimeMs()
      resetHeapPeaks()
      /** (gc seconds in section, peak heap MiB in section) */
      def stop(): (Double, Long) =
        (math.rint((gcTimeMs() - gc0) / 10.0) / 100.0, peakHeapMb())
    }
    val passGcSec = scala.collection.mutable.ArrayBuffer.empty[Double]
    val passPeakHeapMb = scala.collection.mutable.ArrayBuffer.empty[Long]
    def runPass(): Map[String, Either[String, Double]] = {
      val la0 = loadAvg()
      val sampler = new LoadSampler(2000)
      val gc = new GcMeter
      val p = names.map { n =>
        val r = n -> execute(spark, n, sfDir)
        maybeRestart()
        r
      }.toMap
      val (gcs, peak) = gc.stop()
      passGcSec += gcs
      passPeakHeapMb += peak
      passExternal += sampler.stop(s"suite pass ${passExternal.size + 1}")
      passLoads += ((la0, loadAvg()))
      settle()
      p
    }
    // LOAD GATE (the r14 protocol gap: the loadavg field existed but
    // nothing acted on it — both r14 artifacts carried passes at load
    // 14-30 and the headline was ~10-15% noise). A pass whose external
    // load exceeds the bound is CONTENDED; if every pass is, re-run up
    // to SPARK_GRAFT_BENCH_LOAD_RETRIES extra passes chasing one clean
    // pass. Per-query mins are then taken over CLEAN passes when any
    // exist (a contended pass can only inflate, but "min comes from an
    // under-bound pass" is the auditable invariant); when none exist the
    // artifact says so mechanically ("contended": true) instead of
    // depending on box luck being noticed by a reader.
    val loadBound = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_BOUND", "4.0").toDouble
    val maxExtra = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_RETRIES", "2").toInt
    // IN-JVM contention gate (r17 verdict #1: the committed closing bench
    // was a 338.7 s run in an inherited JVM — pass peak heap 28-34 GB vs
    // the clean-box 5.6-6.6 GB, per-query suite walls up to 5x their own
    // solo rows — and still reported contended:false because only
    // EXTERNAL load gated). Bounds calibrated from the r17 clean-box
    // closing profile: peak heap 5.6-6.6 GB -> 20 GB bound (3x headroom
    // for legitimate suite growth); gc 1.8-2.7 s -> 30 s bound (the
    // r9-class GC-ghost signature is tens of seconds). A pass over either
    // bound is CONTENDED exactly like an external-load pass; when a
    // retry chases a clean pass after a JVM-contended one, the
    // SparkSession is rebuilt first (sheds session debris — the only
    // in-process remediation available; inherited-JVM heap lineage that
    // survives it ends the run honestly contended:true).
    val gcBound = sys.env.getOrElse("SPARK_GRAFT_BENCH_GC_BOUND", "30.0").toDouble
    val heapBound = sys.env.getOrElse("SPARK_GRAFT_BENCH_HEAP_BOUND_MB", "20000").toLong
    val allPassesBuf =
      scala.collection.mutable.ArrayBuffer.empty[Map[String, Either[String, Double]]]
    (1 to nPasses).foreach(_ => allPassesBuf += runPass())
    // an unmeasurable external load (no com.sun.management bean) cannot
    // gate — treat as clean so the run terminates, the artifact's -1
    // marks it unmeasured
    def jvmContended(i: Int): Boolean =
      passGcSec(i) > gcBound || passPeakHeapMb(i) > heapBound
    def contended(i: Int): Boolean = passExternal(i) > loadBound || jvmContended(i)
    var extras = 0
    while (allPassesBuf.indices.forall(contended) && extras < maxExtra) {
      val last = allPassesBuf.size - 1
      System.err.println(s"[bench] all ${allPassesBuf.size} passes contended " +
        s"(external > $loadBound, or gc > $gcBound s / peak heap > $heapBound MB " +
        s"in-JVM) — re-running")
      if (jvmContended(last)) { spark.stop(); spark = newSession() }
      extras += 1
      allPassesBuf += runPass()
    }
    val allPasses = allPassesBuf.toSeq
    val cleanIdx = allPasses.indices.filterNot(contended)
    val allContended = cleanIdx.isEmpty
    val minIdx = if (allContended) allPasses.indices else cleanIdx
    val results = names.map(n =>
      n -> minIdx.map(i => allPasses(i)(n)).reduce(minOf))

    // Solo re-runs: fresh SparkContext per query, its own warm-up + two
    // timed passes. Defaults to the 12 heaviest by suite time (subset runs
    // default to none — SPARK_GRAFT_BENCH_ONLY is already the solo
    // protocol); "all" sweeps everything.
    val soloSpec = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_SOLO", if (only.isDefined) "none" else "12")
    val soloNames: Seq[String] = soloSpec match {
      case "none" | "0" => Nil
      case "all" => names
      case n => results.collect { case (k, Right(v)) => (k, v) }
        .sortBy { case (k, v) => (-v, k) }.take(n.toInt).map(_._1)
    }
    // Solo sections are load-gated like suite passes (the r13 q_label_prop
    // 65.5 s ghost came from an ungated solo): each two-pass timed section
    // carries its own external-load estimate; a contended section is
    // re-run up to the same retry budget chasing a clean one, and the
    // artifact records the estimate + flag per solo row.
    val soloExternal = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val soloContended = scala.collection.mutable.LinkedHashMap.empty[String, Boolean]
    val soloGcSec = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val solo = soloNames.map { n =>
      spark.stop()
      spark = newSession()
      execute(spark, n, "/root/testdata/sf0.001")
      settle()
      def timedSection(): (Either[String, Double], Double, Double) = {
        val sampler = new LoadSampler(500)
        val gc = new GcMeter
        val r = minOf(execute(spark, n, sfDir), execute(spark, n, sfDir))
        (r, sampler.stop(s"solo $n"), gc.stop()._1)
      }
      var (r, ext, gcs) = timedSection()
      var tries = 0
      while (ext > loadBound && tries < maxExtra) {
        System.err.println(s"[bench] solo $n contended (external $ext) — re-running")
        tries += 1
        settle()
        val (r2, ext2, gcs2) = timedSection()
        // a clean re-run replaces the contended min outright (contended
        // walls only inflate); two contended sections keep whichever
        // section's WALL won, with THAT section's load/gc estimates — the
        // recorded estimate always describes the section the number came
        // from (r16 ADVICE: the old elementwise min could pair one
        // section's wall with the other's load)
        if (ext2 <= loadBound) { r = r2; ext = ext2; gcs = gcs2 }
        else {
          val secondWins = (r, r2) match {
            case (Right(x), Right(y)) => y < x
            case (Right(_), Left(_)) => true // failure still propagates (minOf rule)
            case _ => false
          }
          if (secondWins) { r = r2; ext = ext2; gcs = gcs2 }
        }
      }
      soloExternal(n) = ext
      soloContended(n) = ext > loadBound
      soloGcSec(n) = gcs
      n -> r
    }

    def fmt(kvs: Seq[(String, Either[String, Double])]): String =
      kvs.map {
        case (k, Right(v)) => s"\"$k\":$v"
        case (k, Left(_)) => s"\"$k\":-1"
      }.mkString("{", ",", "}")
    val qs = fmt(results)
    val failed = (results ++ solo).collect { case (k, Left(err)) => s"\"$k\":\"$err\"" }
    val total = results.collect { case (_, Right(v)) => v }.sum
    val errJson =
      if (failed.isEmpty) "" else s""","errors":${failed.distinct.mkString("{", ",", "}")}"""
    val soloJson = if (solo.isEmpty) "" else s""","solo":${fmt(solo)}"""
    val protocol =
      s"min-of-${minIdx.size}-clean-of-${allPasses.size}"
    val json = s"""{"metric":"total","value":$total,"unit":"sec","protocol":"$protocol","queries":$qs$soloJson$errJson,"sf":"$sfDir"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    // STDOUT CONTRACT: the driver keeps only the last ~2000 chars of stdout
    // and json-parses them — but 180 query NAMES alone exceed 2000 chars, so
    // a full per-query map can never survive the window (r11's BENCH artifact
    // landed as an unparseable tail-string). Print ONE compact line, sized
    // under the window, as the ONLY stdout line: headline total + the
    // heaviest queries (3-decimal secs, every failure always included)
    // greedily filled to budget; the complete map/passes/solo live in the
    // on-disk artifact named by the line's "artifact" field.
    val budget = 1900
    val compactHead =
      s"""{"metric":"total","value":${math.rint(total * 1000) / 1000},""" +
        s""""unit":"sec","protocol":"$protocol","n_queries":${names.size},""" +
        s""""n_failed":${failed.distinct.size},"contended":$allContended,""" +
        s""""artifact":"$outFile","sf":"$sfDir","queries":{"""
    val ranked =
      results.collect { case (k, Left(_)) => s"\"$k\":-1" } ++
        results.collect { case (k, Right(v)) => (k, v) }
          .sortBy { case (k, v) => (-v, k) }
          .map { case (k, v) => s"\"$k\":${math.rint(v * 1000) / 1000}" }
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = compactHead.length + 3 // closing "}}" + newline headroom
    for (e <- ranked if used + e.length + 1 <= budget) { kept += e; used += e.length + 1 }
    println(compactHead + kept.mkString(",") + "}}")
    //
    // PROTOCOL (the single source of claimed numbers): the on-disk artifact
    // records ALL N raw passes next to the min, plus the run mode — "suite"
    // (every declared query, interference included) vs "subset"
    // (SPARK_GRAFT_BENCH_ONLY, the solo protocol) — and, when solo re-runs
    // ran, their min beside the suite numbers. Any number quoted in a
    // commit message or doc must cite this artifact, mode included; a solo
    // number and a suite number are DIFFERENT measurements and the
    // artifact keeps them distinguishable instead of letting one silently
    // stand in for the other.
    val mode = if (only.isDefined) "subset" else "suite"
    def secOrNull(e: Either[String, Double]): String =
      e.fold(_ => "-1", _.toString)
    val passes = names.map(n =>
      s""""$n":[${allPasses.map(p => secOrNull(p(n))).mkString(",")}]""")
      .mkString("{", ",", "}")
    // getSystemLoadAverage returns -1.0 where unsupported — emit null so
    // the artifact distinguishes "unmeasurable" from a real reading
    def laJson(x: Double): String = if (x < 0) "null" else x.toString
    val loadJson = passLoads
      .map { case (a, b) => s"[${laJson(a)},${laJson(b)}]" }.mkString("[", ",", "]")
    val extJson = passExternal.map(laJson).mkString("[", ",", "]")
    val contJson = allPasses.indices.map(contended).mkString("[", ",", "]")
    val soloExtJson =
      if (solo.isEmpty) ""
      else soloExternal.map { case (k, v) => s""""$k":${laJson(v)}""" }
        .mkString(""","solo_external_load":{""", ",", "}") +
        soloContended.map { case (k, v) => s""""$k":$v""" }
          .mkString(""","solo_contended":{""", ",", "}") +
        soloGcSec.map { case (k, v) => s""""$k":$v""" }
          .mkString(""","solo_gc_sec":{""", ",", "}")
    val gcJson = passGcSec.mkString("[", ",", "]")
    val peakJson = passPeakHeapMb.mkString("[", ",", "]")
    val jvmContJson = allPasses.indices.map(jvmContended).mkString("[", ",", "]")
    val fullJson = json.dropRight(1) +
      s""","mode":"$mode","order":"$order","restart_every":$restartEvery,""" +
      s""""loadavg":$loadJson,"pass_external_load":$extJson,""" +
      s""""pass_gc_sec":$gcJson,"pass_peak_heap_mb":$peakJson,""" +
      s""""pass_jvm_contended":$jvmContJson,""" +
      s""""gc_bound":$gcBound,"heap_bound_mb":$heapBound,""" +
      s""""pass_contended":$contJson,"load_bound":$loadBound,""" +
      s""""forked_fresh":${sys.env.contains("SPARK_GRAFT_BENCH_FORKED")},""" +
      s""""contended":$allContended$soloExtJson,"passes":$passes}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile), fullJson.getBytes("UTF-8"))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
