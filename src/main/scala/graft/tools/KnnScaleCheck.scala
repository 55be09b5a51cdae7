package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.SimOps

/** Growth-law probe for [[SimOps.knnGraph]] — the r11 autopsy of the x100
  * rehearsal's 106.7x wall ratio on `q_knn_graph`, re-recorded in r12
  * THROUGH the declared entry after occupancy-preserving centroid sizing
  * became the default shape.
  *
  * Through round 11 the declared query pinned 16 IVF cells (centroids
  * vec_id 100..115); under ScaleGen x100 the corpus grows 100x over the
  * SAME 16 cells, so per-cell occupancy grows 100x and the in-cell pairing
  * volume O(Σ cell²) grows ~10,000x — the measured ~107x wall was the
  * engine absorbing a 10,000x pair blowup, not linear-work overhead.
  *
  * The scale discipline is corpus-derived nlist. Round 12 measured BOTH
  * candidate rules through the operator: constant occupancy (nlist = N/64,
  * [[SimOps.hashCentroidPred]]) kills the pair blowup but leaves
  * ASSIGNMENT quadratic — O(N·nlist) = O(N²/64) similarity evaluations —
  * even after [[SimOps.cellArgmax]] removed the window shuffle (28.6 s at
  * ×100); √N sizing ([[SimOps.sqrtCentroidPred]], the faiss nlist ∝ √N
  * guideline) balances assignment O(N·√N) against pairing O(N·√N) for
  * total O(N^1.5), and is the DECLARED shape since round 12. This probe
  * measures the declared √N rule at 1x and 100x, plus the constant-64
  * and fixed-16-cell rules at 100x as the two counterexamples.
  *
  * Usage: runMain graft.tools.KnnScaleCheck [scale100Dir] [sf01Dir]
  */
object KnnScaleCheck {

  def main(args: Array[String]): Unit = {
    val x100 = args.headOption.getOrElse("/tmp/graft_scale100")
    val sf01 = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // MEGACELLS mode (r16): the ">1M-centroid regime" claim as a measured
    // row instead of an asserted one. Synthesizes `SPARK_GRAFT_MEGA_NLIST`
    // (default 1M) deterministic 64-dim centroids (the corpus tables top
    // out at ~61k vectors ×100 — no real table reaches 1M distinct
    // centroid vectors) and runs BOTH assignment paths over the ×100
    // corpus. Two invocations tell the story:
    //   - default heap: both complete → the wall ratio is the compute
    //     claim (~2·√nlist vs nlist sims per row);
    //   - executor-sized heap (java -Xmx4g, a standard executor memory):
    //     the flat fold's single collected array (~300 B × nlist ≈ 300 MB
    //     at 1M, plus agg/broadcast/deserialized copies) dies where hier's
    //     O(√nlist·d) per-task blocks don't — the memory claim. Hier runs
    //     FIRST so its row is on record before a flat OOM can take the
    //     JVM down.
    if (args.contains("megacells")) {
      val nlist = sys.env.getOrElse("SPARK_GRAFT_MEGA_NLIST", "1000000").toLong
      val emb = spark.read.parquet(s"$x100/embeddings.parquet")
      val n = SimOps.normalized(emb, "vec_id", "embedding")
      val cents = spark.range(nlist).select(
        col("id").as("c_id"),
        transform(sequence(lit(0), lit(63)),
          j => (pmod(hash(col("id"), j), lit(997)) + lit(1)).cast("float")).as("ce"))
        .withColumn("cn", sqrt(SimOps.dot(col("ce"), col("ce"))))
      val heapMib = Runtime.getRuntime.maxMemory() >> 20
      // a flat run at 1M cells projects to HOURS (the 20k-cell row's
      // per-sim rate × 50) — the watchdog bounds the demonstration: a
      // cancelled run is recorded as ">Ns, cancelled", which IS the
      // result (the operator does not finish in any budget a user has)
      val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_MEGA_TIMEOUT", "600").toLong
      // SPARK_GRAFT_MEGA_C2SHIER=1: two-level the centroid→supercell
      // stage too (SimOps.cellArgmaxHier c2sHier) — the fix for the
      // nlist=8M regime where exact c2s (nlist·√nlist sims) dominated at
      // 1259.9 s (SKEW r16): nlist·~2∜nlist instead
      val c2sHier = sys.env.get("SPARK_GRAFT_MEGA_C2SHIER").contains("1")
      def mega(hier: Boolean): Unit = {
        val label = if (hier) s"two-level cellArgmaxHier${if (c2sHier) " (c2s hier)" else ""}"
          else "flat cellArgmax        "
        val head = s"[knnscale] x100 assignment-only @ nlist=$nlist (synth), heap=${heapMib}m, $label:"
        try {
          val t0 = System.nanoTime()
          val action = new Thread(() =>
            (if (hier) SimOps.cellArgmaxHier(n, cents, "vec_id", c2sHier = c2sHier)
             else SimOps.cellArgmax(n, cents, "vec_id"))
              .write.format("noop").mode("overwrite").save())
          @volatile var failed: Throwable = null
          action.setDaemon(true)
          action.setUncaughtExceptionHandler((_, e) => failed = e)
          action.start()
          action.join(timeoutSec * 1000)
          if (action.isAlive) {
            spark.sparkContext.cancelAllJobs()
            action.join(30000)
            println(s"$head >${timeoutSec} s, cancelled (did not finish)")
          } else if (failed != null) throw failed
          else {
            val t = (System.nanoTime() - t0) / 1e9
            println(f"$head $t%.1f s (1 run)")
          }
        } catch {
          case e: Throwable =>
            val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
              .toSeq.last
            println(s"$head FAILED ${root.getClass.getSimpleName}: " +
              String.valueOf(root.getMessage).take(300))
        }
        // a flat-leg driver OOM can kill the JVM before a buffered stdout
        // drains (redirected stdout is block-buffered) — flush so the row
        // just printed survives whatever the NEXT leg does to the process
        System.out.flush()
      }
      // SPARK_GRAFT_MEGA_ONLY=hier|flat reruns one leg (e.g. the 8M hier
      // completion row needs a longer watchdog than flat's fast
      // structural failure)
      val legs = sys.env.getOrElse("SPARK_GRAFT_MEGA_ONLY", "both")
      if (legs != "flat") mega(hier = true)
      if (legs != "hier") mega(hier = false)
      spark.stop()
      return
    }

    // MEGATRAIN mode (r17): centroid TRAINING at megacell scale — the
    // megacells rows assign against SYNTHETIC centroids; this runs one
    // full Lloyd round (SimOps.refineCentroids: hier assignment + the
    // integer bp-average update) at SPARK_GRAFT_MEGA_NLIST over the ×100
    // corpus, the first time the hier assignment runs INSIDE the training
    // loop it exists to enable. SPARK_GRAFT_MEGA_C2SHIER=1 two-levels the
    // centroid→supercell stage as well (mandatory past ~4M cells, where
    // exact c2s dominates — SKEW r16's 8M row).
    if (args.contains("megatrain")) {
      val nlist = sys.env.getOrElse("SPARK_GRAFT_MEGA_NLIST", "1000000").toLong
      val c2sHier = sys.env.get("SPARK_GRAFT_MEGA_C2SHIER").contains("1")
      // SPARK_GRAFT_MEGA_ROUNDS > 1 (r18): run Lloyd rounds back to back,
      // printing per-round wall + moved-centroid count — the CONVERGENCE
      // receipt (moved plateaus/decays) the r17 single-round row lacked.
      // Each round's output is localCheckpointed so round r+1 reassigns
      // against materialized centroids, not an r-deep lazy lineage.
      val rounds = sys.env.getOrElse("SPARK_GRAFT_MEGA_ROUNDS", "1").toInt
      val emb = spark.read.parquet(s"$x100/embeddings.parquet")
      val n = SimOps.normalized(emb, "vec_id", "embedding")
      val cents = spark.range(nlist).select(
        col("id").as("c_id"),
        transform(sequence(lit(0), lit(63)),
          j => (pmod(hash(col("id"), j), lit(997)) + lit(1)).cast("float")).as("ce"))
        .withColumn("cn", sqrt(SimOps.dot(col("ce"), col("ce"))))
      val c2sTag = if (c2sHier) " + c2s hier" else ""
      var c = cents
      for (r <- 1 to rounds) {
        val t0 = System.nanoTime()
        val refined = SimOps.refineCentroids(n, c, iters = 1,
          hier = true, c2sHier = c2sHier).localCheckpoint()
        // the round's own aggregate is the action; count moved centroids
        // so the row carries evidence the update actually rebuilt cells
        val moved = refined.join(c.select(col("c_id"), col("ce").as("ce0")), "c_id")
          .filter(col("ce") =!= col("ce0")).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[knnscale] x100 LLOYD ROUND $r/$rounds @ nlist=$nlist (synth init, hier assign$c2sTag): $t%.1f s, $moved centroids moved")
        System.out.flush()
        c = refined
      }
      spark.stop()
      return
    }

    // TRAINEDRECALL mode (r18): the quality receipt for megacell
    // TRAINING — the megatrain rows prove the hier (and c2s-hier) Lloyd
    // loop RUNS at nlist ≥ 1M; this measures whether training THROUGH
    // the two-level assignment degrades the index it trains. Fixture
    // scale (sf0.1, √N centroid seeds so the hier path has real blocks):
    // the same seeds are Lloyd-refined three ways — exact assignment,
    // hier assignment, hier + c2s-hier — and each trained index is
    // probed IDENTICALLY (flat exact probe, nProbe = 4) against one
    // brute-force truth, so the recall delta prices the training-side
    // approximation alone (the SEARCH-side price is q_recall_audit_
    // ivf_hier's sweep).
    if (args.contains("trainedrecall")) {
      val iters = sys.env.getOrElse("SPARK_GRAFT_TRAIN_ITERS", "2").toInt
      val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
      val n = SimOps.normalized(emb, "vec_id", "embedding")
      val queryPred = col("vec_id") < 50
      val k = 10
      val nq = emb.filter(queryPred).count()
      val truth = SimOps.bruteTopK(emb, queryPred, k)
        .select(col("q_id"), col("vec_id"))
      val cents0 = n.filter(SimOps.sqrtCentroidPred(emb))
        .select(col("vec_id").as("c_id"), col("e").as("ce"), col("nrm").as("cn"))
      val nlist0 = cents0.count()
      def recallOf(label: String, hier: Boolean, c2sHier: Boolean): Unit = {
        val trained = SimOps.refineCentroids(n, cents0, iters = iters,
          hier = hier, c2sHier = c2sHier)
        val approx = SimOps.ivfProbe(n, trained, queryPred, k,
          nProbe = 4, idCol = "vec_id")
          .select(col("q_id"), col("vec_id"))
        val hits = approx.join(truth, Seq("q_id", "vec_id")).count()
        println(f"[knnscale] trained-recall sf0.1 @ nlist=$nlist0 iters=$iters ($label): hits=$hits/${nq * k} recall_bp=${hits * 10000 / (nq * k)}")
        System.out.flush()
      }
      recallOf("exact-assign Lloyd     ", hier = false, c2sHier = false)
      recallOf("hier-assign Lloyd      ", hier = true, c2sHier = false)
      recallOf("hier + c2s-hier Lloyd  ", hier = true, c2sHier = true)
      spark.stop()
      return
    }

    // MEGASTREAM mode (r18, the r17 stretch): state-store receipts for
    // the streaming hier twin at megacell scale — the "untouched keys
    // are not rewritten" checkpoint-cost claim (StreamingOps
    // cellNearDupStreamHier doc) as measured numbers. Builds a
    // hierStreamIndex from SPARK_GRAFT_MEGA_NLIST synthetic centroids as
    // a DATASET (the snapshot never exists as a driver Seq), drives the
    // stream with two micro-batches at different corpus deltas
    // (SPARK_GRAFT_MEGA_B1/B2 arrivals, default 2000/100 rows of the
    // ×100 embeddings), and prints per batch: wall, the state operator's
    // numRowsUpdated (touched supercell keys) vs numRowsTotal (all
    // keys), and the checkpoint directory's byte GROWTH (the HDFS state
    // store writes per-batch .delta files holding only updated keys, so
    // growth IS the per-batch checkpoint cost). Expectation: batch 1
    // pays the full block-state write once (every key), batch 2 writes
    // only its touched keys — bytes ∝ arrivals, not nlist.
    if (args.contains("megastream")) {
      import spark.implicits._
      import graft.streaming.{EmbedItem, StreamingOps}
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val nlist = sys.env.getOrElse("SPARK_GRAFT_MEGA_NLIST", "1000000").toLong
      val b1 = sys.env.getOrElse("SPARK_GRAFT_MEGA_B1", "2000").toInt
      val b2 = sys.env.getOrElse("SPARK_GRAFT_MEGA_B2", "100").toInt
      val centsDs = spark.range(nlist).select(
        col("id").as("_1"),
        transform(sequence(lit(0), lit(63)),
          j => (pmod(hash(col("id"), j), lit(997)) + lit(1)).cast("float")).as("_2"))
        .as[(Long, Seq[Float])]
      val tIdx0 = System.nanoTime()
      val idx = StreamingOps.hierStreamIndex(centsDs)
      println(f"[knnscale] megastream @ nlist=$nlist: index built " +
        f"(${idx.sups.length} supercenters) in ${(System.nanoTime() - tIdx0) / 1e9}%.1f s")
      System.out.flush()
      val arrivals = spark.read.parquet(s"$x100/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
        .limit(b1 + b2).as[(Long, Seq[Float])].collect()
        .map { case (id, e) => EmbedItem(id, e) }
      val ckpt = java.nio.file.Files.createTempDirectory("megastream_ckpt")
      def dirBytes(p: java.nio.file.Path): Long = {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EmbedItem]
      val q = StreamingOps.cellNearDupStreamHier(input.toDS(), idx, 4000, 64)
        .writeStream.format("noop").outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        var prevBytes = 0L
        for ((batch, bi) <- Seq(arrivals.take(b1), arrivals.drop(b1)).zipWithIndex) {
          val t0 = System.nanoTime()
          input.addData(batch.toSeq)
          q.processAllAvailable()
          val t = (System.nanoTime() - t0) / 1e9
          val bytes = dirBytes(ckpt)
          val so = q.lastProgress.stateOperators.headOption
          val (tot, upd) = so.map(s => (s.numRowsTotal, s.numRowsUpdated))
            .getOrElse((-1L, -1L))
          println(f"[knnscale] megastream batch ${bi + 1} (${batch.length} arrivals): " +
            f"$t%.1f s, touched keys $upd of $tot, checkpoint +${(bytes - prevBytes) >> 20} MiB " +
            f"(total ${bytes >> 20} MiB)")
          System.out.flush()
          prevBytes = bytes
        }
      } finally {
        q.stop()
        spark.stop()
      }
      return
    }

    // FORGETSTREAM mode (r18): state-store receipts for the takedown
    // registry twin — the claims to price: state rows ∝ DISTINCT content
    // (not arrival volume), redelivery touches keys without growing
    // state, and a takedown batch's checkpoint delta ∝ takedowns, never
    // the corpus (the megastream "untouched keys are not rewritten"
    // discipline applied to the forget registry).
    if (args.contains("forgetstream")) {
      import spark.implicits._
      import graft.streaming.{ForgetEvent, StreamingOps}
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val b1 = sys.env.getOrElse("SPARK_GRAFT_FORGET_B1", "50000").toInt
      val redeliver = sys.env.getOrElse("SPARK_GRAFT_FORGET_REDELIVER", "1000").toInt
      val tombEvery = sys.env.getOrElse("SPARK_GRAFT_FORGET_EVERY", "100").toLong
      val rows = spark.read.parquet("/tmp/graft_scale10/documents.parquet")
        .select(col("doc_id"), col("text")).limit(b1)
        .as[(Long, String)].collect()
      val ingests = rows.map { case (id, t) => ForgetEvent("ingest", id, t) }
      val tombs = rows.filter(_._1 % tombEvery == 3)
        .map { case (id, t) => ForgetEvent("forget", id, t) }
      val ckpt = java.nio.file.Files.createTempDirectory("forgetstream_ckpt")
      def dirBytes(p: java.nio.file.Path): Long = {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ForgetEvent]
      val q = StreamingOps.forgetStream(input.toDS(), maxMembers = 64)
        .writeStream.format("noop").outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        var prevBytes = 0L
        val batches = Seq(
          ("ingest", ingests.toSeq),
          ("redeliver", ingests.take(redeliver).toSeq),
          ("takedown", tombs.toSeq))
        for (((label, batch), bi) <- batches.zipWithIndex) {
          val t0 = System.nanoTime()
          input.addData(batch)
          q.processAllAvailable()
          val t = (System.nanoTime() - t0) / 1e9
          val bytes = dirBytes(ckpt)
          val so = q.lastProgress.stateOperators.headOption
          val (tot, upd, rem) = so
            .map(s => (s.numRowsTotal, s.numRowsUpdated, s.numRowsRemoved))
            .getOrElse((-1L, -1L, -1L))
          println(f"[knnscale] forgetstream batch ${bi + 1} $label%-9s " +
            f"(${batch.length} events): $t%.1f s, " +
            f"updated $upd / removed $rem of $tot keys, " +
            f"checkpoint +${(bytes - prevBytes) >> 10} KiB (total ${bytes >> 10} KiB)")
          System.out.flush()
          prevBytes = bytes
        }
      } finally {
        q.stop()
        spark.stop()
      }
      return
    }

    // DEGRADEHANDOFF mode (r19): execute the capped registry's degrade
    // contract END TO END — the claim the docs and unit pins make
    // ("takedowns exhausting the tracked set hand the key to the batch
    // pass") run as one composed pipeline: hot content ingested past
    // maxMembers, takedowns exhaust every tracked set on half the
    // contents (emitting `degraded`), the batch pass
    // (DedupOps.exactDedup over survivors) finishes exactly those keys,
    // and the COMPOSED rep table (stream reps for live keys + batch reps
    // for degraded keys) must equal the uncapped truth key-for-key.
    if (args.contains("degradehandoff")) {
      import spark.implicits._
      import graft.streaming.{ForgetEvent, ForgetEventRow, StreamingOps}
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val nContent = sys.env.getOrElse("SPARK_GRAFT_HANDOFF_CONTENTS", "200").toInt
      val copies = sys.env.getOrElse("SPARK_GRAFT_HANDOFF_COPIES", "64").toInt
      val cap = sys.env.getOrElse("SPARK_GRAFT_HANDOFF_CAP", "8").toInt
      val texts = spark.read.parquet(s"$sf01/documents.parquet")
        .select(col("text")).limit(nContent).as[String].collect()
      def docId(c: Int, i: Int): Long = c.toLong * copies + i
      val allDocs = for ((t, c) <- texts.zipWithIndex; i <- 0 until copies)
        yield (docId(c, i), t)
      val ingests = allDocs.map { case (id, t) => ForgetEvent("ingest", id, t) }
      // takedowns on the EVEN contents: exactly the `cap` smallest ids —
      // the whole tracked set — so the last one must degrade (untracked
      // copies alive, registry cannot re-elect)
      val tombs = for ((t, c) <- texts.zipWithIndex if c % 2 == 0; i <- 0 until cap)
        yield ForgetEvent("forget", docId(c, i), t)
      val tombIds = tombs.map(_.doc_id).toSet
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ForgetEvent]
      val q = StreamingOps.forgetStream(input.toDS(), maxMembers = cap)
        .writeStream.format("memory").queryName("handoff")
        .outputMode("update").start()
      val t0 = System.nanoTime()
      val evs = try {
        input.addData(ingests.toSeq); q.processAllAvailable()
        input.addData(tombs.toSeq); q.processAllAvailable()
        spark.table("handoff").as[ForgetEventRow].collect().toSeq
      } finally q.stop()
      val tStream = (System.nanoTime() - t0) / 1e9
      val degradedFps = evs.filter(_.action == "degraded").map(_.fp_md5).toSet
      // live keys: last audit rep per fp not handed off
      val streamReps = evs.groupBy(_.fp_md5).collect {
        case (fp, es) if !degradedFps.contains(fp) => fp -> es.last.rep.get
      }
      // the batch pass finishes the degraded keys: exactDedup over the
      // SURVIVING docs, restricted to the handed-off fingerprints
      val t1 = System.nanoTime()
      val survivors = spark.createDataset(
        allDocs.filterNot(d => tombIds.contains(d._1)).toIndexedSeq)
        .toDF("doc_id", "text")
      val batchAll = graft.operators.DedupOps.exactDedup(survivors)
        .select(col("fp_md5"), col("keep_id")).as[(String, Long)].collect()
        .toMap
      val tBatch = (System.nanoTime() - t1) / 1e9
      val batchReps = batchAll.filter { case (fp, _) => degradedFps.contains(fp) }
      val composed = streamReps ++ batchReps
      // uncapped truth: the batch rule over every surviving doc
      val ok = composed == batchAll
      println(f"[knnscale] degrade-handoff: contents=$nContent copies=$copies cap=$cap " +
        f"handed_off=${degradedFps.size} live=${streamReps.size} " +
        f"stream $tStream%.1f s + batch finish $tBatch%.1f s, " +
        f"composed==uncapped_truth: $ok (${composed.size} keys)")
      System.out.flush()
      require(ok, "degrade handoff composition diverged from the uncapped truth")
      spark.stop()
      return
    }

    // HIERRECALL mode (r16): the q_recall_audit_ivf_hier curve at the
    // decades — recall@10 of hier IVF search vs brute force at
    // superProbes 1/2 (nProbe 4, the declared fixture cells 100..115).
    // Count-based rows (safe under CPU contention, the CapAuditGrowth
    // rule); the SKEW record for the serving-tuning claim.
    if (args.contains("hierrecall")) {
      val x10 = "/tmp/graft_scale10"
      for ((label, dir) <- Seq("sf0.1" -> sf01, "x10" -> x10, "x100" -> x100)) {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val rows = SimOps.ivfRecallSweepHier(emb,
          queryPred = col("vec_id") < 5,
          centroidPred = col("vec_id").between(100, 115)).collect()
        println(s"[knnscale] hier-recall $label: " + rows.map(r =>
          s"sp=${r.getInt(0)} hits=${r.getLong(1)} recall_bp=${r.getLong(2)}")
          .mkString(", "))
      }
      spark.stop()
      return
    }

    def once(
        dir: String,
        pred: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column,
        probes: Int = 1): Double = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val p = pred(emb)
      val t0 = System.nanoTime()
      SimOps.knnGraph(emb, centroidPred = p, probes = probes)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def run(
        label: String, dir: String,
        pred: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column,
        probes: Int = 1): Unit = {
      val t = math.min(once(dir, pred, probes), once(dir, pred, probes))
      println(f"[knnscale] $label: $t%.1f s (min of 2)")
    }
    val declared = (emb: org.apache.spark.sql.DataFrame) => SimOps.sqrtCentroidPred(emb)
    val const64 = (_: org.apache.spark.sql.DataFrame) => SimOps.hashCentroidPred()
    val fixed16 = (_: org.apache.spark.sql.DataFrame) => col("vec_id").between(100, 115)

    once("/root/testdata/sf0.001", declared) // JIT/codegen warm-up
    run("sf0.1 DECLARED sqrt-N nlist (faiss rule)", sf01, declared)
    run("x100  DECLARED sqrt-N nlist (faiss rule)", x100, declared)
    run("x100  n/64 cells (constant occupancy — assignment quadratic)", x100, const64)
    run("x100    16 cells (fixed nlist — occupancy x100)", x100, fixed16)
    // probes=4 through the cellArgTopP fold (r13): before the fold, this
    // setting rode cellRank's O(N·nlist) window shuffle
    run("x100  DECLARED sqrt-N nlist, probes=4 (cellArgTopP fold)", x100, declared, probes = 4)

    // r13: ASSIGNMENT-ONLY walls, flat fold vs two-level quantizer — the
    // cellArgmaxHier FLOP claim (~2·√nlist vs nlist sims per row) as a
    // measured row; pairing is excluded so the delta is pure assignment
    def assignOnce(
        dir: String, hier: Boolean,
        pred: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column = declared): Double = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = SimOps.normalized(emb, "vec_id", "embedding")
      val cents = n.filter(pred(emb))
        .select(col("vec_id").as("c_id"), col("e").as("ce"), col("nrm").as("cn"))
      val t0 = System.nanoTime()
      (if (hier) SimOps.cellArgmaxHier(n, cents, "vec_id")
       else SimOps.cellArgmax(n, cents, "vec_id"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (hier <- Seq(false, true)) {
      val t = math.min(assignOnce(x100, hier), assignOnce(x100, hier))
      val label = if (hier) "two-level cellArgmaxHier" else "flat cellArgmax        "
      println(f"[knnscale] x100  assignment-only, $label: $t%.1f s (min of 2)")
    }
    // r14: the √nlist law AT A NLIST THAT MATTERS (≥ 10k): the constant-
    // occupancy rule on the x100 corpus gives nlist = N/64 ≈ 31k cells.
    // Flat assignment is O(N·nlist) sims; hier is O(N·~2√nlist) — FLOP
    // ratio ≈ √nlist/2 ≈ 88 asymptotically, bounded in practice by the
    // shuffle/scan overheads both paths share.
    for (hier <- Seq(false, true)) {
      val t = math.min(
        assignOnce(x100, hier, const64), assignOnce(x100, hier, const64))
      val label = if (hier) "two-level cellArgmaxHier" else "flat cellArgmax        "
      println(f"[knnscale] x100  assignment-only @ nlist=N/64 (~31k), $label: $t%.1f s (min of 2)")
    }
    spark.stop()
  }
}
