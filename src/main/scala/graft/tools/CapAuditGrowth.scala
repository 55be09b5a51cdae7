package graft.tools

import org.apache.spark.sql.DataFrame

import graft.GraftSession
import graft.operators.{DedupOps, MultimodalOps, SimOps}

/** Growth readout THROUGH the declared cap-audit queries — the telemetry
  * proving its own worth: at each decade (1×/10×/100×) print every
  * family's (n_buckets, n_dropped, entries_dropped, pairs_kept,
  * pairs_forgone, hottest) row. The phash family's forgone share is the
  * number that silently went to 100% at ×100 under r11's raw-item
  * banding; a production run watching these rows sees the cliff coming
  * decades early instead of discovering it in recall.
  *
  * Usage: runMain graft.tools.CapAuditGrowth [sf01Dir] [x10Dir] [x100Dir]
  */
object CapAuditGrowth {

  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val x10 = if (args.length > 1) args(1) else "/tmp/graft_scale10"
    val x100 = if (args.length > 2) args(2) else "/tmp/graft_scale100"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
    def embs(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet")
    val audits: Seq[(String, String => DataFrame)] = Seq(
      "minhash" -> ((d: String) => DedupOps.minhashCapAudit(DedupOps.plantedCorpus(docs(d)))),
      "jaccard" -> ((d: String) => DedupOps.jaccardCapAudit(DedupOps.plantedCorpus(docs(d)))),
      "substring" -> ((d: String) => DedupOps.substringCapAudit(DedupOps.plantedSpliceCorpus(docs(d)))),
      "phash" -> ((d: String) => MultimodalOps.phashCapAudit(
        MultimodalOps.plantPhashCorpus(MultimodalOps.asMedia(docs(d))))),
      // r13: the declared q_cap_audit_neardup shape — autoSignBits derives
      // the key space from the distinct-rep count, so the forgone share
      // should stay roughly FLAT across decades (vs climbing at fixed bits)
      "neardup-auto" -> ((d: String) => {
        val planted = SimOps.plantedVectors(embs(d))
        val bits = SimOps.autoSignBits(planted)
        println(s"[capaudit] derived autoSignBits($d) = $bits")
        SimOps.nearDupCapAudit(planted, bits = bits)
      }),
      "neardup-fixed4" -> ((d: String) =>
        SimOps.nearDupCapAudit(SimOps.plantedVectors(embs(d)), bits = 4)))

    for ((label, dir) <- Seq("sf0.1" -> sf01, "x10" -> x10, "x100" -> x100);
         (fam, f) <- audits) {
      val r = f(dir).head()
      val kind = r.getString(0)
      println(s"[capaudit] $label $fam($kind): buckets=${r.getLong(1)} dropped=${r.getLong(2)} " +
        s"entries_dropped=${r.getLong(3)} pairs_kept=${r.getLong(4)} " +
        s"pairs_forgone=${r.getLong(5)} hottest=${r.getLong(6)}")
    }
    spark.stop()
  }
}
