package org.apache.spark.deploy.graftshim

import org.apache.spark.SparkConf
import org.apache.spark.deploy.master.Master
import org.apache.spark.deploy.worker.Worker
import org.apache.spark.rpc.RpcEnv

/** A two-worker standalone mini-cluster whose workers register DISTINCT
  * hostname strings — `localhost` and `127.0.0.1`, both loopback.
  *
  * Why it exists: `TaskSetManager.dequeueSpeculativeTask` never places a
  * speculative copy on a host that already runs an attempt of the same task
  * (`!hasAttemptOnHost`), and Spark's own `local-cluster[n,c,m]` master
  * registers every worker under the one local hostname — so on a single
  * machine a speculative attempt can be *requested* but never *launched*.
  * Giving the second worker the string-distinct alias `127.0.0.1` satisfies
  * the same-host exclusion while still binding loopback, which lets
  * [[graft.tools.SpeculationCheck]] observe a real speculative TaskStart
  * end-to-end. Test harness only — never a production deployment shape.
  *
  * Lives under `org.apache.spark.deploy` for `private[deploy]` access to
  * the Master/Worker launchers (the same access Spark's own
  * `LocalSparkCluster` uses).
  */
object DualHostCluster {

  /** Start master + two single-host-alias workers; returns the master URL.
    * JVM-lifetime: the caller exits the process to tear down (executor
    * children die with their worker's shutdown hooks).
    */
  def start(conf: SparkConf, coresPerWorker: Int, memMbPerWorker: Int,
      workDirRoot: String): String = {
    val (masterRpc: RpcEnv, _, _) =
      Master.startRpcEnvAndEndpoint("localhost", 0, 0, conf)
    val masterUrl = s"spark://localhost:${masterRpc.address.port}"
    Seq(("localhost", 1), ("127.0.0.1", 2)).foreach { case (host, i) =>
      Worker.startRpcEnvAndEndpoint(host, 0, 0, coresPerWorker, memMbPerWorker,
        Array(masterUrl), s"$workDirRoot/worker$i", Some(i), conf, None)
    }
    masterUrl
  }
}
