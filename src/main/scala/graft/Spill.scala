package graft

import java.io.File
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

/** Session-temp MATERIALIZATION BARRIER storage.
  *
  * The third point of the cache-lifecycle triangle ([[Local]] collects tiny
  * results; persist+unpersist bounds loop state): when an operator must read
  * an EXPENSIVE upstream frame more than once, the frame is data-sized (so
  * [[Local]] is out), and the result is handed back to the caller (so a lazy
  * persist could never be released — the leak [[Local]]'s scaladoc
  * describes), the remaining correct move is the one every production
  * pipeline makes at 100 TB: materialize the intermediate to storage once
  * and re-scan the files. Spark's own shuffle files and AQE query-stage
  * boundaries are exactly this barrier; `Dataset.checkpoint` is the API
  * twin, but its files outlive the session unless cleaner conf is set and
  * its lineage cut hides the provenance from `explain`. An explicit parquet
  * spill keeps the lifecycle in THIS repo's hands: written once, read
  * cheaply (columnar, pushdown-able), deleted on JVM exit.
  *
  * Locally the directory lives in `java.io.tmpdir`; on a cluster the same
  * call shape would point at scratch space on the DFS — the barrier cost is
  * one write + k columnar reads of the (narrow) intermediate, which for a
  * per-doc counts table is bytes-per-row tiny next to re-running a corpus
  * tokenize per consumer.
  */
object Spill {

  private val dirs = new ConcurrentLinkedQueue[File]

  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach(deleteRecursively(_))
    }, "graft-spill-cleanup"))
    true
  }

  private def deleteRecursively(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** A fresh temp directory, deleted (recursively) on JVM exit. */
  def newDir(prefix: String): String = {
    require(hookInstalled)
    val d = Files.createTempDirectory(prefix).toFile
    dirs.add(d)
    d.getAbsolutePath
  }
}
