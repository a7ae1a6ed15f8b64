package graft.util

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** Scratch-space helpers shared by the bench mains. Bench scratch prefers
  * tmpfs (/dev/shm): the sandbox's single virtio disk models neither a
  * cluster's object store nor its NVMe, and its co-tenant contention is
  * invisible to the CPU/memory-bandwidth calibration probes — one policy,
  * one place, so every bench surface (replay table, A/B tables, probes)
  * lands on the SAME storage class.
  */
object Scratch {

  /** Temp dir on tmpfs when available, system default otherwise. */
  def shmTemp(prefix: String): String = {
    val base = Paths.get("/dev/shm")
    (if (Files.isDirectory(base)) Files.createTempDirectory(base, prefix)
     else Files.createTempDirectory(prefix)).toString
  }

  /** A fresh scratch subdirectory on storage visible to EVERY executor
    * and the driver — for engine checkpoints whose write fans out across
    * executors and whose read-back must see all of it (the distributed
    * connected-components label table). Resolution order:
    *
    *   1. the `graft.scratch.dir` session conf (the operator's shared
    *      scratch root — object store / HDFS / NFS);
    *   2. the SparkContext checkpoint dir (already required to be shared
    *      storage by Spark's own RDD checkpointing contract);
    *   3. ONLY under a local master (`local[*]` / `local-cluster[...]` —
    *      one host, one filesystem): a java temp dir.
    *
    * On a multi-node cluster with neither configured this FAILS with the
    * configuration instruction instead of handing back a driver-local
    * `file:` path that every machine would resolve privately — executors
    * would scatter their partitions across their own disks and the
    * read-back would see only the driver-visible fragment.
    */
  def sharedScratch(spark: SparkSession, purpose: String): String = {
    val conf = spark.conf.getOption("graft.scratch.dir")
      .orElse(spark.sparkContext.getCheckpointDir)
    conf match {
      case Some(root) =>
        s"${root.stripSuffix("/")}/$purpose-${UUID.randomUUID()}"
      case None if spark.sparkContext.isLocal ||
          spark.sparkContext.master.startsWith("local-cluster") =>
        Files.createTempDirectory(s"graft-$purpose").toString
      case None =>
        throw new IllegalStateException(
          s"no shared scratch for '$purpose' on a multi-node cluster: set " +
            "the graft.scratch.dir session conf (or a SparkContext " +
            "checkpoint dir) to a path on shared storage — a driver-local " +
            "temp dir would scatter executor partitions across machines")
    }
  }

  /** Materialize a derived DataFrame to FRESH scratch parquet and read it
    * back — the in-query alternative to `.cache()` for sub-plans that a
    * self-join or multi-use query would otherwise re-execute (Spark's
    * ReuseExchange dedups only bit-identical physical sub-plans, and the
    * differently-aliased sides of a self-join are not — measured plans
    * showed 0 ReusedExchange and up to 62 repeated source scans in one
    * LSH query). Unlike persist/localCheckpoint it pins no executor
    * memory behind a long-lived session and leaks no cross-invocation
    * state: every call writes a brand-new directory, so a re-invoked
    * query recomputes from its inputs (the bench's cold-to-cold rule).
    * The write fans out across executors, so the directory comes from
    * [[sharedScratch]] (conf-resolved shared storage on a real cluster;
    * a temp dir under a local master).
    */
  /** Dirs created by [[materialize]], removed by a JVM shutdown hook: the
    * frames are tiny but a long-lived session would otherwise accumulate
    * one directory per materializing query invocation indefinitely.
    * (Deleting EAGERLY is not safe — the returned DataFrame is lazy and a
    * caller may act on it long after the next query ran. A service with
    * stricter retention needs should point `graft.scratch.dir` at managed
    * storage with its own GC.)
    */
  private val materialized =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      materialized.forEach(d =>
        try rmTree(d) catch { case _: Throwable => () })))
  }

  def materialize(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, purpose: String)
      : org.apache.spark.sql.DataFrame = {
    // under a local master with no configured scratch root, prefer tmpfs
    // (the bench-scratch policy above): these frames are small and
    // short-lived, and /tmp's disk latency is pure overhead on them;
    // configured/multi-node resolution is unchanged (sharedScratch)
    val local = spark.sparkContext.isLocal ||
      spark.sparkContext.master.startsWith("local-cluster")
    val dir =
      if (local && spark.conf.getOption("graft.scratch.dir").isEmpty &&
          spark.sparkContext.getCheckpointDir.isEmpty)
        shmTemp(s"graft-$purpose")
      else sharedScratch(spark, purpose)
    materialized.add(dir)
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  /** Recursive delete (missing dir is a no-op). */
  def rmTree(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
  }
}
