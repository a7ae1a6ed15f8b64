package graft.util

import java.nio.file.{Files, Paths}
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

  /** Recursive delete (missing dir is a no-op). */
  def rmTree(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
  }
}
