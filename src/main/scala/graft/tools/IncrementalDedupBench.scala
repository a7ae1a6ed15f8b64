package graft.tools

import graft.dedup.{DocDedup, SignatureIndex}
import graft.model.Model
import graft.ops.MergeInto
import graft.table.ChronicleTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Measures the claim behind the engine-maintained LSH index: per-batch
  * dedup cost against a GROWING corpus should track the BATCH, not the
  * corpus — the round-4 op re-banded the whole signature table per batch
  * (O(corpus)); the round-5 [[SignatureIndex.incrementalPairs]] joins a
  * persisted band index and verifies candidate ids only.
  *
  * Protocol: a document ChronicleTable starts at `baseDocs` documents
  * (index maintained), then `rounds` CDC batches of `batchDocs` land; per
  * round we time (a) the incremental per-batch dedup (index update +
  * incrementalPairs action) and (b) a FULL `lshPairs` recomputation over
  * the corpus from text. ~10% of new docs near-duplicate an earlier doc
  * so real pairs flow. One JSON line per round:
  * {"round":r,"corpus":N,"inc_sec":…,"full_sec":…,"pairs":…}
  * — `full_sec` grows with N; `inc_sec` should stay roughly flat.
  *
  * Usage: sbt -batch "runMain graft.tools.IncrementalDedupBench
  *   [baseDocs] [batchDocs] [rounds]"
  */
object IncrementalDedupBench {

  private val evSchema = StructType(Seq(
    StructField("lsn", LongType), StructField("op", StringType),
    StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
    StructField("role", StringType), StructField("text", StringType),
    StructField("tool", StringType), StructField("ts", TimestampType)))

  /** Deterministic document text: 60 tokens drawn from a per-doc seed;
    * every 10th doc instead copies doc-7-less-than-it with one token
    * changed (a planted near-dup).
    */
  private def text(id: Long): String = {
    val base = if (id % 10 == 3 && id >= 7) id - 7 else id
    val words = (0 until 60).map { k =>
      val h = (base * 1315423911L + k * 2654435761L) & 0x7fffffff
      s"w${h % 50000}"
    }
    (if (base == id) words
     else words.updated(31, s"v$id")).mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val baseDocs = if (args.length > 0) args(0).toInt else 40000
    val batchDocs = if (args.length > 1) args(1).toInt else 1000
    val rounds = if (args.length > 2) args(2).toInt else 4

    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.util.Sessions.tuneForEngine(SparkSession.builder()
        .master(s"local[$cores]")
        .appName("inc-dedup-bench")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = graft.util.Scratch.shmTemp("inc-dedup")
    val docsT = new ChronicleTable(s"$root/docs")
    val sigsT = new ChronicleTable(s"$root/sigs")
    val bandsT = new ChronicleTable(s"$root/bands")
    docsT.create(Model.physicalSchemaV1, 16)

    def merge(fromId: Long, n: Int, key: String): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          (fromId until fromId + n).map(i =>
            Row(i, "I", i.toString, 0, "doc", text(i), null,
              new java.sql.Timestamp(i))), 16),
        evSchema)
      MergeInto(spark, docsT, df, key, "bench", mergeOnRead = true)
    }

    // base corpus + initial index build (not timed per-batch: this is the
    // one-off backfill both strategies share)
    merge(0L, baseDocs, "docs#0")
    SignatureIndex.update(spark, docsT, sigsT, bandsT, numBuckets = 16)

    (1 to rounds).foreach { r =>
      val from = baseDocs.toLong + (r - 1).toLong * batchDocs
      merge(from, batchDocs, s"docs#$r")
      val corpus = from + batchDocs

      val t0 = System.nanoTime()
      val vBefore = sigsT.loadCurrent().version
      SignatureIndex.update(spark, docsT, sigsT, bandsT, numBuckets = 16)
      val pairs = SignatureIndex
        .incrementalPairs(spark, sigsT, bandsT, vBefore).count()
      val incSec = (System.nanoTime() - t0) / 1e9

      // the O(corpus) alternative: full re-dedup from text
      val t1 = System.nanoTime()
      val docsDf = docsT.read(spark).filter(!col(Model.deletedColumn))
        .select(col("conv_id").cast("long").as("doc_id"), col("text"))
      val sig = DocDedup.sigTableOf(docsDf)
      val b = DocDedup.bandSigs(sig)
      val l = b.select(col("doc_id").as("a"), col("band"), col("bandsig"))
      val rr = b.select(col("doc_id").as("b"), col("band"), col("bandsig"))
      val fullPairs = l.join(rr, Seq("band", "bandsig"))
        .filter(col("a") < col("b")).select("a", "b").distinct().count()
      val fullSec = (System.nanoTime() - t1) / 1e9

      println(f"""{"round":$r,"corpus":$corpus,"batch":$batchDocs,"inc_sec":$incSec%.2f,"full_sec":$fullSec%.2f,"inc_pairs":$pairs,"full_cand_pairs":$fullPairs}""")
    }
    graft.util.Scratch.rmTree(root)
  }
}
