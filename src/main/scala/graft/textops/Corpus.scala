package graft.textops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators: the steps between "deduplicated
  * documents" and "training batches" — deterministic split assignment,
  * context-window sequence packing, stratified subsampling, and source
  * mixture construction. The reference stops at routed delivery
  * (MessageRouter.java:41-74 hands batches to sinks); these are the
  * consumer-side operations a training-data pipeline runs on what lands.
  *
  * Everything is keyed on content-independent hashes (`md5` of the
  * document id), so assignments are REPRODUCIBLE across runs, engines,
  * and re-partitioning — no RNG, no row order dependence. All expressions
  * are built-in and codegen'd; each op has an exact DuckDB twin in
  * [[graft.SparkEntry.oracleSql]].
  */
object Corpus {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** First hex byte of md5 of the id rendered as decimal — a uniform,
    * engine-portable bucket in [0, 256).
    */
  private def hexBucket(c: Column): Column = substring(md5(c.cast("string")), 1, 2)

  /** Train/val/test assignment by hash, ~90/5/5: the first md5 byte of
    * the doc id lands in [0,230) / [230,243) / [243,256), compared
    * lexicographically on the hex so both engines agree byte-for-byte.
    * A pure projection: no shuffle, no state, and a document keeps its
    * split forever regardless of what else enters the corpus — the
    * property that makes held-out sets trustworthy under incremental
    * ingest (new CDC batches can be split-assigned file-by-file).
    */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    splitAssignOver(docs(spark, dir), "doc_id")
      .select("doc_id", "split_bucket", "split").orderBy("doc_id")

  /** [[splitAssign]] over any keyed frame: adds `split_bucket`/`split`
    * columns derived from the KEY alone. Used conversation-level on the
    * engine's own exported transcripts — a conversation's split never
    * changes as later batches extend it, because the assignment reads
    * nothing but the key.
    */
  def splitAssignOver(df: DataFrame, keyCol: String): DataFrame = {
    val b = hexBucket(col(keyCol))
    df.withColumn("split_bucket", b)
      .withColumn("split",
        when(b < "e6", "train").when(b < "f3", "val").otherwise("test"))
  }

  /** Tokens per context window. */
  val PackWindow = 2048L

  /** Reference shard count for the ORACLE query (the DuckDB twin pins its
    * shard assignment, so the oracled entry passes this explicitly).
    */
  val PackShards = 16L

  /** Sequence packing: assign documents to fixed-size context windows
    * (bins of [[PackWindow]] tokens) by cumulative offset. Documents are
    * sharded by `doc_id % shards`, ordered by id within a shard, and a
    * document starts in the bin where its running offset lands —
    * single-pass, one shuffle, no driver state. A document may straddle
    * a bin boundary (the trainer's loader splits or pads there); at most
    * window-1 tokens per straddle are carried over PER SHARD, the
    * standard streaming-pack tradeoff vs. bin-packing's global sort.
    * Token counts are the chars/4 estimate capped at the window (an
    * over-long doc occupies its own bins).
    *
    * `shards = 0` (the default) sizes the shard count from the session's
    * `spark.sql.shuffle.partitions`: the running-offset window sorts one
    * shard per task, so a CONSTANT count would bottleneck the whole
    * corpus into that many tasks at any scale. Re-sharding changes which
    * bin a given document lands in (bins are shard-local by design) but
    * not the packing quality invariants — every bin except a shard's
    * last holds >= window tokens worth of starts, and the straddle
    * carry-over stays bounded by window-1 tokens per shard. Callers that
    * need a PINNED assignment (the oracle; a resumable packing job) pass
    * an explicit count.
    */
  def packSequences(spark: SparkSession, dir: String,
      window: Long = PackWindow, shards: Long = 0L): DataFrame = {
    val nShards =
      if (shards > 0L) shards
      else math.max(PackShards,
        spark.conf.get("spark.sql.shuffle.partitions").toLong)
    val tok = least(((col("n_chars") + 3L) / 4L).cast("long"), lit(window))
    val w = Window.partitionBy("pack_shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(spark, dir)
      .select(col("doc_id"), (col("doc_id") % nShards).as("pack_shard"),
        tok.as("n_tokens"))
      .withColumn("bin_id",
        ((sum("n_tokens").over(w) - col("n_tokens")) / window).cast("long"))
      .orderBy("doc_id")
  }

  /** Documents kept per stratum. */
  val SampleK = 20

  /** Stratified deterministic sample: the [[SampleK]] documents with the
    * smallest md5 in each language — a bottom-k-by-hash sketch per
    * stratum, i.e. a uniform sample that is STABLE under corpus growth
    * (a new document evicts at most one, at the boundary). One shuffle
    * on the stratum key; rank-within-group rides it. Skewed strata
    * (one language dominating a web corpus) sort only their own
    * partitions, and the hash sort key keeps AQE free to split them.
    */
  def sampleStratified(spark: SparkSession, dir: String,
      k: Int = SampleK): DataFrame = {
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs(spark, dir)
      .select(col("lang"), col("doc_id"),
        row_number().over(w).as("sample_rank"))
      .filter(col("sample_rank") <= k)
      .orderBy("lang", "sample_rank")
  }

  /** Benchmark decontamination: flag training documents whose word
    * 3-gram shingles substantially overlap a held-out evaluation set
    * (docs with `doc_id % 97 = 0` play the eval suite). The eval side is
    * tiny by construction — eval suites are curated — so its distinct
    * shingle set BROADCASTS and contamination scoring is a map-side
    * semi-join + one aggregate by doc: no corpus-sized shuffle beyond
    * the per-doc shingle count the pipeline computes anyway. A doc is
    * contaminated when at least half its shingles appear somewhere in
    * the eval set (catches verbatim inclusions and near-copies; the
    * threshold is a declared policy, not a tuned constant).
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    import graft.dedup.DocDedup
    val sh = DocDedup.shingles(spark, dir)
    val evalSet = sh.filter(col("doc_id") % 97 === 0).select("sh").distinct()
    val train = sh.filter(col("doc_id") % 97 =!= 0)
    // ONE pass over the training shingles: a broadcast LEFT join marks
    // eval-set membership per row (evalSet is distinct, so the join can't
    // duplicate), and a single aggregate produces both the total and the
    // shared count — the previous counts/shared double aggregate + outer
    // join evaluated the train sub-plan twice and shuffled twice.
    train.join(broadcast(evalSet.withColumn("__hit", lit(1))), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"), count(col("__hit")).as("n_shared"))
      .select(col("doc_id"), col("n_sh"), col("n_shared"),
        (col("n_shared") * 2 >= col("n_sh")).as("contaminated"))
      .orderBy("doc_id")
  }

  /** Mixture construction: subsample each source to a target weight so
    * the training mix hits declared proportions (here: even-numbered
    * sources kept at 100%, odd at 25% — the weights table is derived
    * from the source names so the op is scale-factor-agnostic). A row is
    * kept iff its per-(doc,source) hash byte clears the weight
    * threshold — deterministic admission, the distributed analogue of
    * weighted reservoir sampling. The weights dim is broadcast (it is
    * O(sources)); the verdict per row is a codegen'd expression, and the
    * output is the per-source audit (total vs kept vs target).
    */
  def mixture(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    // the no-trailing-digit case is EXPLICIT (kept at 100%): regexp_extract
    // returns '' there, and leaving it to cast-to-null fallthrough made the
    // policy engine-dependent (Spark's ''::int is null -> silently 25%,
    // DuckDB's errors) — unexpected source names must be deterministic and
    // oracle-consistent
    val num = regexp_extract(col("source"), "([0-9]+)$", 1)
    val rates = d.select(col("source")).distinct()
      .withColumn("weight_pct",
        when(num === "", 100)
          .when(num.cast("int") % 2 === 0, 100)
          .otherwise(25))
    val bucket = conv(hexBucket(concat(col("doc_id").cast("string"),
      col("source"))), 16, 10).cast("int")
    d.join(broadcast(rates), "source")
      .withColumn("kept", bucket * 100 < col("weight_pct") * 256)
      .groupBy("source", "weight_pct")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .select("source", "weight_pct", "n_total", "n_kept")
      .orderBy("source")
  }
}
