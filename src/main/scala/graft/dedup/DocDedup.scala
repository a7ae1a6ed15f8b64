package graft.dedup

import graft.textops.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Document deduplication operators: exact, n-gram Jaccard, MinHash/LSH and
  * SimHash. All hashing is md5-derived so the DuckDB oracle computes the
  * identical values; all arithmetic stays in exact integers.
  *
  * Scale notes: every operator here is a shuffle-on-shingle/signature
  * inverted-index pattern — the candidate-pair join never materializes the
  * quadratic doc×doc space, and frequent shingles are dropped by a document
  * -frequency cap (the standard stop-shingle trick) so no reducer sees a
  * hot shingle's full pair blow-up.
  */
object DocDedup {

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Exact dedup by content hash: canonical id = min doc_id per md5(text). */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("h")
    docs(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("canon_id", min("doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("canon_id"), col("group_size"),
        (col("doc_id") =!= col("canon_id")).as("is_dup"))
      .orderBy("doc_id")
  }

  /** Distinct word 3-gram shingles per document. */
  def shingles(spark: SparkSession, dir: String): DataFrame =
    shinglesOf(docs(spark, dir))

  /** [[shingles]] over any (doc_id, text) frame — the building block the
    * ENGINE-MAINTAINED signature index ([[SignatureIndex]]) runs on the
    * changelog's changed documents instead of a parquet directory.
    */
  def shinglesOf(docsDf: DataFrame): DataFrame = {
    val toks = TextOps.tokensCol(col("text"))
    docsDf
      .select(col("doc_id"), toks.as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("ws")) - 3)).as("i"), col("ws"))
      .select(col("doc_id"),
        concat_ws(" ", col("ws")(col("i")), col("ws")(col("i") + 1),
          col("ws")(col("i") + 2)).as("sh"))
      .distinct()
  }

  /** Document-frequency cap for candidate generation (stop-shingle trick):
    * shingles appearing in more than this many docs generate no candidate
    * pairs. Mirrored exactly in the oracle SQL.
    */
  val maxShingleDf = 50

  /** Near-duplicate pairs by exact n-gram Jaccard over an inverted-index
    * candidate join: pairs sharing >=1 rare shingle, verified with the true
    * Jaccard over the full shingle sets, threshold 0.2. The scalable shape:
    * shuffle is by shingle, never doc×doc.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.2): DataFrame = {
    // Measured verdict (r06): the shingle sub-plan IS re-evaluated by every
    // aliased consumer (0 ReusedExchange), but recomputing it is cheaper
    // than any alternative tried — scratch materialization (1.5s -> 2.6s:
    // the extra write job + single-file scans cost more than four cheap
    // re-evaluations) and a collect_list + interpreted-HOF combination
    // expansion (-> 3.0s: ObjectHashAggregate plus per-row interpreted
    // array work beats codegen'd joins only on paper). The original
    // inverted-index join shape stands — at 100 TB the df cap, not the
    // sub-plan evaluation count, is what bounds it.
    val sh = shingles(spark, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val rare = sh.join(
      sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxShingleDf && col("df") >= 2)
        .select("sh"),
      Seq("sh"), "left_semi")
    val a = rare.select(col("doc_id").as("a"), col("sh"))
    val b = rare.select(col("doc_id").as("b"), col("sh"))
    val pairs = a.join(b, Seq("sh")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
    pairs
      .join(broadcast(sizes.withColumnRenamed("doc_id", "a")
        .withColumnRenamed("n_sh", "na")), Seq("a"))
      .join(broadcast(sizes.withColumnRenamed("doc_id", "b")
        .withColumnRenamed("n_sh", "nb")), Seq("b"))
      .withColumn("jacc_e4", round(col("shared").cast("double") * 10000 /
        (col("na") + col("nb") - col("shared"))).cast("long"))
      .filter(col("jacc_e4") >= (threshold * 10000).toLong)
      .select("a", "b", "shared", "jacc_e4")
      .orderBy("a", "b")
  }

  /** md5-derived 60-bit integer base hash — computable identically in
    * DuckDB via ('0x' || substr(md5(s), 1, 15))::bigint.
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  val minhashPerms = 16
  val minhashPrime = 1000003L

  /** MinHash signatures: perm p of doc d = min over shingles s of
    * ((2p+3) * (md5Long(s) mod P) + (5p+7)) mod P. Exact integer math, no
    * overflow (35 * 1e6 << 2^63), so the oracle reproduces it bit-for-bit.
    * Output: one row per (doc_id, perm), UNORDERED — this is the building
    * block every LSH op composes on; adding a global orderBy here would
    * drag a full sort+range-exchange into each of them (Catalyst cannot
    * eliminate a sort under collect_list: that aggregate is
    * order-sensitive even though bandSigs re-sorts).
    */
  def sigTable(spark: SparkSession, dir: String): DataFrame =
    sigTableOf(docs(spark, dir))

  /** [[sigTable]] over any (doc_id, text) frame. */
  def sigTableOf(docsDf: DataFrame): DataFrame = sigRowsOf(sigWideOf(docsDf))

  /** WIDE MinHash signatures: one row per doc with all [[minhashPerms]]
    * permutation minima as columns (m0..m15). ONE hash aggregate over the
    * per-(doc, shingle) rows with 16 fixed-width codegen'd min buffers —
    * the simhash 32-column trick — where the row form exploded every
    * shingle x16 BEFORE its shuffle (16x the shuffled rows for the same
    * information). The arithmetic is identical, so [[sigRowsOf]] of this
    * frame is bit-for-bit [[sigTable]].
    */
  def sigWideOf(docsDf: DataFrame): DataFrame = {
    val mins = (0 until minhashPerms).map(p =>
      min((col("base") * (2 * p + 3) + (5 * p + 7)) % minhashPrime)
        .as(s"m$p"))
    shinglesOf(docsDf)
      .withColumn("base", md5Long(col("sh")) % minhashPrime)
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
  }

  /** Unpivot a [[sigWideOf]] frame to the (doc_id, perm, minhash) row form
    * every verification join consumes — the x16 expansion happens AFTER
    * the aggregate, on one row per document.
    */
  def sigRowsOf(wide: DataFrame): DataFrame =
    wide.select(col("doc_id"),
        posexplode(array((0 until minhashPerms).map(p => col(s"m$p")): _*)))
      .select(col("doc_id"), col("pos").cast("long").as("perm"),
        col("col").as("minhash"))

  /** Banded signatures straight from a [[sigWideOf]] frame: band b's
    * signature is the comma-join of m(4b)..m(4b+3) — the same
    * perm-ordered string [[bandSigs]] builds through its sort_array +
    * collect_list aggregate, with NO aggregation at all here (the wide
    * row already holds every permutation).
    */
  def bandsOfWide(wide: DataFrame): DataFrame =
    wide.select(col("doc_id"),
        posexplode(array((0 until minhashPerms / 4).map(b =>
          concat_ws(",", (0 until 4).map(i =>
            col(s"m${4 * b + i}").cast("string")): _*)): _*)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bandsig"))

  /** [[sigTable]] ordered for the oracle dump. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    sigTable(spark, dir).orderBy("doc_id", "perm")

  /** LSH candidate pairs: 4 bands x 4 rows over the MinHash signature;
    * pairs sharing a band are verified by estimated similarity (fraction
    * of matching minhashes) >= 0.5. Shuffle is by band signature.
    */
  def lshPairs(spark: SparkSession, dir: String): DataFrame = {
    // The signature sub-plan recurs 4x through the band self-join and the
    // two verification sides, and ReuseExchange dedups none of them
    // (measured: 0 ReusedExchange, 8 repeated source scans). Compute the
    // WIDE signatures once ([[sigWideOf]] — one shuffle), materialize to
    // fresh scratch parquet, and derive bands + verification rows from
    // cheap scans of that.
    val wide = graft.util.Scratch.materialize(spark,
      sigWideOf(docs(spark, dir)), "lsh-sig")
    val bands2 = bandsOfWide(wide)
    val l = bands2.select(col("doc_id").as("a"), col("band"), col("bandsig"))
    val r = bands2.select(col("doc_id").as("b"), col("band"), col("bandsig"))
    val cand = l.join(r, Seq("band", "bandsig")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
    verifyPairs(cand, sigRowsOf(wide))
  }

  /** Banded signatures of a MinHash table: one row per (doc, band) with an
    * order-deterministic band signature — (perm, minhash) pairs are sorted
    * before concatenation, so the signature is independent of aggregation
    * order. This is the LSH index's physical key: the shuffle/bucket
    * column of every candidate join.
    */
  def bandSigs(sig: DataFrame): DataFrame =
    sig.withColumn("band", (col("perm") / 4).cast("int"))
      .groupBy("doc_id", "band")
      .agg(sort_array(collect_list(struct(col("perm"), col("minhash"))))
        .as("pm"))
      .select(col("doc_id"), col("band"),
        concat_ws(",", transform(col("pm"), x => x.getField("minhash")))
          .as("bandsig"))

  /** Estimated-similarity verification of candidate pairs against the
    * signature table: fraction of matching minhashes >= 0.5.
    */
  private def verifyPairs(cand: DataFrame, sig: DataFrame): DataFrame = {
    val sa = sig.select(col("doc_id").as("a"), col("perm"), col("minhash").as("ma"))
    val sb = sig.select(col("doc_id").as("b"), col("perm"), col("minhash").as("mb"))
    cand.join(sa, Seq("a")).join(sb, Seq("b", "perm"))
      .groupBy("a", "b")
      .agg((sum(when(col("ma") === col("mb"), 1).otherwise(0)) * 10000 /
        minhashPerms).cast("long").as("est_sim_e4"))
      .filter(col("est_sim_e4") >= 5000)
      .orderBy("a", "b")
  }

  /** Incremental LSH: near-dup candidates for a NEW batch of documents
    * against an already-signed corpus, with the corpus's signatures AND
    * band signatures REUSED (read from the persisted index, never
    * recomputed from text — and, with `indexBands` supplied, never
    * re-banded either). Per-batch work is genuinely O(batch bands +
    * matched buckets + candidate signatures): the batch's bands join the
    * PRECOMPUTED banded index on the band key, and verification touches
    * only the signatures of candidate doc ids (the corpus sig table is
    * semi-joined on the batch-derived candidate set — a broadcast
    * map-side filter, no corpus shuffle). A CDC-fed corpus dedups each
    * arriving batch without re-LSHing the world, the only shape that
    * survives at 100 TB. Output pairs have at least one new side;
    * old-old pairs were a previous batch's output. The result is
    * EXACTLY `lshPairs` restricted to pairs touching the batch, because
    * signatures are deterministic in the text — incremental and batch
    * dedup converge to the same pair set (spec-asserted).
    *
    * [[SignatureIndex]] maintains both inputs as ChronicleTables fed by
    * the document table's own changelog, closing the loop between the
    * CDC core and the dedup suite.
    *
    * @param newSigs   minhash signatures of the arriving batch
    *                  ([[minhashSignatures]] shape: doc_id, perm, minhash)
    * @param indexSigs the persisted signature index of everything seen
    * @param indexBands the persisted BANDED index ([[bandSigs]] shape:
    *                  doc_id, band, bandsig); when absent it is derived
    *                  from `indexSigs` — a full re-band, acceptable only
    *                  for one-shot/oracle use
    */
  def lshPairsIncremental(newSigs: DataFrame, indexSigs: DataFrame,
      indexBands: Option[DataFrame] = None,
      newBands: Option[DataFrame] = None): DataFrame = {
    val nbands = newBands.getOrElse(bandSigs(newSigs))
    val nb = nbands.select(col("doc_id").as("n"), col("band"), col("bandsig"))
    val ib = indexBands.getOrElse(bandSigs(indexSigs))
      .unionByName(nbands) // new-new pairs surface in the same join
      .select(col("doc_id").as("m"), col("band"), col("bandsig"))
    // new-vs-(index ∪ new): one bucket join keyed on the band signature.
    // The batch side is BROADCAST by contract: `newSigs` is one
    // admission-controlled micro-batch (the op's whole point is per-batch
    // incrementality — a corpus-sized backfill belongs in `lshPairs`), so
    // the hint pins the plan the 100 TB shape needs: the banded INDEX is
    // map-side streamed, never shuffled, at any corpus size.
    // The candidate set is consumed FIVE times downstream (twice for the
    // id set, once in the verify join, and the id set itself twice via
    // the two verification sides) — materialize the (batch-bounded, tiny)
    // result once instead of re-running the bucket join per consumer.
    val cand = graft.util.Scratch.materialize(newSigs.sparkSession,
      broadcast(nb).join(ib, Seq("band", "bandsig"))
        .filter(col("n") =!= col("m"))
        .select(least(col("n"), col("m")).as("a"),
          greatest(col("n"), col("m")).as("b"))
        .distinct(), "lsh-inc-cand")
    // verify against ONLY the candidate docs' signatures: the candidate
    // id set is batch-derived (bounded by the batch's bucket matches), so
    // it broadcasts too and the corpus sig scan is a map-side semi-join —
    // again no corpus shuffle
    val ids = cand.select(col("a").as("doc_id"))
      .unionByName(cand.select(col("b").as("doc_id"))).distinct()
    val candSigs = indexSigs.unionByName(newSigs)
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
    verifyPairs(cand, candSigs)
  }

  /** Oracle wrapper for [[lshPairsIncremental]]: documents with
    * `doc_id % 5 = 0` play the arriving batch, the rest the signed
    * corpus (bands precomputed once, as the managed index would hold
    * them). Equal to `lshPairs` filtered to batch-touching pairs.
    */
  def lshPairsIncrementalQuery(spark: SparkSession, dir: String): DataFrame = {
    // Same materialize-once move as [[lshPairs]] (this query's measured
    // plan repeated the source scan 62 times before it): wide signatures
    // once, then batch/index sides and the index's precomputed bands are
    // all scans of the scratch parquet.
    val wide = graft.util.Scratch.materialize(spark,
      sigWideOf(docs(spark, dir)), "lsh-sig-inc")
    val sig = sigRowsOf(wide)
    val idx = sig.filter(col("doc_id") % 5 =!= 0)
    lshPairsIncremental(
      sig.filter(col("doc_id") % 5 === 0), idx,
      Some(bandsOfWide(wide.filter(col("doc_id") % 5 =!= 0))),
      Some(bandsOfWide(wide.filter(col("doc_id") % 5 === 0))))
  }

  /** Connected-component clustering of the LSH near-duplicate pair graph:
    * every document that appears in a [[lshPairs]] pair is labeled with its
    * component's MINIMUM doc_id as the canonical representative — the
    * keep-one-per-cluster primitive of a dedup pipeline (pairs alone can't
    * drive removal: near-duplication is transitive through chains A~B~C
    * even when A and C never share a band). Output: (doc_id, cluster_rep,
    * cluster_size, is_rep), ordered by doc_id; singleton documents are
    * absent (they are their own trivial cluster).
    *
    * Algorithm, SIZE-GATED on the pair count (one cheap action on the
    * already-persisted pairs — the adaptive-planning move):
    *
    *  - pair set fits the driver (<= `smallGraphMaxPairs`, the common case:
    *    the banded near-dup graph is orders smaller than the corpus) →
    *    exact union-find on the driver, O(E·α) with zero per-round jobs.
    *    Measured 15.7s → ~5s at sf0.1 (the distributed loop paid ~2 jobs ×
    *    rounds of scheduling for a graph of a few dozen edges).
    *  - larger → iterative min-label propagation to the exact fixpoint:
    *    each round every node takes the minimum label among itself and its
    *    neighbors; rounds = component diameter (near-dup clusters are
    *    shallow). Each round is one shuffle-by-node aggregate; the
    *    converged label table is checkpointed through parquet on SHARED
    *    scratch storage ([[graft.util.Scratch.sharedScratch]]) so the
    *    returned plan has flat lineage and no pinned executor memory (at
    *    extreme diameters the same loop upgrades to the published
    *    large-star/small-star alternation — O(log n) rounds over the same
    *    per-round shuffles).
    */
  def lshClusterReps(spark: SparkSession, dir: String,
      maxRounds: Int = 40, smallGraphMaxPairs: Long = 1000000L): DataFrame = {
    val pairs = lshPairs(spark, dir).select("a", "b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val labels: DataFrame =
        if (pairs.count() <= smallGraphMaxPairs) driverUnionFind(spark, pairs)
        else distributedMinLabel(spark, pairs, maxRounds)
      val w = Window.partitionBy("cluster_rep")
      labels
        .select(col("node").as("doc_id"), col("lbl").as("cluster_rep"))
        .withColumn("cluster_size", count(lit(1)).over(w))
        .withColumn("is_rep", col("doc_id") === col("cluster_rep"))
        .orderBy("doc_id")
    } finally pairs.unpersist()
  }

  /** Exact connected components of a driver-resident edge set: union-find
    * with path compression, smaller root wins — so every component's root
    * IS its minimum label, matching the distributed path bit-for-bit.
    */
  private def driverUnionFind(spark: SparkSession, pairs: DataFrame): DataFrame = {
    import spark.implicits._
    val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val nodes = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSeq.distinct
    nodes.map(n => (n, find(n))).toDF("node", "lbl")
  }

  /** Distributed min-label propagation to the exact fixpoint (the scale
    * path; see [[lshClusterReps]]).
    */
  private def distributedMinLabel(spark: SparkSession, pairs: DataFrame,
      maxRounds: Int): DataFrame = {
    val edges = pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))
      .toDF("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = edges.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < maxRounds) {
        val nbrMin = edges
          .join(labels.select(col("node").as("dst"), col("lbl").as("dlbl")),
            Seq("dst"))
          .groupBy(col("src").as("node")).agg(min("dlbl").as("nmin"))
        val next = labels
          .join(nbrMin, Seq("node"), "left")
          .select(col("node"),
            least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        changed = next
          .join(labels.select(col("node"), col("lbl").as("old")), Seq("node"))
          .filter(col("lbl") =!= col("old")).count()
        labels.unpersist()
        labels = next
        rounds += 1
      }
      require(changed == 0, s"label propagation did not converge in $maxRounds rounds")
      // flat-lineage checkpoint of the (small: near-dup docs only) label
      // table — the returned plan must not re-run the iteration per action.
      // The checkpoint MUST live on shared storage (conf-resolved): this is
      // the >1M-pair scale path, and a driver-local temp dir would be a
      // per-machine `file:` path on a real cluster — executors would write
      // their partitions to their own disks and the read-back would see
      // only the driver-visible fragment.
      val ckpt = graft.util.Scratch.sharedScratch(spark, "cc-labels")
      labels.write.mode("overwrite").parquet(ckpt)
      labels.unpersist()
      spark.read.parquet(ckpt)
    } finally edges.unpersist()
  }

  /** 32-bit SimHash over word tokens: bit j set iff the sum over tokens of
    * (2*bit_j(md5Long(token)) - 1) is positive. Integer-exact.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokensCol(col("text"))
    // One aggregation pass with 32 codegen'd sum columns instead of a x32
    // row explosion: the per-token rows shuffle once, each bit's balance is
    // a plain hash-aggregate column.
    val bitSums = (0 until 32).map(j =>
      sum(expr(s"(shiftright(h, $j) & 1) * 2 - 1")).as(s"s$j"))
    val hashBits = (0 until 32).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
    docs(spark, dir)
      .select(col("doc_id"), explode(toks).as("t"))
      .withColumn("h", md5Long(col("t")))
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), hashBits.reduce(_ + _).as("simhash"))
      .orderBy("doc_id")
  }
}
