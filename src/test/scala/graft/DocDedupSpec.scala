package graft

import graft.ann.Ann
import graft.dedup.DocDedup
import graft.mm.Multimodal
import graft.textops.TextOps
import org.apache.spark.sql.functions._

/** Behavioral specs for the training-data operators on crafted fixtures —
  * the oracle gate checks engine-vs-DuckDB equality on the driver tables;
  * these check the operators actually FIND what they claim to find
  * (near-dup recall, LSH candidate containment, quality ordering).
  */
class DocDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Crafted corpus: 0/1 near-identical, 2 exact copy of 0, 3/4 unrelated. */
  private lazy val dir: String = {
    val d = tmpDir("docs-fixture")
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "cat sleeps on the warm mat near the old wooden door of the house"
    val docs = Seq(
      (0L, base, "en", "web", base.length.toLong),
      (1L, base.replace("warm mat", "cold mat"), "en", "web", 0L),
      (2L, base, "en", "crawl", base.length.toLong),
      (3L, "completely different text about spark catalyst optimizer rules " +
        "and whole stage code generation for columnar execution engines " +
        "with vectorized parquet readers and shuffle partitioning", "en", "web", 0L),
      (4L, "short note", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("exact dedup: identical texts share a canonical id") {
    val rows = DocDedup.exact(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(rows(0L) == (0L, false))
    assert(rows(2L) == (0L, true)) // copy of doc 0, canonicalized
    assert(rows(1L)._2 == false)   // near-dup is NOT an exact dup
  }

  test("n-gram Jaccard finds the near-dup pair and not unrelated docs") {
    val pairs = DocDedup.ngramJaccardPairs(spark, dir, threshold = 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash estimate tracks true jaccard; LSH candidates contain high-sim pairs") {
    val lsh = DocDedup.lshPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // exact duplicates agree on every minhash
    assert(lsh((0L, 2L)) == 10000L)
    // the near-dup pair must be surfaced by LSH with high estimate
    assert(lsh.contains((0L, 1L)) && lsh((0L, 1L)) >= 5000L)
    assert(!lsh.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("incremental LSH: batch-vs-index equals batch dedup, index reused from parquet") {
    // doc 0 plays the arriving batch; 1-4 the signed corpus. Incremental
    // output must be EXACTLY the full pair set restricted to pairs
    // touching the batch: (0,1) near-dup and (0,2) exact survive, the
    // old-old near-dup (1,2) — a previous batch's output — does not.
    val sig = DocDedup.minhashSignatures(spark, dir)
    val newSigs = sig.filter(col("doc_id") === 0L)

    // the corpus's signatures round-trip through a persisted index (the
    // point of the op: old TEXT is never re-read, only its signatures)
    val idx = tmpDir("lsh-index")
    sig.filter(col("doc_id") =!= 0L).write.mode("overwrite").parquet(idx)
    val indexSigs = spark.read.parquet(idx)

    val inc = DocDedup.lshPairsIncremental(newSigs, indexSigs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val full = DocDedup.lshPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(inc == full.filter { case ((a, b), _) => a == 0L || b == 0L })
    assert(inc.contains((0L, 1L)) && inc((0L, 2L)) == 10000L)
    assert(!inc.contains((1L, 2L)), "old-old pair re-emitted")

    // a batch of NEW near-dups of each other (neither in the index) is
    // still caught — new-vs-new rides the same bucket join
    val both = sig.filter(col("doc_id").isin(0L, 2L))
    val incNN = DocDedup.lshPairsIncremental(both,
        sig.filter(!col("doc_id").isin(0L, 2L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incNN.contains((0L, 2L)))
  }

  test("SignatureIndex: engine-maintained LSH index tracks the doc table's changelog; per-batch pairs union to the full dedup") {
    import graft.dedup.SignatureIndex
    import graft.model.Model
    import graft.ops.MergeInto
    import graft.table.ChronicleTable
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._

    val root = tmpDir("sigidx")
    val docsT = new ChronicleTable(s"$root/docs")
    val sigsT = new ChronicleTable(s"$root/sigs")
    val bandsT = new ChronicleTable(s"$root/bands")
    docsT.create(Model.physicalSchemaV1, 4)

    val base = "the quick brown fox jumps over the lazy dog while the " +
      "cat sleeps on the warm mat near the old wooden door of the house"
    val text = Map(
      0L -> base,
      1L -> base.replace("warm mat", "cold mat"),
      2L -> base,
      3L -> ("completely different text about spark catalyst optimizer rules " +
        "and whole stage code generation for columnar execution engines " +
        "with vectorized parquet readers and shuffle partitioning"),
      4L -> "short note") // < 3 tokens of shingle: must index as ABSENT

    val evSchema = StructType(Seq(
      StructField("lsn", LongType), StructField("op", StringType),
      StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
      StructField("role", StringType), StructField("text", StringType),
      StructField("tool", StringType), StructField("ts", TimestampType)))
    var lsn = 0L
    def batch(evs: Seq[(Long, String)]): org.apache.spark.sql.DataFrame =
      spark.createDataFrame(spark.sparkContext.parallelize(evs.map {
        case (d, op) =>
          lsn += 1
          Row(lsn, op, d.toString, 0, "doc",
            if (op == "D") null else text(d), null,
            new java.sql.Timestamp(lsn))
      }), evSchema)

    // establish the (empty) index so every batch has a valid pre-version
    SignatureIndex.update(spark, docsT, sigsT, bandsT, numBuckets = 4)

    // CDC batches of document INSERTS; the index updates after each and
    // the per-batch incremental pairs accumulate
    val inserts = Seq(Seq(3L -> "I", 4L -> "I"), Seq(0L -> "I", 1L -> "I"),
      Seq(2L -> "I"))
    // index doc ids are row ids "<conv>#<turn>" — here "<id>#0"
    val acc = scala.collection.mutable.Map.empty[(String, String), Long]
    inserts.zipWithIndex.foreach { case (evs, i) =>
      MergeInto(spark, docsT, batch(evs), s"docs#$i", "spec",
        mergeOnRead = true)
      val vBefore = sigsT.loadCurrent().version
      SignatureIndex.update(spark, docsT, sigsT, bandsT, numBuckets = 4)
      SignatureIndex.incrementalPairs(spark, sigsT, bandsT, vBefore)
        .collect().foreach(r =>
          acc((r.getString(0), r.getString(1))) = r.getLong(2))
    }
    // exactly-once: a re-run with nothing new applies nothing
    assert(SignatureIndex.update(spark, docsT, sigsT, bandsT, 4) == 0)

    // union-of-batches ≡ full-batch lshPairs over the final corpus
    val full = DocDedup.lshPairs(spark, dir).collect()
      .map(r => ((s"${r.getLong(0)}#0", s"${r.getLong(1)}#0"), r.getLong(2)))
      .toMap
    assert(acc.toMap == full,
      s"incremental union ${acc.toMap} != full $full")

    // consistency law: the maintained index equals signatures recomputed
    // from the current corpus — including after an UPDATE (doc 1 becomes
    // unrelated text) and a DELETE (doc 2); doc 4 has no shingles and must
    // be absent from both sides
    val upd = Seq(1L -> "U", 2L -> "D")
    MergeInto(spark, docsT, batch(upd).withColumn("text",
        when(col("op") === "U", lit("unrelated replacement text entirely " +
          "changing the shingle set of this document")).otherwise(col("text"))),
      "docs#3", "spec", mergeOnRead = true)
    SignatureIndex.update(spark, docsT, sigsT, bandsT, numBuckets = 4)
    val curDocs = docsT.read(spark).filter(!col(Model.deletedColumn))
      .select(concat(col("conv_id"), lit("#"), col("turn_idx")).as("doc_id"),
        col("text"))
    val expect = DocDedup.sigTableOf(curDocs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = SignatureIndex.sigView(spark, sigsT).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, "maintained sig index drifted from the corpus")
    val expectBands = DocDedup.bandSigs(DocDedup.sigTableOf(curDocs))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val gotBands = SignatureIndex.bandView(spark, bandsT).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(gotBands == expectBands, "maintained band index drifted")
  }

  test("LSH cluster reps: transitive closure of the pair graph, min-id canonical") {
    // chained corpus: 0~1 and 1~2 are near-dups but 0 and 2 drift further
    // apart — the component {0,1,2} must still share one representative
    // (pairs alone cannot drive keep-one-per-cluster removal)
    val d = tmpDir("docs-chain")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten eleven twelve"
    Seq(
      (0L, base, "en", "web", 0L),
      (1L, base.replace("five six", "5 6"), "en", "web", 0L),
      (2L, base.replace("five six", "5 6").replace("alpha beta", "a b"),
        "en", "web", 0L),
      (3L, "entirely unrelated text with different words about query " +
        "engines and columnar formats and vectorized execution pipelines " +
        "running on distributed clusters with shuffle services", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    val pairs = DocDedup.lshPairs(spark, d)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val reps = DocDedup.lshClusterReps(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_rep"), r.getAs[Long]("cluster_size"),
          r.getAs[Boolean]("is_rep"))).toMap
    // every pair's endpoints share one representative (closure property)
    pairs.foreach { case (a, b) =>
      assert(reps(a)._1 == reps(b)._1, s"pair ($a,$b) split across clusters")
    }
    // the chain {0,1,2} collapses to rep 0 even if (0,2) is not a pair
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L)))
    assert(reps(0L) == (0L, 3L, true))
    assert(reps(1L)._1 == 0L && reps(2L)._1 == 0L)
    assert(!reps.contains(3L), "singleton doc must not appear")
    // representative is the component minimum; sizes count members
    reps.groupBy(_._2._1).foreach { case (rep, members) =>
      assert(members.keys.min == rep)
      members.values.foreach { case (_, size, _) =>
        assert(size == members.size)
      }
    }
    // the scale path (distributed min-label propagation, forced by a zero
    // driver threshold) agrees with the driver union-find bit-for-bit
    val repsDist = DocDedup.lshClusterReps(spark, d, smallGraphMaxPairs = 0L)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_rep"), r.getAs[Long]("cluster_size"),
          r.getAs[Boolean]("is_rep"))).toMap
    assert(repsDist == reps, "distributed and driver CC paths disagree")
    // no executor memory left pinned by the iteration
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("simhash: identical docs get identical hashes, near-dups small hamming distance") {
    val sh = DocDedup.simhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(2L))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(1L)) <= 6)
    assert(hamming(sh(0L), sh(3L)) > hamming(sh(0L), sh(1L)))
  }

  test("quality score ranks a stopword-rich doc above a symbol-heavy one") {
    val d = tmpDir("docs-quality")
    Seq(
      (0L, "the cat and the dog are in the house with a mat", "en", "w", 0L),
      (1L, "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))", "en", "w", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val q = TextOps.qualityScore(spark, d).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("quality_e4")).toMap
    assert(q(0L) > q(1L))
  }

  test("ANN: brute-force top-k finds the planted nearest neighbor; LSH buckets collide for it") {
    val d = tmpDir("ann-fixture")
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val base = unit(Array.fill(64)(rnd.nextGaussian().toFloat))
    val nearTwin = unit(base.zipWithIndex.map { case (x, i) =>
      x + (if (i == 0) 0.01f else 0f) })
    val vecs = (0 until 40).map { i =>
      val v =
        if (i == 0) base
        else if (i == 1) nearTwin
        else unit(Array.fill(64)(rnd.nextGaussian().toFloat))
      (i.toLong, v.toSeq, i % 4)
    }.toDF("vec_id", "embedding", "label")
    vecs.write.mode("overwrite").parquet(s"$d/embeddings.parquet")

    val top = Ann.bruteForceTopK(spark, d, numQueries = 1, k = 1).collect()
    assert(top.length == 1 && top(0).getAs[Long]("neighbor_id") == 1L)

    val buckets = Ann.lshBuckets(spark, d).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("bucket")).toMap
    assert(buckets(0L) == buckets(1L)) // near-identical vectors share bucket
  }

  test("ANN multi-probe LSH top-k: measured recall >= 0.9 on planted neighbors") {
    // 32 queries (ids 0..31), each with a planted near-twin (id 32..63,
    // cos ~0.99) among 200 random unit vectors. Deterministic fixture +
    // md5-fixed hyperplanes => recall is a fixed number, not a flaky one.
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val nQ = 32
    val bases = (0 until nQ).map(_ => Array.fill(64)(rnd.nextGaussian()))
    val twins = bases.map(b => b.map(x => x + 0.02 * rnd.nextGaussian()))
    val fillers = (0 until 200).map(_ => Array.fill(64)(rnd.nextGaussian()))
    val rows = bases.zipWithIndex.map { case (v, i) => (i.toLong, unit(v), 0) } ++
      twins.zipWithIndex.map { case (v, i) => ((nQ + i).toLong, unit(v), 1) } ++
      fillers.zipWithIndex.map { case (v, i) => ((2 * nQ + i).toLong, unit(v), 2) }
    val d = tmpDir("ann-recall")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")

    // ground truth: the twin is each query's true nearest neighbor
    val brute = Ann.bruteForceTopK(spark, d, numQueries = nQ, k = 1).collect()
    val truth = brute.map(r =>
      r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    assert(truth.forall { case (q, n) => n == q + nQ },
      "fixture broken: twin is not the brute-force nearest neighbor")

    // multi-probe (Hamming<=2 => 79 of 4096 buckets probed) top-3
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val lsh = Ann.lshTopKOver(emb, numQueries = nQ, k = 3, probeRadius = 2)
      .collect()
    val hits = (0 until nQ).count { q =>
      lsh.exists(r => r.getAs[Long]("query_id") == q.toLong &&
        r.getAs[Long]("neighbor_id") == truth(q.toLong))
    }
    val recall = hits.toDouble / nQ
    assert(recall >= 0.9, s"multi-probe recall $recall ($hits/$nQ) below 0.9")

    // IVF on the same fixture and ground truth: near-twins land in the
    // same (or an adjacently-probed) cell because cell assignment is
    // max-inner-product against shared centroids — nprobe=4 of nlist=16
    // must recover the twin for >= 0.9 of queries
    val ivf = Ann.ivfTopKOver(emb, numQueries = nQ, k = 3,
      nprobe = Ann.ivfNprobe).collect()
    val ivfHits = (0 until nQ).count { q =>
      ivf.exists(r => r.getAs[Long]("query_id") == q.toLong &&
        r.getAs[Long]("neighbor_id") == truth(q.toLong))
    }
    val ivfRecall = ivfHits.toDouble / nQ
    assert(ivfRecall >= 0.9, s"IVF recall $ivfRecall ($ivfHits/$nQ) below 0.9")
  }

  test("ANN: a degenerate hot bucket is capped — candidate count stays bounded") {
    // 100 identical vectors (one bucket, far over maxBucketSize=64) would
    // produce 4950 all-pairs candidates on one reducer without the
    // stop-bucket cap; with it they produce NONE, while a normal near-dup
    // pair in a small bucket still surfaces.
    val rnd = new scala.util.Random(23)
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val near = Array.fill(64)(rnd.nextGaussian())
    val nearTwin = near.map(x => x + 0.01 * rnd.nextGaussian())
    val hot = unit(Array.fill(64)(rnd.nextGaussian()))
    val rows =
      Seq((0L, unit(near), 0), (1L, unit(nearTwin), 0)) ++
        (0 until 10).map(i => (2L + i, unit(Array.fill(64)(rnd.nextGaussian())), 1)) ++
        (0 until 100).map(i => (100L + i, hot, 2)) // the degenerate bucket
    val d = tmpDir("ann-hotbucket")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val pairs = Ann.lshCandidatePairsOver(emb, minDotQ = 900000L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)), s"near-dup pair lost: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 >= 100L || p._2 >= 100L),
      s"hot-bucket pairs leaked: ${pairs.count(p => p._1 >= 100L)}")
    assert(pairs.length < 64, s"candidate blow-up: ${pairs.length} pairs")
  }

  test("multimodal: batched stub decoder output equals per-row stub over the binary payload") {
    val feats = Multimodal.decodeFeatures(spark, dir).collect()
    val raw = Multimodal.mediaTable(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    feats.foreach { f =>
      val payload = raw(f.getLong(0))
      val (w, h, fr) = Multimodal.StubDecoder.decode(payload)
      assert(f.getAs[Int]("n_bytes") == payload.length)
      assert(f.getAs[Int]("width") == w && f.getAs[Int]("height") == h
        && f.getAs[Int]("frames") == fr)
    }
  }
}
