package graft

import graft.textops.Corpus
import org.apache.spark.sql.functions._

/** Behavioral specs for the corpus-construction operators — the oracle
  * gate checks engine-vs-DuckDB equality; these check the PROPERTIES the
  * ops exist for: split assignments stable under corpus growth, pack bins
  * bounded by the window, stratified samples stable and uniform, mixture
  * keep-rates converging on the declared weights.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(d: String, n: Int): Unit =
    (0 until n).map { i =>
      val text = s"document number $i with some text " * (1 + i % 7)
      (i.toLong, text, Seq("en", "es", "fr")(i % 3), s"src${i % 4}",
        text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

  private lazy val dir: String = {
    val d = tmpDir("corpus-fixture")
    writeDocs(d, 2000)
    d
  }

  test("split: ~90/5/5, deterministic, and STABLE when the corpus doubles") {
    val by = Corpus.splitAssign(spark, dir).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by.values.sum == 2000L)
    assert(by("train") > 1700 && by("train") < 1890, s"train=${by("train")}")
    assert(by("val") > 50 && by("val") < 160, s"val=${by("val")}")
    assert(by("test") > 50 && by("test") < 160, s"test=${by("test")}")

    // a document's split never changes because OTHER documents arrived —
    // the property that keeps held-out sets honest under incremental ingest
    val before = Corpus.splitAssign(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val grown = tmpDir("corpus-grown")
    writeDocs(grown, 4000)
    val after = Corpus.splitAssign(spark, grown)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(before.forall { case (id, s) => after(id) == s })

    // pure projection: no hash shuffle anywhere (the only exchange is the
    // final orderBy's range partitioning, for the oracle dump)
    val plan = Corpus.splitAssign(spark, dir).queryExecution.executedPlan
    assert(!plan.toString.contains("hashpartitioning"), plan.toString)
  }

  test("pack: bins fill to the window, never start past it, offsets tile") {
    val rows = Corpus.packSequences(spark, dir)
      .select("pack_shard", "bin_id", "n_tokens", "doc_id").collect()
    assert(rows.length == 2000)
    assert(rows.forall(_.getLong(2) <= Corpus.PackWindow))
    // per (shard, bin): the bin's starting offsets all lie inside the
    // window (a doc may straddle out, never start beyond)
    val byShard = rows.groupBy(_.getLong(0))
    byShard.foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_.getLong(3)).foreach { r =>
        val bin = r.getLong(1)
        assert(bin == cum / Corpus.PackWindow,
          s"doc ${r.getLong(3)}: bin $bin vs offset $cum")
        cum += r.getLong(2)
      }
    }
    // bins are dense: every bin id below a shard's max is populated
    byShard.foreach { case (sh, rs) =>
      val bins = rs.map(_.getLong(1)).toSet
      assert(bins == (0L to bins.max).toSet, s"shard $sh holes: $bins")
    }
  }

  test("pack: the default shard count scales with the session parallelism, never a constant bottleneck") {
    // the running-offset window sorts ONE SHARD PER TASK: a constant shard
    // count would cap the whole corpus at that many tasks at any scale, so
    // the auto default derives from spark.sql.shuffle.partitions (explicit
    // shards remain for the pinned oracle assignment)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      val auto = Corpus.packSequences(spark, dir)
        .select("pack_shard").distinct().count()
      assert(auto == 64L, s"auto shards = $auto, want 64")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    // pinned shards stay pinned (the oracle's assignment)
    val pinned = Corpus.packSequences(spark, dir, shards = 16L)
      .select("pack_shard").distinct().count()
    assert(pinned == 16L)
    // packing-quality invariants hold at any shard count: no bin starts
    // past the window, bins dense per shard
    val rows = Corpus.packSequences(spark, dir, shards = 64L)
      .select("pack_shard", "bin_id", "n_tokens", "doc_id").collect()
    rows.groupBy(_.getLong(0)).foreach { case (sh, rs) =>
      var cum = 0L
      rs.sortBy(_.getLong(3)).foreach { r =>
        assert(r.getLong(1) == cum / Corpus.PackWindow)
        cum += r.getLong(2)
      }
    }
  }

  test("stratified sample: exactly k per stratum, stable under growth") {
    val s1 = Corpus.sampleStratified(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val perLang = s1.groupBy(_._1).map { case (l, xs) => l -> xs.length }
    assert(perLang.values.forall(_ == Corpus.SampleK), perLang.toString)

    // bottom-k-by-hash is a sliding sketch: new documents can only EVICT
    // old sample members, never reshuffle them — every pre-growth doc
    // still sampled after the corpus doubles was in the original sample
    val grown = tmpDir("corpus-grown-2")
    writeDocs(grown, 4000)
    val s2 = Corpus.sampleStratified(spark, grown).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val s1set = s1.toSet
    assert(s2.filter(_._2 < 2000L).forall(s1set.contains))
    // and eviction actually happens (the grown corpus contributes rows)
    assert(s2.exists(_._2 >= 2000L))
  }

  test("end-to-end: CDC replay -> export -> conversation split stays stable under ingest") {
    import graft.cdc.{CdcPipeline, PipelineConfig}
    import graft.source.{BinlogConfig, BinlogGenerator}
    // the full handoff story: the engine ingests transcripts, a training
    // job takes a clean export and assigns conversation-level splits —
    // which must NEVER move as later batches extend the corpus, or the
    // held-out set leaks into training
    val cfg = BinlogConfig(numEvents = 1200, numConversations = 30,
      segmentSize = 200, dupPct = 5, pDelete = 0.0)
    val src = tmpDir("corpus-e2e-bl")
    BinlogGenerator.writeSegments(spark, cfg, src)
    val p = new CdcPipeline(PipelineConfig(src, tmpDir("corpus-e2e-tbl"),
      segmentsPerBatch = 2, numBuckets = 4))

    def exportedSplits(): Map[String, String] = {
      val out = tmpDir("corpus-e2e-exp")
      p.table.exportSnapshot(spark, out, p.table.loadCurrent())
      Corpus.splitAssignOver(
          spark.read.parquet(out).select("conv_id").distinct(), "conv_id")
        .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    }

    p.runAll(spark, maxBatches = 2)
    val early = exportedSplits()
    assert(early.nonEmpty)

    p.runAll(spark) // the corpus grows; early conversations gain turns
    val late = exportedSplits()
    assert(late.size >= early.size)
    assert(early.forall { case (conv, s) => late(conv) == s },
      "a conversation's split moved as the corpus grew")
    // the assignment actually stratifies (not everything one split)
    assert(late.values.toSet.size >= 2, late.values.toSet.toString)
  }

  test("decontaminate: verbatim eval copies flagged, brushing overlap is not") {
    val d = tmpDir("corpus-decon")
    val evalText = "the quick brown fox jumps over the lazy dog " +
      "repeatedly every single morning before breakfast is served"
    Seq(
      (0L, evalText, "en", "eval", evalText.length.toLong), // 0 % 97 == 0: eval
      (1L, evalText, "en", "web", 0L),                      // verbatim copy
      (2L, "analysis shows the quick brown fox phrase appears in many " +
        "corpora but this document mostly discusses shuffle partitioning " +
        "strategies for distributed joins at petabyte scale", "en", "web", 0L),
      (3L, "completely unrelated content about catalyst optimizer rules " +
        "and adaptive query execution in columnar engines", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    val rows = Corpus.decontaminate(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(!rows.contains(0L), "eval docs are not scored")
    assert(rows(1L)._3, "verbatim eval copy must be contaminated")
    assert(rows(1L)._1 == rows(1L)._2, "copy shares every shingle")
    assert(!rows(2L)._3 && rows(2L)._2 > 0L,
      s"phrase-brush must overlap but stay clean: ${rows(2L)}")
    assert(rows(3L) == ((rows(3L)._1, 0L, false)), "clean doc flagged")

    // the eval shingle set rides a broadcast — no corpus-sized shuffle
    // on the contamination join
    val plan = Corpus.decontaminate(spark, d).queryExecution.executedPlan
    assert(plan.toString.contains("Broadcast"), plan.toString)
  }

  test("mixture: keep-rates converge on the declared weights") {
    val rows = Corpus.mixture(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._3).sum == 2000L)
    rows.foreach { case (src, pct, total, kept) =>
      val got = kept.toDouble / total
      val want = pct / 100.0
      assert(math.abs(got - want) < 0.08,
        s"$src: kept $got of target $want over $total docs")
    }
    // full-weight sources are never subsampled
    rows.filter(_._2 == 100).foreach { case (_, _, total, kept) =>
      assert(kept == total)
    }
  }
}
