package graft.ann

import graft.dedup.DocDedup.md5Long
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (unit-norm float vectors).
  *
  * For oracle-exact determinism every vector is quantized to scaled
  * integers (round(x*1000)) and similarity is the exact-integer inner
  * product — for unit-norm vectors, max-inner-product ranking IS cosine
  * ranking, with zero float-summation ambiguity between engines.
  *
  * Scale path: brute force is O(Q·N) (fine when the query set is small and
  * broadcast); the LSH variant buckets vectors by random-hyperplane signs
  * so candidate generation shuffles by bucket instead of crossing N×N.
  */
object Ann {

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Integer-quantized vector column. */
  def quantized(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000).cast("long"))

  /** Exact integer inner product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, z) => acc + z)

  /** Brute-force top-k by inner product: query set = vec_id < numQueries,
    * broadcast against the full table (the baseline every ANN variant is
    * measured against).
    */
  def bruteForceTopK(spark: SparkSession, dir: String,
      numQueries: Int = 8, k: Int = 3): DataFrame = {
    val e = embeddings(spark, dir).select(col("vec_id"), quantized(col("embedding")).as("q"))
    // posexplode + hash aggregate keeps the dot product inside whole-stage
    // codegen (array higher-order functions are interpreted, measured ~3x
    // slower here)
    val flat = e.select(col("vec_id"), posexplode(col("q")))
      .withColumnRenamed("pos", "j").withColumnRenamed("col", "x")
    val qflat = flat.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("j"), col("x").as("qx"))
    val scored = flat.join(broadcast(qflat), Seq("j"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("x") * col("qx")).as("dot_q"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot_q").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "dot_q")
      .orderBy("query_id", "rank")
  }

  val numPlanes = 12

  /** Hyperplane weight for (plane p, dimension j): a deterministic
    * md5-derived integer in [-1000, 1000] — reproducible in the oracle.
    */
  def planeWeight(p: Column, j: Column): Column =
    md5Long(concat(p.cast("string"), lit("_"), j.cast("string"))) % 2001 - 1000

  /** LSH bucket assignment by random-hyperplane signs: bit p of the bucket
    * is sign(sum_j w(p,j) * q_j). Integer-exact end to end.
    */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame =
    lshBucketsOver(embeddings(spark, dir)).orderBy("vec_id")

  def lshBucketsOver(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), posexplode(quantized(col("embedding"))))
      .withColumnRenamed("pos", "j").withColumnRenamed("col", "x")
      .select(col("vec_id"), col("j"), col("x"),
        explode(sequence(lit(0), lit(numPlanes - 1))).as("p"))
      .groupBy("vec_id", "p")
      .agg(sum(planeWeight(col("p"), col("j")) * col("x")).as("proj"))
      .groupBy("vec_id")
      .agg(sum(when(col("proj") > 0, expr("shiftleft(1L, cast(p as int))"))
        .otherwise(0L)).as("bucket"))

  /** SQL fragment listing a query's probe buckets: its own bucket plus all
    * buckets within Hamming distance `radius` (1 -> numPlanes+1 probes,
    * 2 -> +C(numPlanes,2) more). Multi-probe trades a bounded candidate
    * fan-out for recall — the standard fix for single-probe hyperplane LSH
    * missing near neighbors that straddle one or two hyperplanes.
    */
  private def probeExpr(radius: Int): String = {
    val n = numPlanes
    val r1 = s"transform(sequence(0, ${n - 1}), p -> bucket ^ shiftleft(1L, p))"
    val r2 = s"flatten(transform(sequence(0, ${n - 2}), p -> " +
      s"transform(sequence(p + 1, ${n - 1}), r -> " +
      "bucket ^ shiftleft(1L, p) ^ shiftleft(1L, r))))"
    radius match {
      case 0 => "array(bucket)"
      case 1 => s"concat(array(bucket), $r1)"
      case 2 => s"concat(array(bucket), $r1, $r2)"
      case _ => sys.error(s"unsupported probe radius $radius")
    }
  }

  /** Multi-probe LSH top-k: queries probe their bucket neighborhood, rank
    * candidates by exact quantized inner product, keep k. The ANN scale
    * path: candidate generation is a shuffle-by-bucket join (never Q×N);
    * recall vs [[bruteForceTopK]] is spec-asserted (DocDedupSpec) at a
    * fixed probe budget.
    */
  def lshTopK(spark: SparkSession, dir: String, numQueries: Int = 8,
      k: Int = 3, probeRadius: Int = 1): DataFrame =
    lshTopKOver(embeddings(spark, dir), numQueries, k, probeRadius)

  /** Same, over an arbitrary (vec_id, embedding) frame — used by the recall
    * spec with planted-neighbor fixtures.
    */
  def lshTopKOver(emb: DataFrame, numQueries: Int, k: Int,
      probeRadius: Int): DataFrame = {
    val e = emb.select(col("vec_id"), quantized(col("embedding")).as("q"))
    val b = lshBucketsOver(emb) // (vec_id, bucket)
    val data = e.join(b, "vec_id")
    val probes = data.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qv"), col("bucket"))
      .withColumn("probe", explode(expr(probeExpr(probeRadius))))
      .drop("bucket")
    // each neighbor lives in exactly one bucket and probe buckets are
    // distinct, so the join cannot duplicate a candidate
    val cand = probes.join(
      data.select(col("vec_id").as("neighbor_id"), col("q"),
        col("bucket").as("nb")),
      col("probe") === col("nb"))
      .filter(col("neighbor_id") =!= col("query_id"))
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      dotQ(col("qv"), col("q")).as("dot_q"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot_q").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "dot_q")
      .orderBy("query_id", "rank")
  }

  /** Bucketed ANN: exact inner product only within an LSH bucket — the
    * scale path (shuffle by bucket, no N×N cross join). Emits candidate
    * pairs above a quantized-dot threshold.
    */
  /** Embedding-cosine near-duplicate pairs: LSH-bucketed candidates whose
    * quantized cosine clears the threshold. Vectors are unit-norm, so
    * cos ~= dot_q / 1e6; emitted as cos_e4 = dot_q / 100 (integer-exact).
    */
  def embeddingNearDup(spark: SparkSession, dir: String,
      minCosE4: Long = 2500L): DataFrame =
    lshCandidatePairs(spark, dir, minDotQ = minCosE4 * 100)
      .select(col("a"), col("b"), expr("dot_q div 100").as("cos_e4"))
      .orderBy("a", "b")

  def lshCandidatePairs(spark: SparkSession, dir: String,
      minDotQ: Long = 200000L): DataFrame = {
    val e = embeddings(spark, dir).select(col("vec_id"), quantized(col("embedding")).as("q"))
    val b = lshBuckets(spark, dir)
    val withB = e.join(b, "vec_id")
    val l = withB.select(col("vec_id").as("a"), col("q").as("qa"), col("bucket"))
    val r = withB.select(col("vec_id").as("b"), col("q").as("qb"), col("bucket"))
    l.join(r, Seq("bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), dotQ(col("qa"), col("qb")).as("dot_q"))
      .filter(col("dot_q") >= minDotQ)
      .orderBy("a", "b")
  }
}
