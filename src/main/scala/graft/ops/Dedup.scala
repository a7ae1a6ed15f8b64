package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Last-writer-wins dedup: keep, per key, the row with the highest ordering
  * value (LSN). This collapses (a) exact duplicate LSNs re-emitted on replay
  * boundaries and (b) multiple changes to the same key inside one batch, so
  * that downstream MERGE sees at most one change per key.
  *
  * The reference dedups replayed deliveries by Elasticsearch document id
  * (suro-elasticsearch/.../ElasticSearchSink.java:337 treats
  * DocumentAlreadyExistsException as success); here the same guarantee is a
  * declarative aggregate Catalyst plans with map-side partial aggregation.
  *
  * Scale: `groupBy(keys).agg(max_by(...))` already does a partial (combine)
  * pass per input partition before the shuffle, so a hot key's duplicates
  * collapse before they travel. For adversarial skew (one key dominating
  * entire input partitions *after* upstream repartitioning) `saltedLatest`
  * adds an explicit two-phase salt: partial max per (key, salt) then final
  * max per key — the north rule's explicit skew handling.
  */
object Dedup {

  /** One row per key: the one with max `ord`. Ties (duplicate LSNs) carry
    * identical payloads by construction of the log, so either wins.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], ord: String): DataFrame = {
    val payload = df.columns.filterNot(keys.contains)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(ord)).as("__latest"))
      .select(keys.map(col) ++ payload.map(c => col(s"__latest.$c")): _*)
  }

  /** Two-pass hash-aggregate variant of [[latestByKey]]: pass 1 is a pure
    * `max(ord)` per key (fixed-width buffer -> HashAggregate, never
    * SortAggregate), pass 2 joins the winners back and collapses exact
    * duplicate deliveries (same key AND same max lsn carry identical
    * payloads by construction of the log) with a first()-style hash
    * aggregate. Trades the SortAggregate's per-partition sort for one
    * extra shuffle of the batch — measured in Bench's dedup phase at both
    * parallelism levels to pick the default.
    */
  def latestByKeyJoin(df: DataFrame, keys: Seq[String], ord: String): DataFrame = {
    val payload = df.columns.filterNot(keys.contains)
    val winners = df.groupBy(keys.map(col): _*)
      .agg(max(col(ord)).as(ord))
    df.join(winners, keys :+ ord)
      .groupBy(keys.map(col): _*)
      .agg(first(col(ord)).as(ord),
        payload.filterNot(_ == ord).map(c => first(col(c)).as(c)): _*)
      .select(df.columns.map(col): _*)
  }

  /** Window-based variant of [[latestByKey]]: ONE hash shuffle of the batch
    * followed by a single reduce-side sort + row_number filter. When keys
    * rarely repeat within a map task (the common CDC shape: keyspace >>
    * events per batch per task), max_by's partial aggregation reduces
    * nothing, so its map-side sort of the full batch is pure overhead —
    * this plan skips it. Prefer [[latestByKey]] when duplicates are heavy
    * (map-side combine then collapses them before the shuffle).
    */
  def latestByKeyWindow(df: DataFrame, keys: Seq[String], ord: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ord).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Explicit two-phase (salted) variant: phase 1 reduces per (key, salt)
    * partition-locally sized groups; phase 2 reduces the at-most-`saltBuckets`
    * survivors per key. Use when a single key can exceed one reducer's
    * capacity at the final aggregation.
    */
  def saltedLatest(df: DataFrame, keys: Seq[String], ord: String,
      saltBuckets: Int): DataFrame = {
    val payload = df.columns.filterNot(keys.contains)
    val salt: Column = pmod(xxhash64(col(ord)), lit(saltBuckets))
    val phase1 = df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(ord)).as("__latest"))
      .select(keys.map(col) ++ payload.map(c => col(s"__latest.$c")): _*)
    latestByKey(phase1, keys, ord)
  }
}
