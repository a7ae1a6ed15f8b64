package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** General relational operators over the TPC-H-ish tables — the breadth
  * surface of the engine (aggregation, joins incl. broadcast, windows,
  * rollup, set ops, top-k). Monetary aggregates are emitted as scaled
  * bigints (cents) so the DuckDB oracle comparison is float-exact.
  */
object RelationalQueries {

  private def read(spark: SparkSession, dir: String, t: String): DataFrame =
    spark.read.parquet(s"$dir/$t.parquet")

  def cents(c: Column): Column = round(c * 100).cast("long")

  /** TPC-H Q1-style pricing summary: the canonical groupBy aggregate with
    * map-side partial aggregation.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        cents(sum("l_quantity")).as("sum_qty_e2"),
        cents(sum("l_extendedprice")).as("sum_base_e2"),
        cents(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("sum_disc_e2"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: 3-way join (dimension sides broadcast) + agg + top-k
    * with deterministic tiebreak.
    */
  def q3TopRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = read(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = read(spark, dir, "orders")
    val li = read(spark, dir, "lineitem")
    li.join(broadcast(ord), li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy("l_orderkey")
      .agg(cents(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_e2"))
      .orderBy(col("revenue_e2").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Ranking window: top-2 orders per customer by totalprice. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    read(spark, dir, "orders")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 2)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        cents(col("o_totalprice")).as("price_e2"))
      .orderBy("o_custkey", "rk")
  }

  /** ROLLUP grouping-sets aggregate (null-marked subtotal rows). */
  def rollupOrders(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "orders")
      .rollup("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"), cents(sum("o_totalprice")).as("total_e2"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  /** Semi + anti join composition: customers that have at least one order
    * (left_semi) but none above the threshold (left_anti).
    */
  def semiAntiCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = read(spark, dir, "customer")
    val ord = read(spark, dir, "orders")
    val big = ord.filter(col("o_totalprice") > 150000.0).select("o_custkey")
    cust.join(ord.select("o_custkey"),
        cust("c_custkey") === ord("o_custkey"), "left_semi")
      .join(big, cust("c_custkey") === big("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Set operation: nations with customers but no suppliers (EXCEPT). */
  def customerOnlyNations(spark: SparkSession, dir: String): DataFrame = {
    val c = read(spark, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
    val s = read(spark, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
    c.except(s).orderBy("nationkey")
  }

  /** Multi-way star join through region -> nation -> customer -> orders
    * with two broadcast dimensions.
    */
  def revenueByRegion(spark: SparkSession, dir: String): DataFrame = {
    val region = read(spark, dir, "region")
    val nation = read(spark, dir, "nation")
    val cust = read(spark, dir, "customer")
    val ord = read(spark, dir, "orders")
    ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"), cents(sum("o_totalprice")).as("revenue_e2"))
      .orderBy("r_name")
  }

  /** Distinct-count + exact-quantile profile per event type (the dataset
    * profiling aggregate a training pipeline runs on every ingest).
    */
  def eventProfile(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type")
      .agg(
        countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"),
        cents(expr("percentile(value, 0.5)")).as("median_value_e2"),
        cents(expr("percentile(value, 0.95)")).as("p95_value_e2"),
        cents(min("value")).as("min_e2"),
        cents(max("value")).as("max_e2"))
      .orderBy("event_type")

  /** The 100 TB variant of [[eventProfile]]: sketch-based distinct count
    * (HLL++) and t-digest quantiles — no per-group sort buffer, no exact
    * distinct shuffle; constant memory per group. Same schema as the exact
    * profile; values are approximations, so its correctness gate is the
    * spec bound vs the exact profile, not the row-hash oracle.
    */
  def eventProfileApprox(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type")
      .agg(
        approx_count_distinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"),
        cents(expr("approx_percentile(value, 0.5, 10000)")).as("median_value_e2"),
        cents(expr("approx_percentile(value, 0.95, 10000)")).as("p95_value_e2"),
        cents(min("value")).as("min_e2"),
        cents(max("value")).as("max_e2"))
      .orderBy("event_type")

  /** CUBE grouping sets over two dimensions. */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "orders")
      .cube("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"), cents(avg("o_totalprice")).as("avg_e2"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  /** As-of join: each purchase event matched to the latest prior click of
    * the same user (by event_id order) — expressed as a single window pass
    * over the tagged union instead of a range self-join, so it's one
    * shuffle by user and scales linearly (the classic streaming-CDC
    * enrichment shape).
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_click_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("last_click_id"))
      .orderBy("purchase_id")
  }

  /** Top-k with offsetless deterministic ordering (ORDER BY + LIMIT). */
  def topParts(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "part")
      .select(col("p_partkey"), col("p_name"),
        cents(col("p_retailprice")).as("price_e2"))
      .orderBy(col("price_e2").desc, col("p_partkey"))
      .limit(10)
}
