package graft.routing

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import graft.dsl.FilterDsl
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One route: an optional DSL filter, a destination sink name, and an
  * optional routing-key alias — the reference's
  * `RoutingInfo{filter, where:[Route{sink, filter, alias}]}` JSON shape
  * (suro-core/.../routing/RoutingMap.java:40-132) flattened to a list.
  */
case class RouteConfig(
    sink: String,
    filter: Option[String] = None,
    alias: Option[String] = None)

/** Routing table: routes evaluated per event; events matching no route go
  * to the mandatory default sink (the reference enforces a `default` sink,
  * DynamicPropertySinkConfigurator.java:54-56). Events with a null/empty
  * routing key are quarantined rather than silently dropped (the
  * reference's drop-counting, MessageRouter.java:61-65, upgraded to an
  * inspectable output).
  */
case class RoutingTable(
    keyColumn: String,
    routes: Seq[RouteConfig],
    defaultSink: String = "default",
    quarantineSink: String = "quarantine")

/** Spark-native re-expression of `MessageRouter.process`
  * (suro-core/.../routing/MessageRouter.java:60-102): the routing table
  * compiles once into Catalyst predicates.
  *
  * Two surfaces:
  *  - [[Router.fanout]] returns one lazy DataFrame per sink (composable,
  *    but each sink's ACTION re-executes the source scan — callers that
  *    write every sink should persist the input first or use fanoutWrite);
  *  - [[Router.fanoutWrite]] is the one-pass path: events are tagged with
  *    the sinks they match, exploded, and written `partitionBy(sink)` —
  *    exactly ONE scan and ONE write job regardless of route count.
  */
object Router {

  /** One-pass fan-out write. Each input row is scanned once, tagged with
    * every matching route (sink + optional alias), and the exploded result
    * is written partitioned by sink directory. Multi-match duplicates the
    * event into each sink (suro writes to every matching route's sink,
    * MessageRouter.java:79-99); no match -> default sink; null/empty key ->
    * quarantine sink. Returns per-sink row counts.
    */
  def fanoutWrite(df: DataFrame, table: RoutingTable, outDir: String): Map[String, Long] = {
    val key = col(table.keyColumn)
    val keyless = coalesce(key.isNull || (key.cast("string") === lit("")), lit(true))
    val tagType = "struct<sink:string,alias:string>"
    val routeTags: Seq[Column] = table.routes.map { r =>
      val pred = coalesce(r.filter.map(FilterDsl.compile).getOrElse(lit(true)), lit(false))
      when(pred, struct(
        lit(r.sink).as("sink"),
        r.alias.map(lit(_)).getOrElse(lit(null)).cast("string").as("alias")))
        .otherwise(lit(null).cast(tagType))
    }
    val matched = filter(array(routeTags: _*), t => t.isNotNull)
    val defaultTag = array(struct(lit(table.defaultSink).as("sink"),
      lit(null).cast("string").as("alias")))
    val quarantineTag = array(struct(lit(table.quarantineSink).as("sink"),
      lit(null).cast("string").as("alias")))
    val tagged = df
      .withColumn("__tags",
        when(keyless, quarantineTag)
          .when(size(matched) === 0, defaultTag)
          .otherwise(matched))
      .withColumn("__tag", explode(col("__tags")))
      .withColumn(table.keyColumn,
        coalesce(col("__tag.alias").cast(df.schema(table.keyColumn).dataType), key))
      .withColumn("__sink", col("__tag.sink"))
      .drop("__tags", "__tag")
    // Per-sink counts ride the write itself as observed metrics (one
    // conditional-sum column per statically-known sink): ONE job total,
    // where per-sink post-hoc count() jobs — however cheap each footer
    // read is — would add O(sinks) job launches per batch.
    val sinkNames = (table.routes.map(_.sink) :+
      table.defaultSink :+ table.quarantineSink).distinct
    val obs = org.apache.spark.sql.Observation()
    val countCols = sinkNames.map(s =>
      sum(when(col("__sink") === s, 1L).otherwise(0L)).as(s))
    tagged.observe(obs, countCols.head, countCols.tail: _*)
      .write.partitionBy("__sink").mode("overwrite").parquet(outDir)
    obs.get.map { case (s, n) => s -> n.asInstanceOf[Long] }
      .filter(_._2 > 0)
  }

  /** Compile and fan out. Returns sinkName -> DataFrame. A route's alias
    * rewrites the routing-key column, payload preserved (MessageRouter
    * alias semantics, MessageRouter.java:85-99). An event can match
    * multiple routes (suro writes to every matching route's sink).
    *
    * NOTE: the returned frames share the input PLAN, not materialized data;
    * running an action per sink re-executes the source scan each time.
    * Persist the input first, or use [[fanoutWrite]] for a one-pass write.
    */
  def fanout(df: DataFrame, table: RoutingTable): Map[String, DataFrame] = {
    val key = col(table.keyColumn)
    val keyless = key.isNull || (key.cast("string") === lit(""))
    val valid = df.filter(!keyless)

    val compiled: Seq[(RouteConfig, Column)] = table.routes.map { r =>
      r -> r.filter.map(FilterDsl.compile).getOrElse(lit(true))
    }
    val routed: Map[String, DataFrame] = compiled
      .groupBy(_._1.sink)
      .map { case (sink, rs) =>
        val frames = rs.map { case (r, pred) =>
          val m = valid.filter(pred)
          r.alias match {
            case Some(a) => m.withColumn(table.keyColumn, lit(a))
            case None => m
          }
        }
        sink -> frames.reduce(_ unionByName _)
      }

    val noneMatched = compiled.map { case (_, p) => !coalesce(p, lit(false)) }
      .reduceOption(_ && _).getOrElse(lit(true))
    val defaulted = valid.filter(noneMatched)

    routed ++ Map(
      table.defaultSink -> routed.get(table.defaultSink)
        .map(_.unionByName(defaulted)).getOrElse(defaulted),
      table.quarantineSink -> df.filter(keyless))
  }

  /** Parse a routes JSON file: `[{"sink": "...", "filter": "...", "alias": "..."}]`
    * — the engine-config analogue of suro-server/conf/routingmap.json.
    */
  def parseRoutes(json: String): Seq[RouteConfig] = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.readValue(json, classOf[Array[RouteConfig]]).toSeq
  }
}
