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
  * (suro-core/.../routing/MessageRouter.java:60-102): instead of a
  * per-message interpreted loop over sinks, the routing table compiles once
  * into Catalyst predicates and the micro-batch fans out as several
  * filtered/projected DataFrames from the SAME plan — Catalyst caches the
  * common scan, and every route predicate is pushed toward it.
  */
object Router {

  /** Compile and fan out. Returns sinkName -> DataFrame. A route's alias
    * rewrites the routing-key column, payload preserved (MessageRouter
    * alias semantics, MessageRouter.java:85-99). An event can match
    * multiple routes (suro writes to every matching route's sink).
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
