package graft

/** `spark.read.format("graft").load(tableRoot)` — Spark resolves the
  * format name "graft" to this class by convention (package + its
  * `DefaultSource`); the implementation lives in [[graft.sql.GraftDataSource]].
  */
class DefaultSource extends graft.sql.GraftDataSource
