package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One engine capability = one [[Q]]: a named Spark query over the driver
 * test tables plus (when SQL-expressible) an equivalent DuckDB oracle.
 *
 * Determinism contract (FIXTURES.md §3): every hash-checked query ends in a
 * total ORDER BY, rounds floating aggregates, renders timestamps as strings,
 * and never emits raw map/array columns — so the Spark parquet dump and the
 * DuckDB result are bit-comparable.
 */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {

  /** All query groups, in SURVEY.md §2 order. */
  lazy val all: Vector[Q] =
    IngestQueries.all ++ MetricQueries.all ++ RelationalQueries.all ++
      WindowQueries.all ++ StreamShapeQueries.all ++ LlmQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
