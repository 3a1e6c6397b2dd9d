package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of declared queries plus their DuckDB oracle SQL.
  * Each query: (session, sfDir) => result DataFrame. Column names MUST match
  * the oracle SQL aliases exactly (driver compares sorted-by-name). */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** DuckDB-runnable ANSI SQL per query key; omit for non-SQL-expressible. */
  def oracle: Map[String, String]
}
