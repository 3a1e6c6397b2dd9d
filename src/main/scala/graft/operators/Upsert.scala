package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert / set-semantics ingestion (CDC): convert a command stream into the
  * current snapshot, batch form. Mirrors the reference's map-semantics input
  * handle — last command per key wins, delete removes the key
  * (reference: operator/input.rs:214-313, operator/upsert.rs:21-60).
  * The streaming form lives in graft.streaming (flatMapGroupsWithState-style
  * −old/+new deltas); this batch form is last-write-wins + tombstone filter,
  * one window shuffle on the key — scales by key partitioning. */
object Upsert {

  /** Latest command per key (deterministic via `ordering` tiebreaks), with
    * rows matching `isDelete` treated as tombstones and dropped. A NULL
    * `isDelete` is an UPSERT (code-review r16: bare `!isDelete` is NULL
    * for a NULL predicate and the WHERE silently dropped the key — a
    * three-valued-logic trap, not last-write-wins semantics). */
  def lastWriteWins(commands: DataFrame, keys: Seq[String],
                    ordering: Seq[Column], isDelete: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering.map(_.desc): _*)
    commands.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && !coalesce(isDelete, lit(false)))
      .drop("__rn")
  }
}
