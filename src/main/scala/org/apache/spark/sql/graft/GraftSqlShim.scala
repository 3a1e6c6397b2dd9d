package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` bridge graft needs: build a DataFrame over an
  * already-partitioned internal-row RDD WITHOUT discarding what we know
  * about its physical layout. `spark.createDataFrame(rdd)` pins the plan to
  * `UnknownPartitioning`, so Catalyst re-shuffles state that is already
  * key-clustered; `Dataset.checkpoint` preserves partitioning through
  * exactly this constructor (LogicalRDD's outputPartitioning) but offers no
  * public path for an RDD we assembled ourselves (a KeyedState bucket
  * view). Spark's own `LogicalRDD` + `Dataset.ofRows` carry the layout
  * through analysis and planning — including attribute rewriting on
  * `newInstance()` when a self-referencing plan is deduplicated — so this
  * shim only forwards to them; no behavior is reimplemented. */
object GraftSqlShim {

  /** DataFrame over `rdd` with the given schema, declaring `partitioning`
    * (built against the returned frame's output attributes via
    * `attrsFor`). */
  def internalDf(spark: SparkSession, rdd: RDD[InternalRow],
                 schema: StructType,
                 partitioning: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] => Partitioning): DataFrame = {
    val attrs = DataTypeUtils.toAttributes(schema)
    val plan = LogicalRDD(attrs, rdd, partitioning(attrs), Nil, false, None)(
      spark.asInstanceOf[ClassicSession], None, None)
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
  }

  /** The analyzed-plan physical partition layout of a DataFrame's
    * materialization, as Spark would report it — used by specs to assert
    * exchange elision. */
  def executedPlanString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString
}
