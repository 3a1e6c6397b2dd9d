package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  * Reads are plain parquet scans so Catalyst pushes filters/projections
  * into the scan (PushedFilters / ReadSchema) — at 100 TB that pushdown,
  * not the operator code, is what bounds I/O. */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Spark 4 rejects parquet TIMESTAMP(NANOS) unless read as raw longs
    // (spark.sql.legacy.parquet.nanosAsLong, set by Verify/Bench/tests);
    // normalize any nanos-long timestamp columns back to TimestampType.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    var df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df = df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    // µs-unadjusted parquet timestamps arrive as TIMESTAMP_NTZ in Spark 4;
    // normalize to TimestampType (session tz is pinned UTC — instant-
    // preserving) so watermarks/window ops downstream see one type
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
      df = df.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    df
  }

  def z(spark: SparkSession, dir: String, name: String): ZSetFrame =
    ZSetFrame.fromTable(apply(spark, dir, name))
}
