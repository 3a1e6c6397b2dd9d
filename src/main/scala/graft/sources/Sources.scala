package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source adapters — the reference's transport×format matrix re-expressed as
  * Spark sources (reference: crates/adapters/src/transport/, operator/csv.rs,
  * operator/generator.rs). Parquet/CSV/JSON and the file-stream source are
  * exercised by queries/tests; Kafka wiring is provided but untestable here
  * (no broker in the container, zero egress). */
object Sources {

  /** CSV file → DataFrame (reference CsvSource, operator/csv.rs:27). */
  def csv(spark: SparkSession, path: String, header: Boolean = true,
          inferSchema: Boolean = true): DataFrame =
    spark.read.option("header", header).option("inferSchema", inferSchema).csv(path)

  /** Closure-driven synthetic source (reference Generator, generator.rs:12):
    * n rows derived from the index by pure column expressions. */
  def generator(spark: SparkSession, n: Long)(f: DataFrame => DataFrame): DataFrame =
    f(spark.range(n).toDF("id"))

  /** Kafka topic → streaming DataFrame (reference kafka transport,
    * crates/adapters/src/transport/kafka/input.rs). Value arrives as binary;
    * callers decode with from_csv/from_json. */
  def kafkaStream(spark: SparkSession, brokers: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .load()

  /** File-tail streaming source (reference file transport): directory watch,
    * one file per trigger — used by the q33/q34 streaming queries. */
  def fileStream(spark: SparkSession, dir: String,
                 schema: org.apache.spark.sql.types.StructType,
                 format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .format(format).load(dir)
}
