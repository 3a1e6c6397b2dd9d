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

  // ------------------------------------------------------------------ sinks

  /** CSV encoder + file output (reference CsvEncoder format/csv.rs:158 +
    * file output transport). Spark writes one file per partition in
    * parallel — the distributed twin of the reference's per-worker
    * encoder fan-in. */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header).csv(path)

  /** JSON-lines encoder + file output (reference JsonEncoder,
    * format/json.rs). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Kafka output transport (reference transport/kafka/output.rs): rows
    * must carry `key`/`value` binary or string columns. Code-only here —
    * no broker in the container (same status as kafkaStream). */
  def kafkaSink(df: DataFrame, brokers: String, topic: String,
                checkpoint: String): Unit = {
    val q = df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming file sink: append-mode, exactly-once via the sink manifest +
    * checkpoint (the reference's file output transport with fault-tolerant
    * resume; transport/file/output.rs). Blocks until the bounded input
    * drains. */
  def streamToFiles(df: DataFrame, path: String, checkpoint: String,
                    format: String = "csv"): Unit = {
    val q = df.writeStream.format(format)
      .option("path", path).option("checkpointLocation", checkpoint)
      .option("header", "true")
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
