package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.core.Tables
import graft.streaming.{KvDelta, StreamOps, UpsertCmd}

/** Structured Streaming runs surfaced through the batch oracle gate: each
  * query drives a REAL streaming query (file source → stateful ops → memory
  * sink) and its final output must equal the batch SQL oracle — the
  * streaming twin of the step-loop checks in Advanced. */
object StreamingQueries extends QueryModule {
  import Num._

  /** Streaming read of the events table (file source, bounded). The file
    * source requires a directory, so stage a symlink dir under /tmp. */
  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val staged = Paths.get(s"/tmp/graft_stream_src_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    if (!Files.exists(staged)) {
      Files.createDirectories(staged)
      Files.createSymbolicLink(staged.resolve("events.parquet"),
        Paths.get(s"$dir/events.parquet"))
    }
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema // raw: ts as INT64 nanos
    var df = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df = df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    df
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // complete-mode streaming tumble aggregation == batch group-by
    "q33_stream_tumble" -> ((s, dir) => {
      val agg = eventStream(s, dir)
        .groupBy(tumbleMs(col("ts"), 3600000L).as("wstart"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      StreamOps.runToMemory(s, agg, s"stream_tumble_${System.nanoTime()}",
        OutputMode.Complete)
    }),

    // streaming upsert (flatMapGroupsWithState −old/+new deltas) consolidated
    // to the final snapshot == batch last-write-wins oracle
    "q34_stream_upsert" -> ((s, dir) => {
      import s.implicits._
      val cmds = eventStream(s, dir).select(
        col("user_id").as("key"), col("value"),
        (epochMs(col("ts")) * 100000L + pmod(col("event_id"), lit(100000L))).as("seq"),
        (col("event_type") === "error").as("delete")).as[UpsertCmd]
      val deltas = StreamOps.upsertDeltas(cmds)
      val out = StreamOps.runToMemory(s, deltas.toDF(),
        s"stream_upsert_${System.nanoTime()}", OutputMode.Append)
      // consolidate the delta stream into the live snapshot
      out.groupBy("key", "value").agg(sum("weight").as("w"))
        .where(col("w") > 0).select(col("key").as("user_id"), col("value"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q33_stream_tumble" ->
      s"""SELECT epoch_ms(ts) - epoch_ms(ts) % 3600000 AS wstart, event_type,
            count(*) AS n, ${oSum("value")} AS sum_value
          FROM events GROUP BY 1, 2""",
    "q34_stream_upsert" ->
      """SELECT user_id, value FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
           AND event_type <> 'error'"""
  )
}
