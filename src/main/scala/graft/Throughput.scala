package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throughput benchmark comparable to BASELINE.md: the reference's Nexmark
  * numbers are events/second over a 100M-event generator-fed streaming run
  * (reference: benchmark/README.md:184-229). Here the same query shapes run
  * over a generator-fed pipeline of `rowsN` synthetic bid events
  * (`spark.range` → codegen'd projections — the generator runs inside the
  * job exactly like the reference's in-process generator threads), forced
  * end-to-end through the noop sink so nothing is pruned or collected.
  * Metric: rows/s per query family + the ratio to the reference's ev/s. */
object Throughput {

  val rowsN: Long = 20000000L

  /** Nexmark-ish bid stream: auction, bidder, price, event-time. */
  private def bids(spark: SparkSession): DataFrame =
    spark.range(rowsN).select(
      pmod(col("id"), lit(1000L)).as("auction"),
      pmod(col("id") * 2654435761L, lit(10007L)).as("bidder"),
      (pmod(hash(col("id")), lit(10000)).cast("long") + 100L).as("price"),
      (col("id") * 10L).as("ts_ms"))

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** (name, DBSP baseline ev/s, query). Shapes follow the reference's
    * nexmark queries (reference: crates/nexmark/src/queries/q1.rs, q2.rs,
    * q4.rs, q5.rs, q7.rs). */
  private def families(spark: SparkSession): Seq[(String, Double, DataFrame)] = {
    val b = bids(spark)
    val category = spark.range(1000L)
      .select(col("id").as("auction"), pmod(col("id"), lit(10L)).as("cat"))
    Seq(
      ("q0_pass", 9926544d, b),
      // q1: currency conversion map
      ("q1_map", 9942334d, b.select(col("auction"), col("bidder"),
        (col("price") * 89L / 100L).as("price_eur"), col("ts_ms"))),
      // q2: selection by auction id
      ("q2_filter", 9927529d, b.where(pmod(col("auction"), lit(123L)) === 0)),
      // q4-ish: max price per auction joined to category, avg per category
      ("q4_join_agg", 9768487d,
        b.groupBy("auction").agg(max("price").as("final"))
          .join(broadcast(category), "auction")
          .groupBy("cat").agg(avg("final").as("avg_final"))),
      // q3-ish: filter + broadcast dim join + project
      ("q3_filter_join", 9936407d,
        b.where(pmod(col("auction"), lit(4L)) === 0)
          .join(broadcast(category), "auction")
          .select(col("auction"), col("bidder"), col("price"), col("cat"))),
      // q21-ish: regex channel extraction over a derived string
      ("q21_regex", 9760859d,
        b.select(col("auction"),
          regexp_extract(concat(lit("ch_"), col("bidder"), lit("_end")),
            "ch_([0-9]+)_end", 1).as("channel"))),
      // q5-ish: hot items — bids per auction per tumbling window
      ("q5_window", 9906875d,
        b.groupBy((col("ts_ms") - pmod(col("ts_ms"), lit(10000L))).as("wstart"),
            col("auction"))
          .agg(count(lit(1)).as("n"))),
      // q7-ish: highest bid per window
      ("q7_maxbid", 7380618d,
        b.groupBy((col("ts_ms") - pmod(col("ts_ms"), lit(10000L))).as("wstart"))
          .agg(max("price").as("max_price"))))
  }

  /** JSON: per-family rows/s, ratio vs the reference ev/s, and the 2× gate. */
  def json(spark: SparkSession): String = {
    val fams = families(spark)
    fams.foreach { case (_, _, df) => force(df.limit(1000)) } // codegen warmup
    val parts = fams.map { case (name, base, df) =>
      val t0 = System.nanoTime()
      force(df)
      val sec = (System.nanoTime() - t0) / 1e9
      val rps = rowsN / sec
      f""""$name":{"rows_per_sec":${rps.toLong},"baseline_ev_per_sec":${base.toLong},"ratio":${base / rps}%.2f,"within_2x":${rps * 2 >= base}}"""
    }
    s"""{"rows":$rowsN,${parts.mkString(",")}}"""
  }
}
