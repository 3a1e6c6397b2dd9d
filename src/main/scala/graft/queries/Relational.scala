package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}

import graft.core.{Tables, ZSetFrame}

/** Numeric helpers shared by query modules: make aggregates bit-identical
  * between Spark and the DuckDB oracle. Double sums are order-dependent, so
  * money sums go through DECIMAL(18,4) (exact, order-independent) and come
  * back as DOUBLE; averages divide that exact sum by the count (one IEEE
  * division — deterministic in both engines). */
object Num {
  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")
  /** Deterministic average built from dsum / count. */
  def davg(c: Column): Column = dsum(c) / count(c)
  /** DuckDB renderings of the same. */
  def oSum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"
  def oAvg(e: String): String = s"${oSum(e)} / COUNT($e)"
  /** Epoch milliseconds of a timestamp(-ntz) column, UTC semantics. */
  def epochMs(c: Column): Column = unix_millis(c.cast(TimestampType))
  /** Tumbling-window start in epoch ms. */
  def tumbleMs(c: Column, widthMs: Long): Column =
    (epochMs(c) - pmod(epochMs(c), lit(widthMs))).cast("long")
}

/** Declared queries DQ-style batch 1: scan/project, filter, joins, argmax,
  * tumbling windows — re-expressions of the reference's nexmark q1-q13
  * surface (reference: crates/nexmark/src/queries/) on the local testdata. */
object Relational extends QueryModule {
  import Num._

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q1 map: scan + project + arithmetic (nexmark q1, queries/q1.rs)
    "q01_project" -> ((s, dir) => {
      Tables.z(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .toDF
    }),

    // q2 filter: cheap predicate, pushed to the parquet scan (nexmark q2)
    "q02_filter" -> ((s, dir) => {
      Tables.z(s, dir, "lineitem")
        .where(pmod(col("l_orderkey"), lit(117L)) === 0L && col("l_quantity") > 25.0)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .toDF
    }),

    // q3 join+filter (nexmark q3): dim side broadcast — no shuffle of facts
    "q03_join_filter" -> ((s, dir) => {
      val c = Tables.z(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = Tables.z(s, dir, "orders").where(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      val joined = o.join(broadcastZ(c), Seq("c_custkey"))
      joined.select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice")).toDF
    }),

    // q4 join + max + avg (nexmark q4): per-priority avg of per-order max price
    "q04_join_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      val l = t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice")
      val perOrder = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderkey"))
        .agg(max("l_extendedprice").as("maxprice"))
      perOrder.groupBy("pri").agg(davg(col("maxprice")).as("avg_max"))
    }),

    // q5 hot keys: per-hour window, user(s) with the max event count
    "q05_hot_users" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val counts = e.groupBy(tumbleMs(col("ts"), 3600000L).as("wstart"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy("wstart").orderBy(col("n_events").desc)
      counts.withColumn("rk", rank().over(w)).where(col("rk") === 1)
        .select("wstart", "user_id", "n_events")
    }),

    // q6 last-10 average per key (nexmark q6)
    "q06_last10_avg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val frame = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey")).rowsBetween(-9, 0)
      val latest = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      o.withColumn("sdec", sum(col("o_totalprice").cast(DecimalType(18, 4))).over(frame).cast("double"))
        .withColumn("cnt", count(lit(1)).over(frame))
        .withColumn("rn", row_number().over(latest))
        .where(col("rn") === 1)
        .select(col("o_custkey"), (col("sdec") / col("cnt")).as("avg_last10"))
    }),

    // q7 tumble + global max join (nexmark q7 highest bid)
    "q07_tumble_max" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(tumbleMs(col("ts"), 3600000L).as("wstart"),
          col("event_id"), col("user_id"), col("value")).as("e")
      val m = e.groupBy("wstart").agg(max("value").as("maxv")).as("m")
      e.join(m, col("e.wstart") === col("m.wstart") && col("e.value") === col("m.maxv"))
        .select(col("e.wstart"), col("event_id"), col("user_id"), col("value"))
    }),

    // q8 tumble join (nexmark q8): signup and purchase in the same hour
    "q08_tumble_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      def byType(tp: String) = e.where(col("event_type") === tp)
        .select(tumbleMs(col("ts"), 3600000L).as("wstart"), col("user_id"))
      byType("signup").join(byType("purchase"), Seq("wstart", "user_id"), "left_semi")
        .distinct()
    }),

    // q9 argmax join (nexmark q9 winning bids): top lineitem per order
    "q09_argmax" -> ((s, dir) => {
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    }),

    // q13 side-input join: enrich the event stream with a broadcast dim
    "q10_side_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      e.join(broadcast(c), e("user_id") === c("c_custkey"))
        .select(col("event_id"), col("user_id"), col("c_name"), col("c_mktsegment"), col("value"))
    })
  )

  /** broadcast() a small ZSetFrame side. */
  private def broadcastZ(z: ZSetFrame): ZSetFrame = ZSetFrame.fromDelta(broadcast(z.df))

  override def oracle: Map[String, String] = Map(
    "q01_project" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS revenue FROM lineitem",
    "q02_filter" ->
      "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_orderkey % 117 = 0 AND l_quantity > 25",
    "q03_join_filter" ->
      """SELECT o.o_custkey AS c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
         FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
         WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'O'""",
    "q04_join_agg" ->
      s"""WITH m AS (SELECT o.o_orderpriority AS pri, o.o_orderkey, max(l.l_extendedprice) AS maxprice
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey GROUP BY 1, 2)
          SELECT pri, ${oSum("maxprice")} / COUNT(maxprice) AS avg_max FROM m GROUP BY pri""",
    "q05_hot_users" ->
      """WITH c AS (SELECT epoch_ms(ts) - epoch_ms(ts) % 3600000 AS wstart, user_id, count(*) AS n_events
           FROM events GROUP BY 1, 2)
         SELECT wstart, user_id, n_events FROM c
         QUALIFY rank() OVER (PARTITION BY wstart ORDER BY n_events DESC) = 1""",
    "q06_last10_avg" ->
      """WITH w AS (
           SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sdec,
             COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders)
         SELECT o_custkey, sdec / cnt AS avg_last10 FROM w WHERE rn = 1""",
    "q07_tumble_max" ->
      """WITH t AS (SELECT epoch_ms(ts) - epoch_ms(ts) % 3600000 AS wstart, event_id, user_id, value FROM events),
         m AS (SELECT wstart, max(value) AS maxv FROM t GROUP BY 1)
         SELECT t.wstart, t.event_id, t.user_id, t.value
         FROM t JOIN m ON t.wstart = m.wstart AND t.value = m.maxv""",
    "q08_tumble_join" ->
      """SELECT DISTINCT s.wstart, s.user_id FROM
           (SELECT epoch_ms(ts) - epoch_ms(ts) % 3600000 AS wstart, user_id FROM events WHERE event_type = 'signup') s
         JOIN
           (SELECT epoch_ms(ts) - epoch_ms(ts) % 3600000 AS wstart, user_id FROM events WHERE event_type = 'purchase') p
         ON s.wstart = p.wstart AND s.user_id = p.user_id""",
    "q09_argmax" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) = 1""",
    "q10_side_join" ->
      """SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment, e.value
         FROM events e JOIN customer c ON e.user_id = c.c_custkey"""
  )
}
