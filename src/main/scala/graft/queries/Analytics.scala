package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Tables, ZSetFrame}

/** Declared queries batch 2: scalar/CASE suite, filtered distinct counts,
  * last-row / top-N per key, set ops, outer/semi/anti joins, as-of join,
  * rolling OVER windows, rollup, ranking — covering the reference's nexmark
  * q12-q22 surface plus SQL-compiler compositions (SURVEY.md §2.3-§2.6). */
object Analytics extends QueryModule {
  import Num._

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // GEO scalar surface under the oracle (reference fraud-detection demo's
    // ST_POINT / ST_DISTANCE, demo/project_demo02-FraudDetection/
    // project.sql:34): customer and supplier locations derived
    // deterministically from their keys, per-nation pair distances via the
    // haversine Geo.stDistance — the actual §2.8 geo functions, not a
    // reimplementation. Cross-engine float discipline: every input is an
    // exactly-representable double (integer grid + .5/.25 offsets), the
    // formula is mirrored token-for-token in the oracle so both engines
    // round the same operation sequence, and the output is FLOOR-quantized
    // to 0.1 km before aggregation — libm sin/asin differ by ≤ ~1 ulp
    // between engines (~1e-11 km at earth scale), eleven orders of
    // magnitude inside the quantum. Supplier side is broadcast (small dim);
    // the join is the per-nation pair expansion a geo-enrichment pipeline
    // would run, keyed and shuffle-free on the big side.
    "q86_geo_distance" -> ((s, dir) => {
      import graft.functions.Geo
      def pt(key: Column, a: Int, b: Int): Column = Geo.stPoint(
        (pmod(key * a, lit(360)) - 180).cast("double") + lit(0.5),
        (pmod(key * b, lit(160)) - 80).cast("double") + lit(0.25))
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"),
        pt(col("c_custkey"), 7, 13).as("cpt"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"),
        pt(col("s_suppkey"), 11, 17).as("spt"))
      c.join(broadcast(sup), Seq("nationkey"))
        .select(col("nationkey"),
          floor(Geo.stDistance(col("cpt"), col("spt")) * 10).cast("long")
            .as("dist_dam"))
        .groupBy("nationkey")
        .agg(count(lit(1)).as("n_pairs"), sum("dist_dam").as("sum_dist_dam"),
          max("dist_dam").as("max_dist_dam"))
    }),

    // scalar/CASE/date/string suite (nexmark q14 pattern)
    "q11_scalar_suite" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
          .otherwise("cold").as("pri_class"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        upper(substring(col("o_orderpriority"), 3, 100)).as("pri_name"),
        concat(col("o_orderstatus"), lit("-"), col("o_custkey").cast("string")).as("tag"),
        (col("o_totalprice") * lit(0.9)).as("discounted"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        (pmod(dayofweek(col("o_orderdate")) + lit(5), lit(7)) + 1).as("isodow"),
        datediff(to_date(lit("2002-01-01")), to_date(col("o_orderdate"))).as("age_days"))
    }),

    // proc-time tumble count (nexmark q12): 10-minute windows per user
    "q12_tumble_count" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), tumbleMs(col("ts"), 600000L).as("wstart"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    }),

    // filtered distinct-count suite (nexmark q15/q16)
    "q13_filtered_distinct" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          count(lit(1)).as("n_total"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(when(col("event_type") === "purchase", col("user_id"))).as("n_purchasers"),
          countDistinct(when(col("value") > 150.0, col("user_id"))).as("n_high"))
    }),

    // last row per key (nexmark q18)
    "q14_last_per_key" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
          epochMs(col("ts")).as("ts_ms"))
    }),

    // top-N per key (nexmark q19)
    "q15_topn_per_key" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("value"), col("rn"))
    }),

    // filter join (nexmark q20)
    "q16_filter_join" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .where(col("p_type") === "PROMO" && col("p_size").between(10, 40))
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      t(s, dir, "lineitem").join(broadcast(p), Seq("l_partkey"))
        .select("l_orderkey", "l_partkey", "l_quantity", "p_brand")
    }),

    // grouped aggregate suite (TPC-H Q1 shape; nexmark q17 family)
    "q17_agg_suite" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(to_date(col("l_shipdate")) <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("n"))
    }),

    // regexp extraction + CASE mapping (nexmark q21)
    "q18_regexp" -> ((s, dir) => {
      t(s, dir, "events").select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).as("k_str"),
        when(col("event_type") === "click", 0L)
          .when(col("event_type") === "view", 1L)
          .when(col("event_type") === "purchase", 2L)
          .otherwise(9L).as("type_code"))
    }),

    // split_index (nexmark q22)
    "q19_split" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        element_at(split(col("text"), " "), 3).as("tok3"),
        substring(col("source"), 4, 100).as("src_idx"))
    }),

    // UNION / INTERSECT / EXCEPT (SURVEY §2.3; compiler composition)
    "q20_setops" -> ((s, dir) => {
      val a = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
      val b = t(s, dir, "orders").where(col("o_totalprice") > 150000.0)
        .select(col("o_custkey").as("k"))
      val c = t(s, dir, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
      a.intersect(b).union(a.except(c)).distinct()
    }),

    // outer join with aggregates (SURVEY §2.4 outer_join_default)
    "q21_outer_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(col("o_totalprice").cast(DecimalType(18, 4))).cast("double"), lit(0.0))
            .as("total_spent"))
    }),

    // semi + anti join through the ZSetFrame ops (SURVEY §2.4)
    "q22_semi_anti" -> ((s, dir) => {
      val c = Tables.z(s, dir, "customer")
      val open = Tables.z(s, dir, "orders").where(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey"))
      val fin = Tables.z(s, dir, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("c_custkey"))
      c.semiJoin(open, Seq("c_custkey")).antiJoin(fin, Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name")).toDF
    }),

    // as-of join: latest click before each error, per user (reference
    // stream_join_range, operator/join_range.rs:39). UNION-SORT plan
    // (VERDICT r8 wrong #3): tag both sides into ONE frame, one window
    // over (user_id, ts) ascending, running `last(click) IGNORE NULLS` —
    // each error row reads the latest preceding click directly. ONE
    // shuffle on user_id, zero pair expansion: the former
    // theta-join + row_number()=1 plan materialized clicks×errors
    // candidates per user (a hot user with 10⁵ clicks × 10⁴ errors is
    // 10⁹ rows) before discarding all but one. Strictness (c.ts < e.ts):
    // at equal ts the error sorts BEFORE the clicks (is_click false <
    // true), so same-instant clicks never enter its frame; the ascending
    // (ts, event_id) order makes the running last = max (ts, id), the
    // exact (ts DESC, id DESC) rank-1 tie-break of the join form.
    "q23_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("event_type").isin("error", "click"))
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("event_type") === "click").as("is_click"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_click"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lc = last(when(col("is_click"),
        struct(col("ts").as("c_ts"), col("event_id").as("cid"))),
        ignoreNulls = true).over(w)
      ev.withColumn("lc", lc)
        .where(!col("is_click") && col("lc").isNotNull)
        .select(col("event_id"), col("user_id"),
          col("lc.cid").as("click_event_id"),
          (epochMs(col("ts")) - epochMs(col("lc.c_ts"))).as("gap_ms"))
    }),

    // rolling OVER window, RANGE frame (fraud-demo DQ22;
    // reference partitioned_rolling_aggregate, time_series/rolling_aggregate.rs:235)
    "q24_rolling" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_ms"))
        .rangeBetween(-3600000L, 0L)
      t(s, dir, "events")
        .withColumn("ts_ms", epochMs(col("ts")))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", sum(col("value").cast(DecimalType(18, 4))).over(w).cast("double"))
        .select("event_id", "user_id", "n_1h", "sum_1h")
    }),

    // ROLLUP grouping sets (SURVEY §2.5)
    "q25_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    }),

    // hopping (sliding) window counts: width 1h, slide 15m — each event
    // lands in 4 windows (reference nexmark q5 hop; window.rs HOP).
    // Spark's window(ts, "1 hour", "15 minutes") emits the same assignment;
    // expressed via explicit hop arithmetic for exact oracle parity.
    "q35_hop_count" -> ((s, dir) => {
      val slide = 900000L; val width = 3600000L
      val ms = epochMs(col("ts"))
      val firstHop = (ms - pmod(ms, lit(slide))) - lit(width - slide)
      val hops = transform(sequence(lit(0), lit(width / slide - 1)),
        i => firstHop + i * lit(slide))
      t(s, dir, "events")
        .select(col("user_id"), col("value"), explode(hops).as("wstart"))
        .groupBy("wstart")
        .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
    }),

    // CUBE grouping sets (SURVEY §2.5)
    "q38_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    }),

    // multiset set ops: INTERSECT ALL / EXCEPT ALL (SURVEY §2.3 — the
    // Z-set-native forms: weights preserved, not collapsed)
    "q39_setops_all" -> ((s, dir) => {
      val a = t(s, dir, "orders").where(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("k"))
      val b = t(s, dir, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
      a.intersectAll(b).withColumn("tag", lit("i"))
        .unionByName(a.exceptAll(b).withColumn("tag", lit("e")))
    }),

    // sessionization: 10-min-gap sessions per user (beyond-reference; the
    // batch twin of Spark's session_window). Session id = running count of
    // gap-breaks; one window shuffle on the user key.
    "q37_sessionize" -> ((s, dir) => {
      val order = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
      val run = order.rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "events")
        .withColumn("ts_ms", epochMs(col("ts")))
        .withColumn("brk",
          when(col("ts_ms") - lag(col("ts_ms"), 1).over(order) > 600000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum("brk").over(run))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_events"),
          (max("ts_ms") - min("ts_ms")).as("duration_ms"),
          min("ts_ms").as("session_start_ms"))
    }),

    // native SESSION WINDOW (Spark built-in session_window) — the streaming-
    // capable session operator the reference lacks (nexmark q11 has no DBSP
    // impl, benchmark/README.md:228); batch twin gated against the
    // gaps-and-islands oracle. Break iff gap ≥ 10 min (session_window merges
    // while next < last + gap).
    "q52_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(epochMs(col("session_window.start")).as("session_start_ms"),
          col("user_id"), col("n_events"), col("sum_value"))
    }),

    // ranking window suite: rank / dense_rank / lag / lead (SURVEY §2.6)
    "q26_rank_suite" -> ((s, dir) => {
      val byPrice = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val byDate = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(byPrice).as("rk"),
        dense_rank().over(byPrice).as("drk"),
        lag(col("o_orderkey"), 1).over(byDate).as("prev_order"),
        lead(col("o_orderkey"), 1).over(byDate).as("next_order"))
    }),

    // EXACT percentiles per group (p50/p95/p99 pricing distribution) — the
    // distribution-shape summary an analytics/quality pipeline ships.
    // Spark's `percentile` and DuckDB's `quantile_cont` both implement
    // linear interpolation between closest ranks (type-7), so the oracle
    // hash-matches exactly. At 100 TB the exact single-pass percentile is
    // a per-group sort-free OrderedCountFunction aggregate; the approx
    // path (percentile_approx/t-digest) is the knob when groups are huge.
    "q62_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.95)").as("p95"),
          expr("percentile(l_extendedprice, 0.99)").as("p99"),
          count(lit(1)).as("n"))
    })
  )

  override def oracle: Map[String, String] = Map(
    // token-for-token mirror of Geo.stDistance (same operand order, same
    // parenthesization, constant written as 2*6371.0088 so both engines
    // fold the identical double) — see the q86 scaladoc for the float
    // discipline that makes the hash gate sound
    "q86_geo_distance" ->
      """WITH c AS (
           SELECT c_nationkey AS nationkey,
             CAST((c_custkey*7) % 360 - 180 AS DOUBLE) + 0.5 AS clon,
             CAST((c_custkey*13) % 160 - 80 AS DOUBLE) + 0.25 AS clat
           FROM customer),
         s AS (
           SELECT s_nationkey AS nationkey,
             CAST((s_suppkey*11) % 360 - 180 AS DOUBLE) + 0.5 AS slon,
             CAST((s_suppkey*17) % 160 - 80 AS DOUBLE) + 0.25 AS slat
           FROM supplier),
         d AS (
           SELECT c.nationkey,
             CAST(floor(2*6371.0088*asin(sqrt(
               pow(sin(radians(slat - clat)/2), 2)
               + cos(radians(clat)) * cos(radians(slat))
                 * pow(sin(radians(slon - clon)/2), 2))) * 10) AS BIGINT)
               AS dist_dam
           FROM c JOIN s ON c.nationkey = s.nationkey)
         SELECT nationkey, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(dist_dam) AS BIGINT) AS sum_dist_dam,
           max(dist_dam) AS max_dist_dam
         FROM d GROUP BY 1""",
    "q62_percentiles" ->
      """SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.95) AS p95,
           quantile_cont(l_extendedprice, 0.99) AS p99,
           count(*) AS n
         FROM lineitem GROUP BY l_returnflag""",
    "q11_scalar_suite" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'hot' ELSE 'cold' END AS pri_class,
           year(o_orderdate) AS yr, month(o_orderdate) AS mo,
           upper(substr(o_orderpriority, 3)) AS pri_name,
           o_orderstatus || '-' || CAST(o_custkey AS VARCHAR) AS tag,
           o_totalprice * 0.9 AS discounted,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(isodow(o_orderdate) AS INT) AS isodow,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS age_days
         FROM orders""",
    "q12_tumble_count" ->
      s"""SELECT user_id, epoch_ms(ts) - epoch_ms(ts) % 600000 AS wstart,
            count(*) AS n_events, ${oSum("value")} AS sum_value
          FROM events GROUP BY 1, 2""",
    "q13_filtered_distinct" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n_total,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS n_purchasers,
           count(DISTINCT CASE WHEN value > 150 THEN user_id END) AS n_high
         FROM events GROUP BY 1""",
    "q14_last_per_key" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""",
    "q15_topn_per_key" ->
      """SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
         FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) <= 3""",
    "q16_filter_join" ->
      """SELECT l_orderkey, l_partkey, l_quantity, p_brand
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_type = 'PROMO' AND p_size BETWEEN 10 AND 40""",
    "q17_agg_suite" ->
      s"""SELECT l_returnflag, l_linestatus,
            ${oSum("l_quantity")} AS sum_qty,
            ${oSum("l_extendedprice")} AS sum_price,
            ${oSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
            ${oAvg("l_quantity")} AS avg_qty,
            min(l_extendedprice) AS min_price,
            max(l_extendedprice) AS max_price,
            count(*) AS n
          FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
          GROUP BY 1, 2""",
    "q18_regexp" ->
      """SELECT event_id, regexp_extract(props, '"k":\s*(\d+)', 1) AS k_str,
           CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
                           WHEN 'purchase' THEN 2 ELSE 9 END AS type_code
         FROM events""",
    "q19_split" ->
      """SELECT doc_id, split_part(text, ' ', 3) AS tok3, substr(source, 4) AS src_idx
         FROM documents""",
    "q20_setops" ->
      """WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
            b AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000),
            c AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
         SELECT k FROM ((SELECT k FROM a INTERSECT SELECT k FROM b)
                        UNION (SELECT k FROM a EXCEPT SELECT k FROM c)) t""",
    "q21_outer_join" ->
      """SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 0) AS DOUBLE) AS total_spent
         FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
         GROUP BY 1, 2""",
    "q22_semi_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
           AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""",
    "q23_asof_join" ->
      """SELECT e.event_id, e.user_id, c.event_id AS click_event_id,
           epoch_ms(e.ts) - epoch_ms(c.ts) AS gap_ms
         FROM (SELECT * FROM events WHERE event_type = 'error') e
         JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON c.user_id = e.user_id AND c.ts < e.ts
         QUALIFY row_number() OVER (PARTITION BY e.event_id ORDER BY c.ts DESC, c.event_id DESC) = 1""",
    "q24_rolling" ->
      """SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
                      RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)""",
    "q25_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n, ${oSum("l_quantity")} AS sum_qty
          FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q35_hop_count" ->
      """WITH h AS (
           SELECT user_id,
             unnest(list_transform(range(4),
               i -> (epoch_ms(ts) - epoch_ms(ts) % 900000) - 2700000 + i * 900000)) AS wstart
           FROM events)
         SELECT wstart, count(*) AS n_events, count(DISTINCT user_id) AS n_users
         FROM h GROUP BY 1""",
    "q38_cube" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n, ${oSum("l_quantity")} AS sum_qty
          FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    "q39_setops_all" ->
      """WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
            b AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
         SELECT k, 'i' AS tag FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) t1
         UNION ALL
         SELECT k, 'e' AS tag FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) t2""",
    "q52_session_window" ->
      """WITH g AS (
           SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= 600000 THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
         s AS (
           SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
           FROM g)
         SELECT min(ts_ms) AS session_start_ms, user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM s GROUP BY user_id, sid""",
    "q37_sessionize" ->
      """WITH g AS (
           SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 600000 THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
         s AS (
           SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
           FROM g)
         SELECT user_id, CAST(sid AS BIGINT) AS sid, count(*) AS n_events,
           max(ts_ms) - min(ts_ms) AS duration_ms, min(ts_ms) AS session_start_ms
         FROM s GROUP BY 1, 2""",
    "q26_rank_suite" ->
      """SELECT o_custkey, o_orderkey,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS drk,
           lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
           lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
         FROM orders"""
  )
}
