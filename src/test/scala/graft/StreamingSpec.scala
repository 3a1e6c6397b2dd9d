package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{KvDelta, StreamOps, UpsertCmd}

/** Streaming ≡ batch: drive micro-batches through MemoryStream and compare
  * against the batch computation over the accumulated input — the same law
  * the reference's nexmark rstest suites assert per step. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("upsert delta stream: consolidated deltas == last-write-wins snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[UpsertCmd]
    val deltas = StreamOps.upsertDeltas(in.toDS())
    val q = deltas.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("upsert_out").start()
    // step 1: set k1=1.0, k2=2.0 (k2 twice — last write in batch wins)
    in.addData(UpsertCmd(1, 1.0, 1, delete = false), UpsertCmd(2, 9.0, 2, delete = false),
      UpsertCmd(2, 2.0, 3, delete = false))
    q.processAllAvailable()
    // step 2: overwrite k1, delete k2, no-op delete of absent k3
    in.addData(UpsertCmd(1, 5.0, 4, delete = false), UpsertCmd(2, 0.0, 5, delete = true),
      UpsertCmd(3, 0.0, 6, delete = true))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("upsert_out").as[KvDelta].collect().toSeq
    // consolidate: sum weights per (key, value)
    val net = out.groupBy(d => (d.key, d.value)).view
      .mapValues(_.map(_.weight).sum).filter(_._2 != 0L).toMap
    assert(net == Map((1L, 5.0) -> 1L)) // k1=5.0 live; k2 deleted; k3 never existed
    // and no spurious intermediate emissions beyond the transition protocol
    assert(out.size == 5) // +1.0, +2.0 | -1.0, +5.0, -2.0
  }

  test("streaming tumbling counts == batch group-by over accumulated input") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = in.toDF().toDF("ts", "user_id", "value")
    val agg = StreamOps.tumblingCounts(events, "ts", "user_id", "10 minutes", "0 seconds")
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("tumble_out").start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    in.addData((ts(1), 1L, 10.0), (ts(2), 1L, 5.0), (ts(11), 2L, 7.0))
    q.processAllAvailable()
    in.addData((ts(25), 1L, 1.0), (ts(59), 9L, 2.0)) // advances watermark past w0/w1
    q.processAllAvailable()
    q.stop()
    val got = spark.table("tumble_out")
      .select(unix_timestamp(col("wstart")).as("w"), col("user_id"), col("n"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    // windows closed by the watermark: [00:00,00:10) user1, [00:10,00:20) user2
    assert(got.contains((base, 1L, 2L, 15.0)))
    assert(got.contains((base + 600, 2L, 1L, 7.0)))
  }

  test("foreachBatch incremental pipeline: join+agg over micro-batch deltas == batch") {
    import graft.core.ZSetFrame
    import graft.incremental.Incremental
    // stage events as 3 files → 3 micro-batches (one circuit step each)
    val src = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    val dir = java.nio.file.Files.createTempDirectory("graft_chunks").toString
    src.repartition(3).write.mode("overwrite").parquet(dir)
    val dim = ZSetFrame.fromTable(
      spark.read.parquet(s"$sf0001/customer.parquet")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment")))
    // pipeline state: joined = events ⋈ dim (incremental), agg = count per segment
    val evSt = new Incremental.State(ZSetFrame.fromTable(src.where(lit(false))))
    val aggSt = new Incremental.State(Incremental.emptyLike(
      dim.select(col("c_mktsegment"))))
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    graft.streaming.StreamOps.incrementalPipeline(stream) { (batch, _) =>
      val d = ZSetFrame.fromTable(batch)
      evSt.update(d)
      val joinedDelta = d.join(dim, Seq("user_id")) // dim static: ΔA⋈B
      aggSt.update(Incremental.linearAggDelta(joinedDelta, Seq(col("c_mktsegment")), lit(1L)))
    }
    val got = aggSt.acc.df.select(col("c_mktsegment"), col(ZSetFrame.W).as("n"))
    val expect = src.join(dim.toDF, Seq("user_id"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    assertSameRows(got, expect)
  }

  test("transformWithState upsert (RocksDB) matches the fMGWS semantics") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[UpsertCmd]
      val q = StreamOps.upsertDeltasTws(in.toDS()).writeStream
        .outputMode(OutputMode.Append).format("memory")
        .queryName(s"tws_out_${System.nanoTime()}").start()
      val name = q.name
      in.addData(UpsertCmd(1, 1.0, 1, delete = false),
        UpsertCmd(2, 9.0, 2, delete = false), UpsertCmd(2, 2.0, 3, delete = false))
      q.processAllAvailable()
      in.addData(UpsertCmd(1, 5.0, 4, delete = false),
        UpsertCmd(2, 0.0, 5, delete = true), UpsertCmd(3, 0.0, 6, delete = true))
      q.processAllAvailable()
      q.stop()
      val out = spark.table(name).as[KvDelta].collect().toSeq
      val net = out.groupBy(d => (d.key, d.value)).view
        .mapValues(_.map(_.weight).sum).filter(_._2 != 0L).toMap
      assert(net == Map((1L, 5.0) -> 1L))
      assert(out.size == 5) // +1.0, +2.0 | -1.0, +5.0, -2.0
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("TTL'd upsert state stays bounded under a 3× longer feed") {
    import graft.streaming.TimedUpsertCmd
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TimedUpsertCmd]
    // 30-minute idle horizon, no lateness
    val deltas = StreamOps.upsertDeltasTtl(in.toDS(), "0 seconds", 1800000L)
    val q = deltas.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(s"ttl_out_${System.nanoTime()}").start()
    def ts(hour: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00")
    val waveSize = 50
    // 6 waves, disjoint keys, one hour apart: every wave makes the previous
    // wave's keys idle past the horizon → evicted, not accumulated
    for (w <- 0 until 6) {
      in.addData((0 until waveSize).map(i =>
        TimedUpsertCmd(w * 1000L + i, w + i * 1.0, w, delete = false, ts(w))))
      q.processAllAvailable()
    }
    val stateRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
    q.stop()
    val totalKeys = 6 * waveSize
    assert(stateRows.last <= 2 * waveSize,
      s"final state ${stateRows.last} not bounded (total keys $totalKeys)")
    assert(stateRows.max < totalKeys,
      s"state ${stateRows.max} grew like the lifetime key count")
  }

  test("TTL'd upsert survives a fully-late out-of-order wave") {
    import graft.streaming.TimedUpsertCmd
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TimedUpsertCmd]
    // 30-minute horizon: a wave whose event times sit hours BEHIND the
    // watermark gets a timeout below the watermark unless clamped — Spark
    // kills the query with IllegalArgumentException in that case
    val deltas = StreamOps.upsertDeltasTtl(in.toDS(), "0 seconds", 1800000L)
    val q = deltas.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(s"late_out_${System.nanoTime()}").start()
    def ts(hour: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00")
    in.addData(TimedUpsertCmd(1, 1.0, 1, delete = false, ts(2)))
    q.processAllAvailable() // watermark → 02:00
    // fully-late wave: maxTs + horizon = 00:30 < watermark. Spark 4.1
    // drops rows older than the late-events watermark before the state
    // function (the trace-bound row filter); the timeout clamp in
    // upsertDeltasTtl guards the remaining edge where a group's maxTs
    // lands between the late-events and eviction watermarks. Either way
    // the query must survive, and the late key must not poison state.
    in.addData(TimedUpsertCmd(7, 7.0, 2, delete = false, ts(0)))
    q.processAllAvailable() // must not throw
    in.addData(TimedUpsertCmd(1, 2.0, 3, delete = false, ts(3)))
    q.processAllAvailable()
    assert(q.isActive, "query died on the late wave")
    q.stop()
    val out = spark.table(q.name).as[KvDelta].collect().toSeq
    val net = out.groupBy(d => (d.key, d.value)).view
      .mapValues(_.map(_.weight).sum).filter(_._2 != 0L).toMap
    assert(net == Map((1L, 2.0) -> 1L)) // late row GC'd, live key intact
  }

  test("BoundedState evicts below the waterline and stays window-exact") {
    import graft.core.ZSetFrame
    import graft.incremental.Incremental
    val n = 9
    def delta(i: Int) = ZSetFrame.fromTable(
      Seq.tabulate(4)(j => (i.toLong, (i * 4 + j).toLong, 1.0))
        .toDF("ts", "id", "v"))
    val st = new Incremental.BoundedState(
      ZSetFrame.fromTable(Seq.empty[(Long, Long, Double)].toDF("ts", "id", "v")),
      "ts")
    val horizon = 3L
    for (i <- 0 until n) st.update(delta(i), i.toLong - horizon)
    // rows older than the final waterline are gone; the retained window is
    // exactly the last horizon+1 steps' rows
    val kept = st.acc.df.count()
    assert(kept == (horizon + 1) * 4, s"state rows $kept")
    assert(st.acc.df.agg(min("ts")).head.getLong(0) == n - 1 - horizon)
  }

  test("stageDir self-heals a half-staged dir and keys readiness on the sentinel") {
    import java.nio.file.{Files, Paths}
    val tag = "healtest"
    val stamp = Files.getLastModifiedTime(
      Paths.get(s"$sf0001/events.parquet")).toMillis.toHexString
    val staged = Paths.get(
      s"/tmp/graft_stream_${tag}_${stamp}_${sf0001.replaceAll("[^A-Za-z0-9]", "_")}")
    // simulate a crash between createDirectories and the sentinel publish:
    // dir exists, events symlink exists, but no zz_flush.parquet marker
    if (Files.exists(staged)) {
      val w = Files.walk(staged)
      try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(Files.deleteIfExists(_))
      finally w.close()
    }
    Files.createDirectories(staged)
    Files.createSymbolicLink(staged.resolve("events.parquet"),
      Paths.get(s"$sf0001/events.parquet"))
    assert(!Files.exists(staged.resolve("zz_flush.parquet")))
    // pre-poison: crash debris from "an earlier run" — a half-built _build_
    // dir and a _pq spill dir. The self-heal path must sweep both (a test
    // run killed mid-publish previously left such debris, and this test
    // then failed on every later run until /tmp was cleaned by hand).
    val debrisBuild = staged.resolveSibling(staged.getFileName.toString + "_build_deadbeef")
    val debrisPq = staged.resolveSibling(staged.getFileName.toString + "_build_deadbeef_pq")
    Seq(debrisBuild, debrisPq).foreach { d =>
      if (!Files.exists(d)) Files.createDirectories(d)
      Files.write(d.resolve("junk"), Array[Byte](1, 2, 3))
      // back-date past the sweep's 60 s age guard (real debris is from a
      // previous run; fresh dirs are presumed in-flight and left alone)
      Seq(d.resolve("junk"), d).foreach(p => Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L)))
    }
    val out = graft.queries.StreamingQueries.stageDir(
      spark, sf0001, tag, sentinel = true)
    assert(out == staged.toString)
    assert(Files.exists(staged.resolve("zz_flush.parquet")), "dir did not self-heal")
    assert(Files.isSymbolicLink(staged.resolve("events.parquet")))
    // second call is a no-op fast path (marker present)
    assert(graft.queries.StreamingQueries.stageDir(
      spark, sf0001, tag, sentinel = true) == staged.toString)
    // no _build_/_pq leftovers
    val sib = Files.list(staged.getParent)
    val leftovers = try {
      import scala.jdk.CollectionConverters._
      sib.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith(s"graft_stream_${tag}") &&
          (n.contains("_build_") || n.endsWith("_pq"))).toList
    } finally sib.close()
    assert(leftovers.isEmpty, s"staging leftovers: $leftovers")
  }

  test("q68 streaming session windows ≡ q52 batch session_window, frame for frame") {
    // gap-based sessions have data-dependent extents (late events merge
    // open sessions) — the streaming engine's mergeable session state must
    // converge to exactly the batch result once the sentinel closes tails
    assertSameRows(
      graft.queries.StreamingQueries.queries("q68_stream_session")(spark, sf0001),
      graft.queries.Analytics.queries("q52_session_window")(spark, sf0001))
  }

  test("q67 update-mode chain ≡ batch count-bucket histogram") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.StreamingQueries.queries("q67_update_chain")(spark, sf0001)
    val batch = spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .select(expr("n div 8").as("bucket"), col("user_id"))
      .groupBy("bucket").agg(count(lit(1)).as("n_users"))
    assertSameRows(got, batch)
  }

  test("running fold emits updated accumulator per step") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val q = StreamOps.runningSum(in.toDS()).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("fold_out").start()
    in.addData((1L, 1.0), (1L, 2.0), (2L, 10.0))
    q.processAllAvailable()
    in.addData((1L, 4.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("fold_out").as[(Long, Double)].collect().toSet
    assert(rows == Set((1L, 3.0), (2L, 10.0), (1L, 7.0)))
  }
}
