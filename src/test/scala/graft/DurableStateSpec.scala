package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.ZSetFrame
import graft.incremental.DurableKeyedState

/** Durable (disk-backed) keyed trace: a run interrupted by a "driver
  * restart" (fresh SparkSession, state re-attached from the parquet table)
  * must produce exactly the same state and output stream as an
  * uninterrupted run — the reference's persistent-spine recovery semantics
  * (crates/dbsp/src/trace/persistent/mod.rs). */
class DurableStateSpec extends SparkSpec {

  /** Deterministic delta #i, built against the GIVEN session (the restart
    * half must construct its inputs on the new session). Mixed ± weights. */
  private def delta(s: SparkSession, i: Int): ZSetFrame = {
    import s.implicits._
    val rows = (0 until 12).map { j =>
      val w = if ((i + j) % 4 == 0 && i > 1) -1L else 1L
      (((i * 5 + j * 3) % 16).toLong, ((i * 7 + j) % 50).toLong, w)
    }
    ZSetFrame.fromDelta(rows.toDF("k", "v", ZSetFrame.W))
  }

  private def emptyState(s: SparkSession): ZSetFrame = {
    import s.implicits._
    ZSetFrame.fromDelta(Seq.empty[(Long, Long, Long)].toDF("k", "v", ZSetFrame.W))
  }

  private def aggFn(z: ZSetFrame): ZSetFrame =
    z.aggregate(Seq(col("k")), expandWeights = false,
      max(col("v")).as("mx"), count(lit(1)).as("n"))

  test("restart with a new SparkSession resumes exactly (state + outputs)") {
    val dir1 = java.nio.file.Files.createTempDirectory("graft_dur1").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_dur2").toString

    // uninterrupted: 20 aggStep steps
    val st1 = DurableKeyedState.create(dir1, Seq("k"), 8, emptyState(spark))
    val outs1 = (1 to 20).map(i => st1.aggStep(delta(spark, i))(aggFn))

    // interrupted: 10 steps, then a fresh session re-attaches to the table
    DurableKeyedState.create(dir2, Seq("k"), 8, emptyState(spark))
    val stA = DurableKeyedState.restore(spark, dir2)
    val outsA = (1 to 10).map(i => stA.aggStep(delta(spark, i))(aggFn))
    val s2 = spark.newSession()
    val stB = DurableKeyedState.restore(s2, dir2)
    assert(stB.keys == Seq("k") && stB.nBuckets == 8) // sidecar round-trips
    val outsB = (11 to 20).map(i => stB.aggStep(delta(s2, i))(aggFn))

    // identical final state...
    assertSameRows(st1.snapshot.consolidate.df, stB.snapshot.consolidate.df)
    // ...and identical integrated output stream
    assertSameRows(
      ZSetFrame.sumAll(outs1).consolidate.df,
      (ZSetFrame.sumAll(outsA).consolidate.df
        unionByName ZSetFrame.sumAll(outsB).consolidate.df)
        .groupBy("k", "mx", "n").agg(sum(ZSetFrame.W).as(ZSetFrame.W))
        .where(col(ZSetFrame.W) =!= 0))
  }

  test("merge rewrites only touched bucket partitions on disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dur3").toString
    val st = DurableKeyedState.create(dir, Seq("k"), 8, emptyState(spark))
    st.merge(delta(spark, 1))
    def partMtimes(): Map[String, Long] = {
      val d = new java.io.File(dir)
      d.listFiles().filter(_.getName.startsWith("__bucket="))
        .map(f => f.getName -> f.listFiles().map(_.lastModified()).max).toMap
    }
    val before = partMtimes()
    Thread.sleep(1100) // mtime granularity
    // a single-key delta touches exactly one bucket
    import spark.implicits._
    val oneKey = ZSetFrame.fromDelta(Seq((3L, 99L, 1L)).toDF("k", "v", ZSetFrame.W))
    val touched = st.touchedBuckets(oneKey)
    assert(touched.size == 1)
    st.merge(oneKey)
    val after = partMtimes()
    val rewritten = after.filter { case (p, m) => before.get(p).forall(_ < m) }.keySet
    assert(rewritten == Set(s"__bucket=${touched.head}"),
      s"expected only ${touched.head} rewritten, got $rewritten")
  }

  test("full retraction clears the bucket on disk - retracted rows must not resurrect") {
    // code-review r15: dynamic partition overwrite only replaces
    // partitions PRESENT in the written data, so a bucket whose content
    // fully cancels used to keep its stale files and the retracted rows
    // came back on the next read. merge now deletes emptied partition
    // dirs explicitly.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_durret").toString
    val st = DurableKeyedState.create(dir, Seq("k"), 4, emptyState(spark))
    // key 1 is ALONE in its bucket only if no other key hashes there; use
    // a single key total so its bucket has exactly its rows
    st.merge(ZSetFrame.fromDelta(Seq((1L, 10L, 1L), (1L, 11L, 1L))
      .toDF("k", "v", ZSetFrame.W)))
    st.merge(ZSetFrame.fromDelta(Seq((1L, 10L, -1L), (1L, 11L, -1L))
      .toDF("k", "v", ZSetFrame.W)))
    assert(st.snapshot.consolidate.df.count() === 0,
      "fully retracted state must read back empty")
    // and a restart sees the same emptiness (the stale files are GONE,
    // not just masked by an in-memory view)
    val st2 = DurableKeyedState.restore(spark, dir)
    assert(st2.snapshot.consolidate.df.count() === 0)
  }

  /** Deterministic toy posting sets for the Bm25 durable-restart law —
    * one generator shared by both replay halves and both runs. */
  private def bmDoc(i: Int): Seq[(Long, String, Long, Long)] = {
    val pool = Seq("spark", "query", "alpha", "beta", "gamma")
    val r = new scala.util.Random(1700 + i)
    val terms = Seq.fill(2 + r.nextInt(4))(pool(r.nextInt(pool.size)))
      .groupBy(identity).toSeq.sortBy(_._1)
    val dl = terms.map(_._2.size).sum.toLong
    terms.map { case (t, xs) => (i.toLong, t, xs.size.toLong, dl) }
  }

  private def bmDelta(s: SparkSession, ids: Seq[Int], w: Long): ZSetFrame = {
    import s.implicits._
    ZSetFrame.fromDelta(ids.flatMap(bmDoc)
      .map { case (d, t, tf, dl) => (d, t, tf, dl, w) }
      .toDF("doc_id", "term", "tf", "dl", ZSetFrame.W))
  }

  test("durable Bm25: teardown + new-session restore resumes exactly (VERDICT r15 #4)") {
    import graft.incremental.Bm25State
    val qterms = Seq("spark", "query")
    def emptyP(s: SparkSession) = {
      import s.implicits._
      ZSetFrame.fromTable(Seq.empty[(Long, String, Long, Long)]
        .toDF("doc_id", "term", "tf", "dl"))
    }
    val steps: Seq[(Seq[Int], Long)] = Seq(
      (0 until 10, 1L), (10 until 18, 1L), (Seq(3, 11), -1L),
      (18 until 24, 1L), (Seq(5, 20), -1L))
    // uninterrupted control: plain in-memory state
    val st1 = new Bm25State(emptyP(spark), qterms, nBuckets = 8)
    val outs1 = steps.map { case (ids, w) => st1.step(bmDelta(spark, ids, w)) }
    st1.close()
    // durable run: 3 steps, TEARDOWN (every in-memory trace released),
    // restore on a FRESH SparkSession, remaining 2 steps
    val dir = java.nio.file.Files.createTempDirectory("graft_durbm").toString
    var st2 = new Bm25State(emptyP(spark), qterms, nBuckets = 8,
      durablePath = Some(dir))
    val outsA = steps.take(3).map { case (ids, w) =>
      st2.step(bmDelta(spark, ids, w)) }
    assert(st2.committedGen == 3L)
    st2.close()
    val s2 = spark.newSession()
    st2 = Bm25State.restore(s2, dir, qterms, nBuckets = 8)
    assert(st2.committedGen == 3L) // the sidecar's ack watermark round-trips
    val outsB = steps.drop(3).map { case (ids, w) =>
      st2.step(bmDelta(s2, ids, w)) }
    st2.close()
    // identical integrated output stream — recovery loses nothing
    assertSameRows(
      ZSetFrame.sumAll(outs1).consolidate.df,
      (ZSetFrame.sumAll(outsA).consolidate.df
        unionByName ZSetFrame.sumAll(outsB).consolidate.df)
        .groupBy("doc_id", "score_q", "rnk")
        .agg(sum(ZSetFrame.W).as(ZSetFrame.W))
        .where(col(ZSetFrame.W) =!= 0))
    // attaching with DIFFERENT standing queries must fail loudly: the
    // durable trace is restricted to the writer's union term set
    val e = intercept[IllegalArgumentException] {
      Bm25State.restore(s2, dir, Seq("spark", "other"), nBuckets = 8)
    }
    assert(e.getMessage.contains("qsets"))
    // ... as must a different grid/topK (the state's identity — a restore
    // under another quantization rebuilds scores that never cancel against
    // the consumer's integrated pre-restart output; code-review r16)
    val eg = intercept[IllegalArgumentException] {
      Bm25State.restore(s2, dir, qterms, nBuckets = 8, grid = 1e4)
    }
    assert(eg.getMessage.contains("grid"))
    // TORN-STEP DETECTION: an intent marker newer than the committed gen
    // (a crash between a step's trace write and its commit) must REFUSE
    // restore — replaying the delta would double-apply it (the merge is
    // not idempotent; code-review r16)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_graft_bm25_intent.txt"),
      "gen=99\n".getBytes("UTF-8"))
    val et = intercept[IllegalArgumentException] {
      Bm25State.restore(s2, dir, qterms, nBuckets = 8)
    }
    assert(et.getMessage.contains("TORN"))
  }

  /** Deterministic toy postings for the TfIdf durable-restart law (the
    * bmDoc shape without dl — TfIdf is length-free). */
  private def tfDelta(s: SparkSession, ids: Seq[Int], w: Long): ZSetFrame = {
    import s.implicits._
    ZSetFrame.fromDelta(ids.flatMap(bmDoc)
      .map { case (d, t, tf, _) => (d, t, tf, w) }
      .toDF("doc_id", "term", "tf", ZSetFrame.W))
  }

  test("durable TfIdf: teardown + new-session restore resumes exactly (VERDICT r16 #4)") {
    import graft.incremental.TfIdfState
    def emptyP(s: SparkSession) = {
      import s.implicits._
      ZSetFrame.fromTable(Seq.empty[(Long, String, Long)]
        .toDF("doc_id", "term", "tf"))
    }
    val steps: Seq[(Seq[Int], Long)] = Seq(
      (0 until 10, 1L), (10 until 18, 1L), (Seq(3, 11), -1L),
      (18 until 24, 1L), (Seq(5, 20), -1L))
    // uninterrupted control: plain in-memory state (shrunken C so the df
    // drift actually crosses floors — the pruning regime at toy sizes)
    val st1 = new TfIdfState(emptyP(spark), nBuckets = 8, C = 40L)
    val outs1 = steps.map { case (ids, w) => st1.step(tfDelta(spark, ids, w)) }
    st1.close()
    // durable run: 3 steps, TEARDOWN (every in-memory trace released),
    // restore on a FRESH SparkSession through the SHARED DurableMirror
    // protocol, remaining 2 steps
    val dir = java.nio.file.Files.createTempDirectory("graft_durtf").toString
    var st2 = new TfIdfState(emptyP(spark), nBuckets = 8, C = 40L,
      durablePath = Some(dir))
    val outsA = steps.take(3).map { case (ids, w) =>
      st2.step(tfDelta(spark, ids, w)) }
    assert(st2.committedGen == 3L)
    st2.close()
    val s2 = spark.newSession()
    st2 = TfIdfState.restore(s2, dir, nBuckets = 8, C = 40L)
    assert(st2.committedGen == 3L) // the sidecar's ack watermark round-trips
    val outsB = steps.drop(3).map { case (ids, w) =>
      st2.step(tfDelta(s2, ids, w)) }
    st2.close()
    // identical integrated output stream — recovery loses nothing
    assertSameRows(
      ZSetFrame.sumAll(outs1).consolidate.df,
      (ZSetFrame.sumAll(outsA).consolidate.df
        unionByName ZSetFrame.sumAll(outsB).consolidate.df)
        .groupBy("doc_id", "term", "tf", "score_q")
        .agg(sum(ZSetFrame.W).as(ZSetFrame.W))
        .where(col(ZSetFrame.W) =!= 0))
    // attaching with a DIFFERENT quantization must fail loudly: C is the
    // state's identity — a mismatched restore would rebuild top-1 rows
    // that never cancel against the consumer's integrated output
    val ec = intercept[IllegalArgumentException] {
      TfIdfState.restore(s2, dir, nBuckets = 8, C = 999L)
    }
    assert(ec.getMessage.contains("quantization C"))
    // TORN-STEP DETECTION through the shared protocol: an intent marker
    // newer than the committed gen must REFUSE restore
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_graft_tfidf_intent.txt"),
      "gen=99\n".getBytes("UTF-8"))
    val et = intercept[IllegalArgumentException] {
      TfIdfState.restore(s2, dir, nBuckets = 8, C = 40L)
    }
    assert(et.getMessage.contains("TORN"))
  }

  test("crash debris: a partition dir outside the committed live set is ignored") {
    // ADVICE r15: the emptied-dir delete runs AFTER the meta's live-bucket
    // commit — a crash between them leaves the stale dir on disk. Readers
    // (including a fresh restore) must ignore it: resurrection is
    // impossible regardless of where the crash lands.
    import spark.implicits._
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = java.nio.file.Files.createTempDirectory("graft_durdebris").toString
    val st = DurableKeyedState.create(dir, Seq("k"), 4, emptyState(spark))
    st.merge(ZSetFrame.fromDelta(Seq((1L, 10L, 1L), (1L, 11L, 1L))
      .toDF("k", "v", ZSetFrame.W)))
    // snapshot the live bucket dir's files (what a crashed delete leaves)
    val bdir = new java.io.File(dir).listFiles()
      .find(_.getName.startsWith("__bucket=")).get
    val saved = bdir.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
      val tmp = Files.createTempFile("debris", ".parquet")
      Files.copy(f.toPath, tmp, StandardCopyOption.REPLACE_EXISTING); (f.getName, tmp)
    }
    // full retraction: meta now excludes the bucket AND the dir is deleted
    st.merge(ZSetFrame.fromDelta(Seq((1L, 10L, -1L), (1L, 11L, -1L))
      .toDF("k", "v", ZSetFrame.W)))
    // simulate the crash-before-delete: put the stale dir back
    Files.createDirectories(bdir.toPath)
    saved.foreach { case (name, tmp) =>
      Files.copy(tmp, Paths.get(bdir.toString, name),
        StandardCopyOption.REPLACE_EXISTING) }
    // both the live handle and a fresh restore must read EMPTY state
    assert(st.snapshot.consolidate.df.count() === 0,
      "stale partition dir must be invisible to the live handle")
    val st2 = DurableKeyedState.restore(spark, dir)
    assert(st2.snapshot.consolidate.df.count() === 0,
      "stale partition dir must be invisible after restore")
  }

  test("merge fails loudly when knownTouched misses a delta bucket") {
    // code-review r15: an under-inclusive span would make the dynamic
    // overwrite REPLACE an unread partition with just the delta rows -
    // destroying its other keys. The audit must throw instead.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_durrogue").toString
    val st = DurableKeyedState.create(dir, Seq("k"), 8, emptyState(spark))
    // seed many keys across buckets
    st.merge(ZSetFrame.fromDelta((0L until 16L).map(k => (k, k, 1L))
      .toDF("k", "v", ZSetFrame.W)))
    val before = st.snapshot.consolidate.df.count()
    val bad = intercept[IllegalArgumentException] {
      st.merge(ZSetFrame.fromDelta(Seq((3L, 99L, 1L))
        .toDF("k", "v", ZSetFrame.W)), knownTouched = Some(Seq(-1)))
    }
    assert(bad.getMessage.contains("knownTouched"))
    // the failed merge wrote nothing: state intact
    assert(st.snapshot.consolidate.df.count() === before)
  }
}
