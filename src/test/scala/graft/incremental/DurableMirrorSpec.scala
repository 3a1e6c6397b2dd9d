package graft.incremental

import org.apache.spark.sql.SparkSession

import graft.core.ZSetFrame

/** The shared durable-mirror protocol's lifecycle invariant (r17 review):
  * DurableKeyedState.merge pins the old touched-bucket view — it must be
  * materialized before its files are overwritten — for aggStep-style
  * consumers; a MIRROR never reads it, and dropping the returned tuple
  * leaked exactly one pinned frame per durable step (the r16 Bm25 mirror
  * had the leak too, swept only by the bench's between-query sweep).
  * DurableMirror.merge releases it; this spec pins the invariant on a
  * BARE mirror, where — unlike a full screened state with its spine
  * segments and deferred retirement — the persistent-RDD count across
  * merges is deterministic. Lives in package graft.incremental because
  * the mirror is an internal protocol class. */
class DurableMirrorSpec extends graft.SparkSpec {

  private def z(s: SparkSession, rows: Seq[(Long, Long, Long)]): ZSetFrame = {
    import s.implicits._
    ZSetFrame.fromDelta(rows.toDF("k", "v", ZSetFrame.W))
  }

  test("mirror merges release their per-step pins (r17 review)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mirleak").toString
    val m = DurableMirror.create(dir, Seq("k"), 4,
      z(spark, Seq.empty), "_graft_t_intent.txt", "_graft_t_consts.txt")
    m.intend(1L); m.merge(z(spark, Seq((1L, 1L, 1L)))); m.commit(1L, Nil)
    val before = spark.sparkContext.getPersistentRDDs.size
    (2 to 6).foreach { i =>
      m.intend(i.toLong)
      m.merge(z(spark, Seq((i.toLong, i.toLong, 1L), (1L, i.toLong, 1L))))
      m.commit(i.toLong, Seq("x" -> i.toString))
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    // pre-fix this grew by exactly one pinned old-view frame per merge;
    // ambient cleaner activity can only shrink the count, so ≤ 1 slack
    assert(after - before <= 1,
      s"mirror merges leak pinned frames: $before -> $after over 5 merges")
    // and the trace content is intact after the churn
    assert(m.dur.snapshot.consolidate.df.count() === 11)
  }
}
