package graft.incremental

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.core.ZSetFrame

/** Incremental LINEAR rolling-window aggregate over a TIME-CHUNKED spine —
  * the Spark rendition of the reference's radix-tree rolling aggregate
  * (reference: crates/dbsp/src/operator/time_series/radix_tree/mod.rs:1-60,
  * rolling_aggregate.rs:235): alongside the event spine it maintains
  * per-(key, time-chunk) SUM/COUNT partials, and a step ASSEMBLES each
  * affected row's frame value from full-chunk partials plus two edge-chunk
  * scans — no window sort over the restricted range at all.
  *
  * Layout: both states are `KeyedState`s keyed by (key, chunk) where
  * chunk = floorDiv(ts, chunkLen) — the radix tree's level-0 time index
  * realized through the existing hash-bucket machinery, so a step's reads
  * prune BY TIME as well as by key: data touched per step is
  * O(touched keys × frame-adjacent chunks), independent of how long the
  * keys' histories grow. (A plain key-partitioned trace re-reads a bucket
  * that grows with history; a (key, chunk) bucket doesn't.)
  *
  * The step computes the output delta DIRECTLY (no old-vs-new window
  * recompute): over the affected span [lo, hi + horizon],
  *   F_new(k, t)  — assembled from partials + edge rows (post-merge logic
  *                  built lazily from pre-merge views + the pinned Δ);
  *   F_old(k, t)  =  F_new(k, t) − D(k, t), D = the delta's own
  *                   contribution to the frame (a join against tiny Δ);
  *   emitted      =  rows_new·F_new − rows_old·F_old, rows_old =
  *                   rows_new − Δ restricted to the span.
  * Rows outside the span cancel exactly (their frames see no delta) — the
  * same argument that makes `aggStep.restrictTo` exact. Assembled frames
  * are EXACT (edge chunks are read down to t − horizon), so no
  * truncation-cancellation is even needed.
  *
  * JOB SHAPE (the per-step action floor, VERDICT r9 #4): the two state
  * merges (spine append segment, partials segment) run on side threads
  * CONCURRENTLY with the output-assembly action; with `checkpointDelta =
  * false` a step pays ONE sequential Spark action. All bucket ids are
  * computed driver-side from caller-supplied CDC metadata (the keys and
  * time span that DEFINE the batch) — no discovery job.
  *
  * The value column must be a caller-scaled LONG (the q06/q36 decimal×10⁴
  * idiom) so partials and assembly stay integer-exact. The maintained pair
  * is (cnt, vsum) = (Σ w, Σ w·v) over [t − horizon, t]; callers derive
  * avg etc. IncrementalSpec gates step-assembled outputs against a
  * from-scratch window recompute on every prefix of a mixed
  * insert/retract sequence. */
final class RollingLinearState(init: ZSetFrame, keyCol: String, tsCol: String,
                               valCol: String, horizon: Long, chunkLen: Long,
                               nBuckets: Int) {
  require(horizon > 0 && chunkLen > 0, "horizon and chunkLen must be positive")
  private val CH = "__chunk"
  private val spark = init.spark

  /** floorDiv as a Column (Long `/` truncates toward zero; pmod fixes the
    * negative side). */
  private def chunkOf(ts: Column): Column =
    ((ts - pmod(ts, lit(chunkLen))) / chunkLen).cast("long")

  private val dataCols: Seq[String] = init.dataCols.toSeq
  require(Seq(keyCol, tsCol, valCol).forall(dataCols.contains),
    s"init must carry $keyCol/$tsCol/$valCol")
  // HARD TYPE CONTRACT (ADVICE r10): bucketsFor routes buckets through
  // KeyedState.bucketOfLongs, which reproduces SQL hash() ONLY for LongType
  // columns. A caller handing touchedKeys with e.g. an IntegerType key would
  // make knownTouched under-inclusive and KeyedState would silently DROP the
  // delta rows hashing elsewhere (the documented corruption mode) — state
  // and output diverge with no error. Fail at construction instead; the
  // value column must be Long anyway (caller-scaled integer sums) and the
  // chunk column is derived as long from a long ts.
  locally {
    import org.apache.spark.sql.types.LongType
    val schema = init.df.schema
    Seq(keyCol, tsCol, valCol).foreach { c =>
      require(schema(c).dataType == LongType,
        s"graft: RollingLinearState requires LongType $c (driver-side bucket " +
          s"routing mirrors SQL hash() for longs only); got ${schema(c).dataType}")
    }
  }

  private def withChunk(z: ZSetFrame): ZSetFrame =
    z.withColumn(CH, chunkOf(col(tsCol)))

  /** Event spine, keyed (key, chunk): spine-append merges, chunk-pruned
    * reads. */
  private val spine = new KeyedState(Seq(keyCol, CH), nBuckets,
    withChunk(Incremental.emptyLike(init)))

  /** Per-(key, chunk) partials (cnt, vsum), physically-unique rows. */
  private val partials = new KeyedState(Seq(keyCol, CH), nBuckets,
    ZSetFrame.fromDelta(
      spark.range(0).select(col("id").as(keyCol), col("id").as(CH),
        col("id").as("p_cnt"), col("id").as("p_vsum"),
        col("id").as(ZSetFrame.W))))

  /** Pinned per-step frames (Δ checkpoint) pending release — same two-step
    * deferral as KeyedState's retired segments. */
  private val retireQ = new RetireQueue[DataFrame](Pinned.release)

  def close(): Unit = {
    retireQ.close()
    spine.close()
    partials.close()
  }

  private def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)

  /** Bucket ids of (key × chunk-range) pairs, driver-side. */
  private def bucketsFor(keys: Seq[Long], cLo: Long, cHi: Long): Seq[Int] =
    (for (k <- keys; c <- cLo to cHi)
      yield KeyedState.bucketOfLongs(Seq(k, c), nBuckets)).distinct.sorted

  /** The integrated event set (read-out / testing; scans everything). */
  def snapshot: ZSetFrame =
    spine.snapshot.consolidate.select(dataCols.map(col): _*)

  /** One step: apply `delta` (cols = init's data cols + weight; event times
    * within [lo, hi]; keys within `touchedKeys` — CDC batch metadata;
    * `touchedKeys = None` declares a DENSE batch touching every key, so
    * bucket pruning degrades to the chunk filter alone) and return the
    * output delta: rows (data cols, cnt, vsum) with Z-set weights whose
    * running sum tracks the batch rolling aggregate. Eagerly materialized. */
  /** `checkpointDelta = false` CONTRACT: the caller's delta plan must be
    * stable under re-evaluation (already materialized, or a deterministic
    * filter of materialized data). The merge thread and the output job
    * evaluate the un-pinned plan CONCURRENTLY — a nondeterministic delta
    * (rand(), a table being written) would silently diverge spine,
    * partials, and emitted output from each other. Same contract as
    * KeyedState, sharpened here because the evaluations race. */
  def step(delta: ZSetFrame, lo: Long, hi: Long,
           touchedKeys: Option[Seq[Long]],
           checkpointDelta: Boolean = true): ZSetFrame = {
    retireQ.advance()
    val C = chunkLen
    val aligned = withChunk(ZSetFrame.fromDelta(
      delta.df.select((dataCols :+ ZSetFrame.W).map(col): _*)))
    val d =
      if (checkpointDelta) {
        val c = aligned.localCheckpoint(eager = true)
        retireQ.retire(c.df)
        c
      } else aligned
    val all: Seq[Int] = 0 until nBuckets
    val dBuckets = touchedKeys.fold(all)(ks =>
      bucketsFor(ks, floorDiv(lo, C), floorDiv(hi, C)))

    // ---- partials delta (linear, O(Δ)): −old +new per touched (k, chunk),
    // computed from the PRE-merge partials view
    val dAgg = d.df.groupBy(col(keyCol), col(CH))
      .agg(sum(col(ZSetFrame.W)).as("d_cnt"),
        sum(col(valCol) * col(ZSetFrame.W)).as("d_vsum"))
    val oldP = partials.view(dBuckets).consolidate.df
      .select(col(keyCol), col(CH), col("p_cnt"), col("p_vsum"))
    val joinedP = dAgg.join(oldP, Seq(keyCol, CH), "left_outer")
    val newRows = joinedP.select(col(keyCol), col(CH),
      (coalesce(col("p_cnt"), lit(0L)) + col("d_cnt")).as("p_cnt"),
      (coalesce(col("p_vsum"), lit(0L)) + col("d_vsum")).as("p_vsum"),
      lit(1L).as(ZSetFrame.W))
    val retractRows = joinedP.where(col("p_cnt").isNotNull)
      .select(col(keyCol), col(CH), col("p_cnt"), col("p_vsum"),
        lit(-1L).as(ZSetFrame.W))
    val pDelta = ZSetFrame.fromDelta(
      newRows.where(col("p_cnt") =!= 0L || col("p_vsum") =!= 0L)
        .unionByName(retractRows))

    // ---- affected span + pre-merge spine view (assembly inputs)
    val (spanLo, spanHi) = (lo, hi + horizon)           // outputs that can change
    val (readLo, readHi) = (lo - horizon, hi + horizon) // frame inputs they read
    val readBuckets = touchedKeys.fold(all)(ks =>
      bucketsFor(ks, floorDiv(readLo, C), floorDiv(readHi, C)))
    val kSet = touchedKeys.fold(lit(true))(ks => col(keyCol).isin(ks: _*))
    val inRead = kSet && col(tsCol).between(readLo, readHi)
    // PRE-merge views, captured before the merge thread starts (the merge
    // installs new segments; these views stay valid through it — the
    // KeyedState lifecycle contract — but a view taken AFTER the merge
    // would already include the delta and double-count)
    val sOldView = spine.view(readBuckets).where(inRead)
    val pOldView = partials.view(readBuckets).df.where(kSet)

    // ---- both state merges on side threads, concurrent with assembly
    // (fresh threads so Spark job-local properties are inherited)
    val mergeTask = new java.util.concurrent.FutureTask[Unit](() => {
      // partials merge REPLACES (consolidates) its touched buckets — an
      // O(touched bucket) shuffle, but one that keeps rows physically
      // unique and the per-step plan width constant. The append-mode
      // alternative was measured and rejected: O(Δ) merges, but every
      // step leaves another segment in the view union, and the growing
      // plan width cost more at the step floor than the consolidation it
      // saved. The consolidation term scales with bucket SIZE, a
      // deployment constant (partition count ∝ state, Spark's own sizing
      // rule — see STEPBENCH.md radix notes), and runs concurrent with
      // the output action, so it is visible only when it exceeds the
      // output's own cost.
      partials.merge(pDelta, checkpointDelta = true, Some(dBuckets))
      spine.merge(d, checkpointDelta = false, Some(dBuckets), append = true)
    })
    val mergeThread = new Thread(mergeTask, "graft-rolling-merge")
    mergeThread.setDaemon(true)
    mergeThread.start()

    try {
      // post-merge logic, built lazily from pre-merge views + pinned Δ
      val S = (sOldView + d.where(inRead)).consolidate
      val sOut = S.where(col(tsCol).between(spanLo, spanHi)) // candidate outputs
      val dSpan = d.where(col(tsCol).between(spanLo, spanHi))
      // frame targets: every (k, t) in the new span OR in the delta (a
      // fully-retracted row still needs F_old for its −output)
      val T = sOut.df.select(col(keyCol), col(tsCol))
        .unionByName(dSpan.df.select(col(keyCol), col(tsCol))).distinct()
        .withColumn("__clo", chunkOf(col(tsCol) - horizon))
        .withColumn("__chi", chunkOf(col(tsCol)))
      // post-merge partials over the read window (pre-merge view + pDelta)
      val P = ZSetFrame.fromDelta(
          pOldView.unionByName(
            pDelta.df.where(kSet && col(CH).between(
              floorDiv(readLo, C), floorDiv(readHi, C)))))
        .consolidate.df
        .select(col(keyCol), col(CH), col("p_cnt"), col("p_vsum"))
      // EQUI-join shape (not a band join): each frame target explodes into
      // its frame's chunk ids — ≤ horizon/chunkLen + 1 rows each — and
      // both lookups become plain (key, chunk) equi-joins. A band join
      // (key equality + chunk range) degenerates per-key-quadratic on
      // dense keys (every target × every partial of that key); the
      // explode bounds work at |T| · (H/C) regardless of key density —
      // the shape that survives hot keys at scale.
      // ONE-PASS assembly: the three lookups (full-chunk partials, edge-row
      // scans, the delta's own contribution) all emit CONTRIBUTION rows
      // (k, t, frame-cnt, frame-vsum, delta-cnt, delta-vsum) that a single
      // conditional aggregation folds — one shuffle instead of three
      // groupBys plus three re-anchor outer joins (the per-step floor is
      // stage-barrier bound at small Δ, so plan width IS the cost).
      // full chunks strictly inside the frame → partial sums (sequence
      // flips to DESCENDING when start > stop, so guard the empty case)
      val fullChunks = when(col("__clo") + 1 <= col("__chi") - 1,
        sequence(col("__clo") + 1, col("__chi") - 1))
        .otherwise(array().cast("array<bigint>"))
      val fullRows = T
        .withColumn(CH, explode(fullChunks))
        .join(P, Seq(keyCol, CH))
        .select(col(keyCol), col(tsCol), col("p_cnt").as("c1"),
          col("p_vsum").as("v1"), lit(0L).as("c2"), lit(0L).as("v2"))
      // edge chunks (the two frame boundaries) → row scans, chunk-pruned
      val E = S.df.select(col(keyCol), col(tsCol).as("__ets"), col(CH),
        col(valCol).as("__ev"), col(ZSetFrame.W).as("__ew"))
      val edgeRows = T
        .withColumn(CH, explode(when(col("__clo") === col("__chi"),
            array(col("__clo"))).otherwise(array(col("__clo"), col("__chi")))))
        .join(E, Seq(keyCol, CH))
        .where(col("__ets").between(col(tsCol) - horizon, col(tsCol)))
        .select(col(keyCol), col(tsCol), col("__ew").as("c1"),
          (col("__ev") * col("__ew")).as("v1"),
          lit(0L).as("c2"), lit(0L).as("v2"))
      // the delta's own frame contribution (for F_old = F_new − D).
      // NO broadcast hint: a steady-state delta is tiny and AQE converts
      // the join to broadcast at runtime anyway, but seed/dense batches
      // (q85's first batch, runRadix's 50M-row seed) are the WHOLE table —
      // a forced broadcast would collect them to the driver and ship them
      // to every executor, the unbounded-broadcast failure mode at scale
      val dd = d.df.select(col(keyCol).as("dk"),
        col(tsCol).as("__dts"), col(valCol).as("__dv"),
        col(ZSetFrame.W).as("__dw"))
      val contribRows = T.join(dd,
          T(keyCol) === col("dk") &&
            col("__dts").between(T(tsCol) - horizon, T(tsCol)))
        .select(T(keyCol), T(tsCol), lit(0L).as("c1"), lit(0L).as("v1"),
          col("__dw").as("c2"), (col("__dv") * col("__dw")).as("v2"))
      // zero row per target: guarantees every (k, t) survives the fold even
      // with an empty frame interior and no edge/delta rows
      val zeroRows = T.select(col(keyCol), col(tsCol), lit(0L).as("c1"),
        lit(0L).as("v1"), lit(0L).as("c2"), lit(0L).as("v2"))
      val F = fullRows.unionByName(edgeRows).unionByName(contribRows)
        .unionByName(zeroRows)
        .groupBy(col(keyCol), col(tsCol))
        .agg(sum(col("c1")).as("cnt"), sum(col("v1")).as("vsum"),
          sum(col("c2")).as("d_cnt"), sum(col("v2")).as("d_vsum"))
      // new side: post-merge span rows valued F_new; old side: pre-merge
      // span rows (= span − Δ) valued F_new − D
      val outCols = dataCols.map(col) ++ Seq(col("cnt"), col("vsum"))
      val newSide = ZSetFrame.fromDelta(
        sOut.df.join(F, Seq(keyCol, tsCol))
          .select(outCols :+ col(ZSetFrame.W): _*))
      val oldSide = ZSetFrame.fromDelta(
        (sOut - dSpan).consolidate.df.join(F, Seq(keyCol, tsCol))
          .select((dataCols.map(col) ++ Seq(
            (col("cnt") - col("d_cnt")).as("cnt"),
            (col("vsum") - col("d_vsum")).as("vsum"),
            col(ZSetFrame.W))): _*))
      val out = (newSide - oldSide).consolidate.localCheckpoint(eager = true)
      mergeTask.get() // surface merge failures before handing out the delta
      out
    } catch {
      case e: Throwable =>
        // let the merges finish: the state must not be left half-stepped
        try mergeTask.get() catch { case _: Throwable => () }
        throw e
    }
  }
}
