package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An upsert command: `delete=true` removes the key (tombstone);
  * otherwise sets key → value. Mirrors the reference's map-input semantics
  * (reference: operator/input.rs:214-223 semantics table). */
case class UpsertCmd(key: Long, value: Double, seq: Long, delete: Boolean)

/** A Z-set delta row emitted by stateful streaming ops: weight −1 retracts
  * the previous value, +1 asserts the new one (reference: operator/upsert.rs:37). */
case class KvDelta(key: Long, value: Double, weight: Long)

/** An upsert command carrying its event time — the TTL'd upsert path keys
  * state eviction off the watermark over this column. */
case class TimedUpsertCmd(key: Long, value: Double, seq: Long, delete: Boolean,
                          ts: java.sql.Timestamp)

/** Structured-Streaming renditions of the reference's streaming operators.
  * Micro-batch == circuit step: each trigger consumes one input delta batch
  * and emits the corresponding output delta/update — the same contract the
  * batch step-loop (graft.incremental) verifies deterministically.
  *
  * Scale: every op is keyed; state lives in the state store (RocksDB
  * provider in production) partitioned by the grouping key, and watermarks
  * bound state exactly like the reference's TraceBound lateness GC
  * (reference: operator/trace.rs:46-56). */
object StreamOps {

  /** Tumbling-window aggregate with watermark-driven state GC
    * (reference: time_series/window.rs:75 + watermark.rs:33). Append mode:
    * a window's row is emitted once the watermark passes its end. */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     width: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width), col(keyCol))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col(s"window.start").as("wstart"), col(keyCol),
        col("n"), col("sum_value"))

  /** Per-key streaming distinct: emit a key's row only on first sight
    * (reference: operator/distinct.rs streaming path). State is UNBOUNDED
    * by design — exact distinct requires the full seen-key set, precisely
    * the reference's distinct trace; a deployment that can tolerate
    * re-emission after idleness uses the TTL'd variant (q72's
    * dropDuplicates-within-horizon shape), the TraceBound analog. */
  def streamingDistinct(events: DataFrame, cols: Seq[String]): DataFrame =
    events.dropDuplicates(cols)

  /** Upsert command stream → Z-set delta stream: for each key, the last
    * command per micro-batch wins (ties on `seq` broken by arrival order —
    * callers must not reuse a seq per key within one batch); ACROSS
    * micro-batches, stream order IS command order, as in the reference's
    * upsert sources (a seq is an intra-batch tiebreak, not a global
    * version — version-gated upsert is a different operator). Emits
    * −old/+new only on real transitions (no-op upserts and deletes of
    * absent keys emit nothing) — exactly the reference's upsert operator
    * (operator/upsert.rs:21-60). */
  /** Emit the −old/+new transition for a key given the winning command. */
  private def transition(key: Long, old: Option[Double],
                         next: Option[Double]): Iterator[KvDelta] =
    (old, next) match {
      case (None, None) => Iterator.empty
      case (Some(o), Some(n)) if o == n => Iterator.empty
      case (o, n) =>
        o.map(KvDelta(key, _, -1L)).iterator ++
          n.map(KvDelta(key, _, +1L)).iterator
    }

  def upsertDeltas(cmds: Dataset[UpsertCmd]): Dataset[KvDelta] = {
    import cmds.sparkSession.implicits._
    cmds.groupByKey(_.key)
      .flatMapGroupsWithState[Option[Double], KvDelta](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[UpsertCmd], state: GroupState[Option[Double]]) =>
          // single pass: max-seq command wins, nothing is buffered
          val last = batch.reduceLeft((a, b) => if (b.seq >= a.seq) b else a)
          val old: Option[Double] = state.getOption.flatten
          val next: Option[Double] = if (last.delete) None else Some(last.value)
          // remove(), not update(None) (code-review r15): a stored
          // tombstone under NoTimeout lived FOREVER — delete-heavy CDC
          // with a churning key domain grew state with lifetime key count
          // (a delete of a never-seen key even allocated a row). remove()
          // yields identical output (getOption.flatten is None either way)
          // with state bounded by LIVE keys.
          if (next.isEmpty) state.remove() else state.update(next)
          transition(key, old, next)
      }
  }

  /** Upsert deltas with WATERMARK-DRIVEN state TTL — the reference's
    * TraceBound lateness GC (reference: operator/trace.rs:46-56,181-247):
    * a key idle for `horizon` of event time past the watermark is evicted
    * (silently — eviction is state GC, not a retraction, exactly the
    * trace-bound contract). State size tracks the active-key horizon, not
    * the stream's lifetime key count. */
  def upsertDeltasTtl(cmds: Dataset[TimedUpsertCmd], lateness: String,
                      horizonMs: Long): Dataset[KvDelta] = {
    import cmds.sparkSession.implicits._
    cmds.withWatermark("ts", lateness)
      .as[TimedUpsertCmd]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Option[Double], KvDelta](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, batch: Iterator[TimedUpsertCmd],
         state: GroupState[Option[Double]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var last: TimedUpsertCmd = null
            var maxTs = Long.MinValue
            batch.foreach { c => // single pass: winner + max event time
              if (last == null || c.seq >= last.seq) last = c
              if (c.ts.getTime > maxTs) maxTs = c.ts.getTime
            }
            val old: Option[Double] = state.getOption.flatten
            val next: Option[Double] = if (last.delete) None else Some(last.value)
            if (next.isEmpty)
              // remove() on delete, as in upsertDeltas — a removed key
              // also drops its timeout (nothing left to evict)
              state.remove()
            else {
              state.update(next)
              // A timeout at or below the current watermark is illegal
              // (Spark kills the query). Spark pre-filters rows older than
              // the LATE-EVENTS watermark, but a group whose maxTs lands
              // between that and the (newer) EVICTION watermark can still
              // reach here with maxTs + horizon below it — clamp to
              // watermark + 1 ms: the key stays evictable at the next
              // watermark advance instead of killing the query.
              state.setTimeoutTimestamp(
                math.max(maxTs + horizonMs, state.getCurrentWatermarkMs() + 1))
            }
            transition(key, old, next)
          }
      }
  }

  /** Upsert deltas on the transformWithState API (Spark 4 arbitrary state
    * v2, RocksDB-backed): the same −old/+new contract as upsertDeltas, with
    * NATIVE per-state TTL (TTLConfig) — the reference's TraceBound as a
    * first-class state-store feature instead of a hand-rolled timeout.
    * Requires spark.sql.streaming.stateStore.providerClass =
    * RocksDBStateStoreProvider (set per-job; see StreamingSpec). */
  def upsertDeltasTws(cmds: Dataset[UpsertCmd],
                      ttlMs: Long = -1L): Dataset[KvDelta] = {
    import cmds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TTLConfig, ValueState}
    val processor = new StatefulProcessor[Long, UpsertCmd, KvDelta] {
      @transient private var st: ValueState[Double] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
        val ttl = if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs))
                  else TTLConfig.NONE
        st = getHandle.getValueState[Double]("value",
          org.apache.spark.sql.Encoders.scalaDouble, ttl)
      }
      override def handleInputRows(key: Long, rows: Iterator[UpsertCmd],
          timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[KvDelta] = {
        val last = rows.reduceLeft((a, b) => if (b.seq >= a.seq) b else a)
        val old: Option[Double] = if (st.exists()) Some(st.get()) else None
        val next: Option[Double] = if (last.delete) None else Some(last.value)
        if (last.delete) st.clear() else st.update(last.value)
        transition(key, old, next)
      }
    }
    // ProcessingTime time-mode only when TTL is active — it keeps the
    // microbatch loop scheduling maintenance work even on a drained source
    val timeMode = if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    cmds.groupByKey(_.key)
      .transformWithState(processor, timeMode, OutputMode.Append())
  }

  /** Running fold per key (reference: operator/stream_fold.rs:21):
    * emits the updated accumulator every step. */
  def runningSum(events: Dataset[(Long, Double)]): Dataset[(Long, Double)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[Double, (Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[(Long, Double)], state: GroupState[Double]) =>
          val acc = state.getOption.getOrElse(0.0) + batch.map(_._2).sum
          state.update(acc)
          Iterator((key, acc))
      }
  }

  /** Drive a stream through the step-loop incremental operators: each
    * micro-batch is one circuit step (reference: dbsp_handle.rs:87-94), the
    * `step` callback applies the delta rules (graft.incremental) and updates
    * operator state. This is the multi-stage-pipeline escape hatch SURVEY
    * §7.3 calls out: Structured Streaming restricts chained stateful
    * update-mode stages, so retraction-bearing pipelines compose inside
    * foreachBatch instead, with exactly-once via the sink checkpoint. */
  def incrementalPipeline(stream: DataFrame)
                         (step: (DataFrame, Long) => Unit): Unit = {
    val q = stream.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => step(batch, id))
      .start()
    // stop() on EVERY exit path (code-review r16 — the same leak the r15
    // fix closed in runToMemory): an interrupt/exception inside
    // processAllAvailable otherwise leaves the query running for the
    // session's lifetime, holding state stores and consuming the source
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Drive a streaming query from a memory sink to completion (test/dev
    * harness; production uses writeStream to kafka/parquet sinks).
    *
    * Stateful-operator parallelism (state store instances, and thus files
    * committed per micro-batch) equals spark.sql.shuffle.partitions at
    * FIRST start and is then pinned into the checkpoint — so it is sized
    * here per-job (like any streaming deployment does) and the session
    * value is restored as soon as the query starts. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Append,
                  statePartitions: Int = 4): DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val q =
      try df.writeStream.outputMode(mode).format("memory").queryName(name).start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // stop() runs on EVERY exit path (code-review r15): a quiesce timeout
    // or a processAllAvailable failure previously threw with the query
    // still running — it leaked for the session (holding state stores,
    // growing the memory sink) and a retry under the same queryName failed
    // with "query already active".
    try {
      q.processAllAvailable()
      // processAllAvailable waits for source OFFSETS only — the watermark-
      // driven no-data batches that flush the final windows (through
      // chained stateful operators they may need several rounds) can still
      // be in flight. Wait until the batch id quiesces before stopping, or
      // the tail window of the run is silently lost (observed as exactly
      // one missing window at sf0.1 on q63).
      var last = -2L
      var stable = 0
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var sleepMs = 50L // short first polls cut the fixed per-query overhead
      while (stable < 2 && System.nanoTime() < deadline) {
        // batchId only moves on batch COMPLETION, so a stable id alone can
        // be an in-flight no-data flush batch between two polls — require
        // the engine to also report idle (code-review r15: two ~150 ms
        // stale polls during a slow state commit could declare quiescence
        // and stop() would abort the flush mid-write, the exact tail-loss
        // this loop exists to prevent)
        val cur = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
        val idle = !q.status.isTriggerActive && !q.status.isDataAvailable
        if (cur == last && idle) stable += 1 else { stable = 0; last = cur }
        Thread.sleep(sleepMs)
        sleepMs = math.min(sleepMs * 2, 200L)
        q.processAllAvailable()
      }
      if (stable < 2)
        // the silent fall-through WAS the tail-window-loss failure mode
        // this loop exists to fix — never let it recur without a signal
        throw new IllegalStateException(
          s"streaming query '$name' did not quiesce within 60s " +
            s"(batchId still advancing past $last); tail windows may be lost")
    } finally q.stop()
    spark.table(name)
  }
}
