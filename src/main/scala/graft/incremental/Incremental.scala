package graft.incremental

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.ZSetFrame

/** Deterministic step-loop incremental evaluation — the batch-mode twin of
  * the reference's `DBSPHandle::step` (reference:
  * crates/dbsp/src/circuit/dbsp_handle.rs:87-94). Each step consumes input
  * delta Z-sets and produces output deltas whose running sum equals the
  * batch recomputation — per-step cost proportional to |Δ|, not |DB|.
  *
  * State (the "trace", reference operator/trace.rs) is an accumulated,
  * consolidated ZSetFrame, localCheckpoint'ed so lineage stays flat across
  * steps; in a cluster deployment this state would live in a Delta-style
  * table or the streaming state store partitioned by the operator key. */
object Incremental {

  /** Accumulated state of one stream: `acc = Σ deltas`, consolidated. */
  final class State(init: ZSetFrame) {
    var acc: ZSetFrame = init.consolidate.localCheckpoint()
    def update(delta: ZSetFrame): Unit =
      acc = (acc + delta).consolidate.localCheckpoint()
    // no close(): callers (generalAggDelta's delta rule) hold PREVIOUS
    // generations after update, so the state cannot know which are dead —
    // harness-level cleanup is Pinned.sweepSession between measured units
  }

  /** Step-loop state with an EVENT-TIME BOUND — the reference's
    * `trace_with_bound` / TraceBound lateness GC (reference:
    * operator/trace.rs:46-56,181-247): every update evicts rows whose bound
    * column fell below the caller's waterline, so state size tracks the
    * retention horizon, not the stream length. Operators that only correct
    * within the horizon (rolling aggregates, windowed joins) keep exact
    * semantics; data later than the waterline is late by definition. */
  final class BoundedState(init: ZSetFrame, boundCol: String) {
    var acc: ZSetFrame = init.consolidate.localCheckpoint()
    def update(delta: ZSetFrame, waterline: Long): Unit =
      acc = (acc + delta).consolidate
        .where(col(boundCol) >= lit(waterline)).localCheckpoint()
  }

  def emptyLike(z: ZSetFrame): ZSetFrame =
    ZSetFrame.fromDelta(z.df.where(lit(false)))

  /** Differentiate: x(t) − x(t−1) — recover the delta between two snapshots
    * at an ingestion boundary (reference: operator/differentiate.rs:24). */
  def differentiate(prev: ZSetFrame, curr: ZSetFrame): ZSetFrame =
    (curr - prev).consolidate

  /** Incremental bilinear join: Δ(A⋈B) = ΔA ⋈ B_old + A_new ⋈ ΔB
    * (reference: operator/join.rs:128,180). `aNew` must already include ΔA. */
  def joinDelta(dA: ZSetFrame, bOld: ZSetFrame, aNew: ZSetFrame, dB: ZSetFrame,
                keys: Seq[String]): ZSetFrame =
    dA.join(bOld, keys) + aNew.join(dB, keys)

  /** Incremental bilinear join over KEY-PARTITIONED traces: each delta is
    * joined against a PROBE of the other side's trace (only the buckets the
    * delta's keys hash into are read), so a step costs O(|Δ| + touched
    * buckets) — the reference's sharded-trace join lookup
    * (operator/join.rs:180). Merges ΔB into `bSt` and ΔA into `aSt`. */
  def joinDeltaKeyed(aSt: KeyedState, dA: ZSetFrame,
                     bSt: KeyedState, dB: ZSetFrame,
                     keys: Seq[String],
                     checkpointDeltas: Boolean = true,
                     knownTouchedA: Option[Seq[Int]] = None,
                     knownTouchedB: Option[Seq[Int]] = None): ZSetFrame = {
    require(aSt.nBuckets == bSt.nBuckets && aSt.keys == bSt.keys,
      "join traces must share key columns and bucket count")
    // bucket ids are computed ONCE per delta and shared between the probe
    // of one trace and the merge of the other (identical hash layout).
    // Callers that know a delta's bucket span pass it via knownTouched*
    // (any SUPERSET of the actual span is correct — a DENSE delta passes
    // all buckets, skipping the per-step bucket-discovery job entirely,
    // since discovery would return every bucket anyway).
    // PIN the deltas ONCE, up front (code-review r15): the discovery job,
    // both merges, and the output join all read them — previously the raw
    // plans were re-evaluated per consumer, concurrently across the merge
    // thread and the main thread, so a delta whose plan is not stable
    // under re-evaluation (rand(), a growing source table) could land
    // DIFFERENT rows in the traces than in the emitted join delta with no
    // error (checkpointDeltas=true pinned only the merges' private
    // copies). Total action count is unchanged — the merges' per-delta
    // checkpoints are skipped in exchange — and deterministic callers
    // save two delta re-evaluations per step. The pins are released once
    // the output is materialized and both merges have installed their
    // (eagerly materialized) segments. checkpointDeltas=false keeps the
    // old contract: the CALLER owns delta stability and pinning.
    val (pinA, pinB) =
      if (checkpointDeltas)
        (dA.localCheckpoint(eager = true), dB.localCheckpoint(eager = true))
      else (dA, dB)
    try {
      val aTouched = knownTouchedA.getOrElse(aSt.touchedBuckets(pinA))
      val bTouched = knownTouchedB.getOrElse(bSt.touchedBuckets(pinB))
      val bOldProbe = bSt.view(aTouched)               // B_old for ΔA's buckets
      // A_new for ΔB's buckets, built LAZILY from the pre-merge view + the
      // slice of ΔA hashing into those buckets — so the output job does not
      // wait for A's segment build (the aggStep JOB-FUSION shape): both
      // merges run on a side thread concurrent with the single output action.
      val aOldProbe = aSt.view(bTouched)
      val dAInB = pinA.where(
        pmod(hash(keys.map(col): _*), lit(aSt.nBuckets)).isin(bTouched: _*))
      val aNewProbe = aOldProbe + dAInB
      val mergeTask = new java.util.concurrent.FutureTask[Unit](() => {
        aSt.merge(pinA, checkpointDelta = false, Some(aTouched))
        bSt.merge(pinB, checkpointDelta = false, Some(bTouched))
      })
      val mergeThread = new Thread(mergeTask, "graft-join-merge")
      mergeThread.setDaemon(true)
      mergeThread.start()
      try {
        // eager: the emitted join delta references partition-pruned probe
        // views that are only valid until the second subsequent merge
        // (KeyedState reclaims superseded segments) — materialize it first
        val out = (pinA.join(bOldProbe, keys) + aNewProbe.join(pinB, keys))
          .localCheckpoint(eager = true)
        mergeTask.get() // surface merge failures; states updated on return
        out
      } catch {
        case e: Throwable =>
          try mergeTask.get() catch { case _: Throwable => () }
          throw e
      }
    } finally {
      if (checkpointDeltas) { Pinned.release(pinA.df); Pinned.release(pinB.df) }
    }
  }

  /** Incremental distinct: δ = distinct(A_new) − distinct(A_old)
    * (reference: operator/distinct.rs:64 root-scope fast path). */
  def distinctDelta(aOld: ZSetFrame, aNew: ZSetFrame): ZSetFrame =
    aNew.distinctZ - aOld.distinctZ

  /** Incremental linear aggregate (SUM/COUNT family): the output delta is
    * just the linear aggregate of the input delta — O(|Δ|) with no state
    * (reference: aggregate/mod.rs:253 aggregate_linear / weigh). The running
    * sum of emitted (key, partial) rows consolidates to the true aggregate:
    * weigh folds f(row) into the Z-set weight, so consolidate's weight-sum
    * IS the group sum. */
  def linearAggDelta(delta: ZSetFrame, keyCols: Seq[Column], f: Column): ZSetFrame =
    delta.weigh(f).select(keyCols: _*)

  /** Incremental general aggregate (min/max/argmax...): re-aggregate only
    * the keys touched by the delta, retracting their previous output rows
    * (reference: aggregate/mod.rs:204-244 — same touched-key strategy over
    * the integrated trace). `agg` maps a (positive-multiset) ZSetFrame of
    * rows to one output row per key. */
  def generalAggDelta(delta: ZSetFrame, aOld: ZSetFrame, aNew: ZSetFrame,
                      keys: Seq[String])(agg: ZSetFrame => ZSetFrame): ZSetFrame = {
    // NULL-SAFE key restriction (code-review r15): the touched keys are
    // GROUP identities, and groupBy treats NULL as a group — a plain
    // left_semi equi-join (NULL != NULL) would exclude a null-key group
    // from both restricted sides, emit no delta for it, and let the
    // incremental output diverge from the batch answer permanently. The
    // query-facing semiJoin keeps SQL semantics (its batch twin, EXISTS,
    // doesn't match NULLs either); group restriction must not.
    val touched = delta.df.select(keys.map(col): _*).distinct()
      .select(keys.map(k => col(k).as(s"__t_$k")): _*)
    def restrict(z: ZSetFrame): ZSetFrame = ZSetFrame.fromDelta(
      z.df.join(touched,
        keys.map(k => z.df(k) <=> touched(s"__t_$k")).reduce(_ && _),
        "left_semi"))
    val oldOut = agg(restrict(aOld))
    val newOut = agg(restrict(aNew))
    newOut - oldOut
  }
}
