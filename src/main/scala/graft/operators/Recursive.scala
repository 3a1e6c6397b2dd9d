package graft.operators

import org.apache.spark.sql.DataFrame

/** Semi-naive fixpoint evaluation (Datalog / recursive queries).
  *
  * Mirrors the reference's `recursive(f)` operator — feedback + distinct +
  * iterate-until-no-change (reference: crates/dbsp/src/operator/recursive.rs:255,
  * condition.rs:50). Catalyst has no recursion, so the loop runs on the
  * driver; per-iteration DataFrames are eagerly localCheckpoint'ed to cut
  * lineage growth (otherwise plans grow linearly and planning dominates).
  *
  * `distinct` inside the loop is mandatory for termination on cyclic data —
  * the reference enforces the same (recursive.rs:38-48).
  */
object Recursive {

  /** Least fixpoint of `acc = base ∪ step(delta)` with set semantics.
    * `step` maps the newly-derived delta to candidate new facts; iteration
    * stops when no new facts appear. Only aggregate counts cross the driver
    * boundary — the data itself stays distributed.
    */
  /** Materialize and re-wrap with FRESH attribute ids: localCheckpoint keeps
    * the original output attributes, so iterated self-joins would trip
    * Spark's ambiguous-self-join detection; rebuilding from the checkpointed
    * RDD severs the lineage completely (no recompute — the RDD is reused). */
  private def materialize(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  def fixpoint(base: DataFrame, maxIter: Int = 1000)
              (step: DataFrame => DataFrame): DataFrame = {
    // acc is a lazy union of per-iteration MATERIALIZED deltas: each union
    // arm is an already-computed RDD, so re-scanning acc in except() costs
    // only the scan, and no per-iteration re-materialization job is needed.
    val first = materialize(base.distinct())
    var deltas = List(first)
    var acc = first
    var delta = first
    var i = 0
    while (i < maxIter && !delta.isEmpty) {
      // semi-naive: derive only from the last delta, subtract known facts
      val derived = materialize(step(delta).distinct().except(acc))
      if (!derived.isEmpty) {
        deltas ::= derived
        acc = deltas.reduce(_ union _)
      }
      delta = derived
      i += 1
    }
    acc
  }
}
