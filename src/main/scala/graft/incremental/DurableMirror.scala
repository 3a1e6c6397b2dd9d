package graft.incremental

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

import graft.core.ZSetFrame

/** The INTENT/COMMIT durable-mirror protocol shared by the Screened
  * states' durable renditions (VERDICT r16 #4 — factored out of
  * [[MultiBm25State]], where it matured in r16, so each state supplies
  * only its constants codec and derived-index rebuild; the reference's
  * persistent trace is engine-wide, not one operator's —
  * crates/dbsp/src/trace/persistent/mod.rs:1-40).
  *
  * Protocol per step (the trace merge is NOT idempotent, so a torn step
  * must never be silently replayable — code-review r16):
  *   1. `intend(gen N+1)` — an atomic marker BEFORE the trace is touched;
  *   2. `merge(delta)` — the touched-partition rewrite of the disk trace;
  *   3. `commit(gen N+1, consts)` — the constants sidecar (atomic rename)
  *      lands LAST; its gen matching the intent's IS the commit point.
  *
  * `attach` refuses an intent newer than the committed gen: a crash
  * anywhere inside the step window is DETECTED, not double-applied;
  * recovery from a torn step is out of scope (it needs a transactional
  * table format or a state snapshot — at deployment, run the durable
  * trace on one). A CLEAN teardown/restore resumes exactly, and the
  * committed gen tells the CDC source which deltas to resend. Derived
  * state (scores, top-k, df indexes) is NEVER persisted — each state
  * rebuilds it from the trace + constants at restore, bit-identical by
  * its screen's exactness induction. */
private[incremental] final class DurableMirror(
    private[incremental] val dur: DurableKeyedState,
    intentFile: String, constsFile: String) {

  /** Step prologue: the intent marker (gen = the step being attempted). */
  def intend(gen: Long): Unit =
    DurableKeyedState.atomicWrite(dur.path, intentFile, s"gen=$gen\n")

  /** The step's trace write — see [[DurableKeyedState.merge]]'s
    * touched-bucket superset contract. merge pins the old touched-bucket
    * view (it must be materialized before its files are overwritten) for
    * aggStep-style consumers; a MIRROR never reads it, so release it here
    * — dropping the tuple leaked one pinned frame per durable step (r17
    * review; the r16 Bm25 mirror had the same leak, swept only by the
    * bench's between-query sweepSession). */
  def merge(delta: ZSetFrame, knownTouched: Option[Seq[Int]] = None): Unit = {
    val (oldTouched, _) = dur.merge(delta, knownTouched)
    Pinned.unpersistTree(oldTouched.df.rdd)
  }

  /** Step epilogue — the COMMIT point: gen must equal the intent's. The
    * state's driver-held constants ride as ordered key=value lines (the
    * state's codec; deterministic order keeps the sidecar diffable). */
  def commit(gen: Long, consts: Seq[(String, String)]): Unit =
    DurableKeyedState.atomicWrite(dur.path, constsFile,
      (s"gen=$gen" +: consts.map { case (k, v) => s"$k=$v" })
        .mkString("", "\n", "\n"))
}

private[incremental] object DurableMirror {

  /** Initialize (or reset) the mirrored trace at `path` and attach. */
  def create(path: String, keys: Seq[String], nBuckets: Int, init: ZSetFrame,
             intentFile: String, constsFile: String): DurableMirror =
    new DurableMirror(DurableKeyedState.create(path, keys, nBuckets, init),
      intentFile, constsFile)

  private def readKv(p: Path): Map[String, String] =
    Files.readAllLines(p).toArray(Array.empty[String])
      .filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }.toMap

  /** Re-attach to a mirrored trace: reads the committed constants sidecar,
    * runs TORN-STEP DETECTION against the intent marker, restores the
    * trace, and hands both back — the caller validates its state-identity
    * constants (query sets, quantization grids, …) against the kv map and
    * rebuilds its derived indexes. `what` names the state in errors. */
  def attach(spark: SparkSession, path: String, nBuckets: Int,
             intentFile: String, constsFile: String, what: String)
      : (DurableMirror, Map[String, String]) = {
    val kv = readKv(Paths.get(path, constsFile))
    val intentPath = Paths.get(path, intentFile)
    if (Files.exists(intentPath)) {
      val ikv = readKv(intentPath)
      require(ikv.get("gen").exists(_.toLong == kv("gen").toLong),
        s"graft: durable $what state at $path is TORN — intent gen " +
          s"${ikv.get("gen")} vs committed gen ${kv("gen")}: a step crashed " +
          "mid-commit and its delta may be partially applied; restore from " +
          "a state snapshot (or run the durable trace on a transactional " +
          "table format) instead of replaying")
    }
    val dur = DurableKeyedState.restore(spark, path)
    require(dur.nBuckets == nBuckets,
      s"graft: durable trace has ${dur.nBuckets} buckets, caller asked $nBuckets")
    (new DurableMirror(dur, intentFile, constsFile), kv)
  }
}
