package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The log-free rational BM25 surrogate's per-posting quantized
  * contribution, shared by the batch ranking query (t11) and the
  * incremental retrieval state ([[graft.incremental.Bm25State]]) — the two
  * MUST evaluate the identical IEEE double sequence or the incremental
  * path's integrated answer cannot be bit-compared against the batch
  * oracle.
  *
  * The function (k1 = 1.2, b = 0.75, both cleared to BIGINT rationals):
  *
  *   sq = floor( (2N − 2df + 1)/(2df + 1)            — raw Robertson idf
  *             · 44·T·tf / (20·T·tf + 6·T + 18·dl·N) — tf saturation
  *             · 1e6 )                                — quantization grid
  *
  * where N = corpus doc count, T = corpus token count, dl = doc length.
  * Numeric envelope (completed r14, ADVICE r13): the cross-engine
  * bit-identity argument — each division a ratio of EXACTLY-represented
  * BIGINTs, so both engines compute the same correctly-rounded doubles —
  * holds while EVERY Long term stays under 2^53, i.e. BOTH
  * 44·T·tf < 2^53 (T·tf ≲ 2·10^14; e.g. T = 10^12 tokens with tf ≤ 100)
  * AND 20·T·tf + 6·T + 18·dl_max·N < 2^53 — the denominator's dl·N term
  * can cross FIRST in dl-skewed corpora (N = 10^9 docs containing one
  * dl = 10^7 doc gives 18·dl·N ≈ 1.8·10^17 > 2^53 while 44·T·tf may
  * still be small), so the numerator bound alone is not the envelope.
  * (The idf factors 2N−2df+1 and 2df+1 are ≤ 2N+1 and never bind before
  * the dl·N term does.) Past 2^53 the long→double casts round and
  * bit-identity rests on both engines casting identically (still true
  * for Spark/DuckDB IEEE casts, but no longer provable from exactness);
  * past 2^63 the products overflow —
  * Spark wraps silently while DuckDB raises, so the oracle gate would
  * fail HARD there, not silently drift. A deployment past the envelope
  * needs the T-heavy products evaluated in DOUBLE on both sides (one
  * consistent cast point) rather than Long multiplies.
  * The per-DOC score is the exact BIGINT sum of these
  * per-posting sq values (quantize-before-sum, order-free under any
  * partitioning) — which is also what makes the incremental screening
  * induction work: a doc's stored score is unchanged iff no posting's sq
  * moved, a per-posting predicate.
  */
object Bm25 {
  /** `grid` is the quantization constant (1e6 in production — the value
    * the oracle SQL hard-codes). Tests pass a coarse grid to reach the
    * pruning regime at toy corpus sizes, exactly like TfIdfState's C. */
  def sq(tf: Column, dl: Column, df: Column,
         nDocs: Column, tToks: Column, grid: Double = 1e6): Column =
    floor(
      ((lit(2L) * nDocs - lit(2L) * df + lit(1L)).cast("double")
        / (lit(2L) * df + lit(1L)).cast("double"))
      * ((lit(44L) * tToks * tf).cast("double")
        / (lit(20L) * tToks * tf + lit(6L) * tToks
           + lit(18L) * dl * nDocs).cast("double"))
      * lit(grid)).cast("long")
}
