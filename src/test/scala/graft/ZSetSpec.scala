package graft

import org.apache.spark.sql.functions._
import graft.core.ZSetFrame

/** Z-set algebra laws (reference: algebra/zset/mod.rs doc invariants). */
class ZSetSpec extends SparkSpec {
  import spark.implicits._

  private def z(rows: (Long, String, Long)*): ZSetFrame =
    ZSetFrame.fromDelta(rows.toSeq.toDF("k", "v", ZSetFrame.W))

  test("plus/neg/minus: a - a consolidates to zero") {
    val a = z((1, "x", 1), (2, "y", 2))
    assert((a - a).isZero)
    assert((a + (-a)).isZero)
  }

  test("consolidate merges duplicates and drops zero weights") {
    val a = z((1, "x", 1), (1, "x", 2), (2, "y", 1), (2, "y", -1))
    val got = a.consolidate.df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "x", 3L)))
  }

  test("distinctZ: weight>0 → 1, non-positive dropped") {
    val a = z((1, "x", 5), (2, "y", -3), (3, "z", 1), (3, "z", -1))
    val got = a.distinctZ.df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == Set((1L, 1L)))
  }

  test("join multiplies weights") {
    val a = z((1, "a", 2), (2, "b", 3))
    val b = ZSetFrame.fromDelta(Seq((1L, "L", 5L), (2L, "M", -1L)).toDF("k", "r", ZSetFrame.W))
    val got = a.join(b, Seq("k")).df
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long](ZSetFrame.W))).toSet
    assert(got == Set((1L, 10L), (2L, -3L)))
  }

  test("weigh folds values into weights; consolidate sums them (linear agg)") {
    val a = z((1, "x", 1), (1, "y", 1), (2, "x", 3))
    // sum of k per group via weigh(k): group x → 1+6=7? (k=1 w=1, k=2 w=3 → 1*1+2*3)
    val got = a.weigh(col("k")).select(col("v")).consolidate.df
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("x" -> 7L, "y" -> 1L))
  }

  test("checked weights: overflowing multiply raises instead of wrapping") {
    // reference: algebra/checked_int.rs — weight arithmetic can be
    // overflow-checked. Under Spark's default ANSI mode a Long multiply
    // already raises; the graft flag restores checked semantics even when
    // a deployment runs with ANSI off (where raw multiply wraps silently).
    val big = z((1, "x", Long.MaxValue / 2 + 1))
    // ANSI default: Spark itself raises on the raw Long multiply
    val eAnsi = intercept[Exception] { big.weigh(lit(4L)).df.collect() }
    assert(eAnsi.getMessage.contains("ARITHMETIC_OVERFLOW"), eAnsi.getMessage)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      // ANSI off, flag off: silent two's-complement wrap — the hazard
      assert(big.weigh(lit(4L)).df.collect().head
        .getAs[Long](ZSetFrame.W) == (Long.MaxValue / 2 + 1) * 4L)
      spark.conf.set(ZSetFrame.CheckedWeightsConf, "true")
      val e = intercept[Exception] { big.weigh(lit(4L)).df.collect() }
      assert(e.getMessage.contains("weight multiply overflow"), e.getMessage)
      val e2 = intercept[Exception] {
        big.join(z((1, "y", 8)), Seq("k")).df.collect()
      }
      assert(e2.getMessage.contains("weight multiply overflow"), e2.getMessage)
      // non-overflowing products still work with the check on
      assert(z((1, "x", 3)).join(z((1, "y", -2)), Seq("k")).df.collect()
        .head.getAs[Long](ZSetFrame.W) == -6L)
    } finally {
      spark.conf.set(ZSetFrame.CheckedWeightsConf, "false")
      spark.conf.set("spark.sql.ansi.enabled", "true")
    }
  }

  test("weight expansion is total: w=0 is ZERO copies, w<0 fails loudly") {
    // code-review r15: bare sequence(1, w) auto-reverses its step when
    // w < 1, so a weight-0 row exploded into TWO phantom copies and a
    // weight -1 row into THREE - fabricated rows with no error. Weight-0
    // rows are reachable legitimately (linearAggDelta emits them when the
    // folded value is 0; raw fromDelta deltas may carry them) and mean
    // ZERO copies. ADVICE r15: a NEGATIVE weight is a positive-multiset
    // contract violation - silently dropping it (the first r15 fix) let
    // an upstream retraction bug yield plausibly-wrong min/max/avg with
    // no signal, so it now raises.
    import spark.implicits._
    val z = ZSetFrame.fromDelta(Seq(
        (1L, 2L),  // 2 copies
        (2L, 1L),  // 1 copy
        (3L, 0L))  // ZERO copies (was 2 phantom copies pre-r15)
      .toDF("k", ZSetFrame.W))
    assert(z.toMultisetDF.collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 1L, 2L))
    val agg = z.aggregate(Seq(org.apache.spark.sql.functions.col("k")),
      expandWeights = true,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    assert(agg.df.select("k", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      === Seq((1L, 2L), (2L, 1L)))
    // a negative weight fails loudly instead of vanishing
    val neg = ZSetFrame.fromDelta(Seq((4L, -1L)).toDF("k", ZSetFrame.W))
    val e = intercept[Exception] { neg.toMultisetDF.collect() }
    assert(e.getMessage.contains("negative weight"), e.getMessage)
  }
}
