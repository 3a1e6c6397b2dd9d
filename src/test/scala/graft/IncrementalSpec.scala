package graft

import org.apache.spark.sql.functions._
import graft.core.ZSetFrame
import graft.incremental.Incremental

/** The central DBSP law: accumulate(incremental(op, deltas)) == batch(op,
  * accumulate(deltas)) — the reference's `*_slow` proptest pattern
  * (reference: time_series/rolling_aggregate.rs:608-960) over random delta
  * sequences with retractions. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  /** Random delta: rows (k, v, w) with w in −2..2 (no zero). */
  private def randomDelta(rnd: scala.util.Random, n: Int): ZSetFrame = {
    val rows = Seq.fill(n) {
      val w = { val x = rnd.nextInt(4) - 2; if (x >= 0) x + 1 else x }
      (rnd.nextInt(5).toLong, rnd.nextInt(8).toLong, w.toLong)
    }
    ZSetFrame.fromDelta(rows.toDF("k", "v", ZSetFrame.W))
  }

  test("incremental distinct ≡ batch distinct over random delta sequences") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val deltas = Seq.fill(3)(randomDelta(rnd, 12))
      val in = new Incremental.State(Incremental.emptyLike(deltas.head))
      val out = new Incremental.State(Incremental.emptyLike(deltas.head))
      deltas.foreach { d =>
        val old = in.acc
        in.update(d)
        out.update(Incremental.distinctDelta(old, in.acc))
      }
      assertSameRows(out.acc.consolidate.df, in.acc.distinctZ.df)
    }
  }

  test("incremental join ≡ batch join over random delta sequences") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed + 100)
      val (das, dbs) = (Seq.fill(3)(randomDelta(rnd, 10)),
        Seq.fill(3)(randomDelta(rnd, 10).select(col("k"), col("v").as("v2"))))
      val aSt = new Incremental.State(Incremental.emptyLike(das.head))
      val bSt = new Incremental.State(Incremental.emptyLike(dbs.head))
      val out = new Incremental.State(Incremental.emptyLike(das.head.join(dbs.head, Seq("k"))))
      das.zip(dbs).foreach { case (dA, dB) =>
        val bOld = bSt.acc
        aSt.update(dA)
        val d = Incremental.joinDelta(dA, bOld, aSt.acc, dB, Seq("k"))
        bSt.update(dB)
        out.update(d)
      }
      assertSameRows(out.acc.consolidate.df,
        aSt.acc.join(bSt.acc, Seq("k")).consolidate.df)
    }
  }

  test("incremental linear agg ≡ batch weighted sum") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed + 200)
      val deltas = Seq.fill(3)(randomDelta(rnd, 12))
      val out = new Incremental.State(Incremental.emptyLike(
        deltas.head.select(col("k"))))
      val in = new Incremental.State(Incremental.emptyLike(deltas.head))
      deltas.foreach { d =>
        in.update(d)
        out.update(Incremental.linearAggDelta(d, Seq(col("k")), col("v")))
      }
      val batch = in.acc.df.groupBy("k")
        .agg(sum(col("v") * col(ZSetFrame.W)).as("s"))
        .where(col("s") =!= 0)
      val inc = out.acc.df.select(col("k"), col(ZSetFrame.W).as("s"))
      assertSameRows(inc, batch)
    }
  }

  test("incremental general agg (max) ≡ batch max under retraction") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed + 300)
      // positive-weight inserts then targeted retractions of prior rows
      val base = randomDelta(rnd, 15)
      val pos = ZSetFrame.fromDelta(base.df.withColumn(ZSetFrame.W, lit(1L)))
      val retract = ZSetFrame.fromDelta(
        pos.df.where(pmod(col("v"), lit(3L)) === 0).withColumn(ZSetFrame.W, lit(-1L)))
      val deltas = Seq(pos, retract)
      def aggFn(z: ZSetFrame): ZSetFrame =
        z.aggregate(Seq(col("k")), expandWeights = false, max(col("v")).as("mx"))
      val in = new Incremental.State(Incremental.emptyLike(deltas.head))
      val out = new Incremental.State(ZSetFrame.fromDelta(
        deltas.head.df.where(lit(false)).select(col("k"), col("v").as("mx"), col(ZSetFrame.W))))
      deltas.foreach { d =>
        val old = in.acc
        in.update(d)
        out.update(Incremental.generalAggDelta(d, old, in.acc, Seq("k"))(aggFn))
      }
      assertSameRows(out.acc.consolidate.df, aggFn(in.acc).df)
    }
  }
}
