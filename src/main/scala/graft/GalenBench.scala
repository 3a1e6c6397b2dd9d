package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Galen-scale recursion: the 6-rule mutually-recursive Datalog program of
  * the reference's heaviest recursive benchmark (reference:
  * crates/dbsp/benches/galen.rs:182-236, which credits the public
  * dynamic-datalog problem set; rules IR1-IR6 as named there):
  *
  *   IR1: p(x,z) :- p(x,y), p(y,z).
  *   IR2: q(x,r,z) :- p(x,y), q(y,r,z).
  *   IR3: p(x,z) :- p(y,w), u(w,r,z), q(x,r,y).
  *   IR4: p(x,z) :- c(y,w,z), p(x,w), p(x,y).
  *   IR5: q(x,q2,z) :- q(x,r,z), s(r,q2).
  *   IR6: q(x,e,o) :- q(x,y,z), r(y,u2,e), q(z,u2,o).
  *
  * p and q are MUTUALLY recursive through IR2/IR3 with 3-way joins inside
  * the fixpoint (IR3/IR4/IR6) — well beyond the 2-rule even/odd toy (q59).
  * Evaluation is semi-naive over BOTH collections: each iteration derives
  * only from the last deltas (Δp⋈p ∪ p⋈Δp per bilinear position), so
  * per-iteration cost tracks |Δ|, not the accumulated fact count — the
  * claim the per-iteration floor gates (late iterations have tiny deltas;
  * if any rule rescanned the accumulator the floor would grow with n).
  *
  * Synthetic data (no external downloads in this environment; the
  * reference's dataset is a fixed file): a parent-pointer forest p₀(i,
  * i/2) whose IR1 closure is the ancestor relation (depth log₂ n bounds
  * the iteration count), sparse q₀ seeds at mid-depth nodes, and small
  * static u/c/s/r relations wired so every rule fires without blowing the
  * fixpoint past O(n log n). All joins are equi-joins on longs —
  * shuffle-partitionable end to end, no driver data. */
object GalenBench {

  private def materialize(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Base + static relations, deterministically generated from `n`. */
  def relations(spark: SparkSession, n: Long): Map[String, DataFrame] = {
    val ids = spark.range(1L, n)
    Map(
      // parent pointers: IR1-closes to the ancestor relation
      "p" -> ids.select(col("id").as("px"), (col("id") / 2).cast("long").as("py")),
      // sparse q seeds at mid-depth nodes: IR2 spreads each a few levels
      "q" -> ids.where(col("id") % 64 === 0 && col("id") > n / 4 && col("id") < n / 2)
        .select(col("id").as("qx"), (col("id") % 16).as("qr"),
          (col("id") / 2).cast("long").as("qz")),
      // u(w, r, z): lets IR3 re-enter p from q matches
      "u" -> ids.where(col("id") % 128 === 0)
        .select(col("id").as("uw"), (col("id") % 16).as("ur"),
          (col("id") % 97 + 1).as("uz")),
      // c(y, w, z): IR4's ternary guard over sibling pairs
      "c" -> ids.where(col("id") % 128 === 0)
        .select(col("id").as("cy"), (col("id") + 1).as("cw"),
          (col("id") % 89 + 1).as("cz")),
      // s: rotate low r values a bounded number of times (no cycle)
      "s" -> spark.range(0L, 3L).select(col("id").as("sr"), (col("id") + 1).as("sq")),
      // r(y, u2, e): IR6's re-association triples
      "r" -> ids.where(col("id") % 256 === 0)
        .select((col("id") % 16).as("ry"), (col("id") % 7).as("ru"),
          (col("id") % 83 + 1).as("re")))
  }

  /** One semi-naive derivation round: candidates for Δp / Δq from the last
    * deltas against the accumulated collections (acc already includes the
    * last delta, so Δ⋈acc ∪ acc⋈Δ covers every new substitution; the
    * caller's except() discards re-derivations). */
  def derive(ap: DataFrame, aq: DataFrame, dp: DataFrame, dq: DataFrame,
             st: Map[String, DataFrame]): (DataFrame, DataFrame) = {
    val (u, c, s, r) = (st("u"), st("c"), st("s"), st("r"))
    def pp(a: DataFrame, b: DataFrame) = // IR1 term: a(x,y) ⋈ b(y,z)
      a.select(col("px").as("x"), col("py").as("y"))
        .join(b.select(col("px").as("y"), col("py").as("z")), "y")
        .select(col("x").as("px"), col("z").as("py"))
    def pq(a: DataFrame, b: DataFrame) = // IR2 term: a=p(x,y) ⋈ b=q(y,r,z)
      a.select(col("px").as("x"), col("py").as("y"))
        .join(b.select(col("qx").as("y"), col("qr"), col("qz")), "y")
        .select(col("x").as("qx"), col("qr"), col("qz"))
    def ir3(a: DataFrame, b: DataFrame) = // a=p(y,w) ⋈ u(w,r,z) ⋈ b=q(x,r,y)
      a.select(col("px").as("y3"), col("py").as("w3"))
        .join(u.select(col("uw").as("w3"), col("ur").as("r3"), col("uz").as("z3")), "w3")
        .join(b.select(col("qx").as("x3"), col("qr").as("r3"), col("qz").as("y3")),
          Seq("r3", "y3"))
        .select(col("x3").as("px"), col("z3").as("py"))
    def ir4(a: DataFrame, b: DataFrame) = // c(y,w,z) ⋈ a=p(x,w) ⋈ b=p(x,y)
      c.select(col("cy").as("y4"), col("cw").as("w4"), col("cz").as("z4"))
        .join(a.select(col("px").as("x4"), col("py").as("w4")), "w4")
        .join(b.select(col("px").as("x4"), col("py").as("y4")), Seq("x4", "y4"))
        .select(col("x4").as("px"), col("z4").as("py"))
    def ir6(a: DataFrame, b: DataFrame) = // a=q(x,y,z) ⋈ r(y,u2,e) ⋈ b=q(z,u2,o)
      a.select(col("qx").as("x6"), col("qr").as("y6"), col("qz").as("z6"))
        .join(r.select(col("ry").as("y6"), col("ru").as("u6"), col("re").as("e6")), "y6")
        .join(b.select(col("qx").as("z6"), col("qr").as("u6"), col("qz").as("o6")),
          Seq("z6", "u6"))
        .select(col("x6").as("qx"), col("e6").as("qr"), col("o6").as("qz"))
    val newP = pp(dp, ap).union(pp(ap, dp))                 // IR1
      .union(ir3(dp, aq)).union(ir3(ap, dq))                // IR3
      .union(ir4(dp, ap)).union(ir4(ap, dp))                // IR4
    val newQ = pq(dp, aq).union(pq(ap, dq))                 // IR2
      .union(dq.select(col("qx"), col("qr"), col("qz"))     // IR5
        .join(s.select(col("sr").as("qr"), col("sq")), "qr")
        .select(col("qx"), col("sq").as("qr"), col("qz")))
      .union(ir6(dq, aq)).union(ir6(aq, dq))                // IR6
    (newP, newQ)
  }

  /** Timed semi-naive run to fixpoint. Returns (|p|, |q|, per-iteration
    * seconds). Statics are materialized once; each iteration derives from
    * the last deltas only, `except`s against the accumulator, and
    * materializes just the fresh facts — accumulators are LAZY unions of
    * per-iteration delta segments, compacted every 8 iterations (the
    * `fixpoint` accumulator pattern), so an iteration never rewrites the
    * accumulated collections. */
  def run(spark: SparkSession, n: Long, maxIter: Int = 64)
      : (DataFrame, DataFrame, Seq[Double], Seq[Long]) = {
    val st = relations(spark, n).map { case (k, v) => k -> materialize(v) }
    def accOf(l: List[DataFrame]) = l.reduce(_ union _)
    var pSegs = List(materialize(st("p").distinct()))
    var qSegs = List(materialize(st("q").distinct()))
    var (ap, aq) = (pSegs.head, qSegs.head)
    var (dp, dq) = (pSegs.head, qSegs.head)
    val times = scala.collection.mutable.Buffer[Double]()
    val dRows = scala.collection.mutable.Buffer[Long]()
    var i = 0
    var live = true
    while (i < maxIter && live) {
      val t0 = System.nanoTime()
      val (cp, cq) = derive(ap, aq, dp, dq, st)
      dp = materialize(cp.except(ap))
      dq = materialize(cq.except(aq))
      live = !dp.isEmpty || !dq.isEmpty
      if (!dp.isEmpty) {
        pSegs ::= dp
        if (pSegs.size >= 8) pSegs = List(materialize(accOf(pSegs)))
        ap = accOf(pSegs)
      }
      if (!dq.isEmpty) {
        qSegs ::= dq
        if (qSegs.size >= 8) qSegs = List(materialize(accOf(qSegs)))
        aq = accOf(qSegs)
      }
      times += (System.nanoTime() - t0) / 1e9
      // derived-fact counts for the per-fact flatness stat — OUTSIDE the
      // timed region (the deltas are already materialized; this is a scan)
      dRows += dp.count() + dq.count()
      i += 1
    }
    // an exhausted iteration budget must FAIL, not hand back a
    // silently-incomplete fixpoint (the spec's set-equality gate would
    // catch it at test scale, but bench-scale runs have no oracle)
    require(!live, s"galen fixpoint did not converge within $maxIter rounds")
    (ap, aq, times.toSeq, dRows.toSeq)
  }
}
