package graft

import org.apache.spark.sql.functions._
import graft.queries.{Sketches, TextAnalysis}
import graft.core.Tables

/** Accuracy and algebraic gates for the sketch operators — the properties
  * the oracle's exact hash-compare cannot express (the oracle certifies the
  * registers/cells bit-for-bit; these gates certify that those registers
  * mean what a sketch is supposed to mean). */
class SketchSpec extends SparkSpec {

  private def shingleSet(dir: String) =
    Tables(spark, dir, "documents")
      .select(explode(TextAnalysis.shingles(col("text"))).as("w"))

  test("d26 HLL estimate within 3σ of the exact shingle cardinality") {
    val regs = Sketches.queries("d26_hll_registers")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val est = Sketches.hllEstimate(regs)
    val exact = shingleSet(sf0001).distinct().count().toDouble
    val relErr = math.abs(est - exact) / exact
    // σ = 1.04/√128 ≈ 9.2%; 3σ ≈ 27.6%
    assert(relErr <= 0.276,
      s"HLL estimate $est vs exact $exact: rel err $relErr > 3σ")
  }

  test("d26 HLL registers are mergeable: per-source max-merge == global") {
    val docs = Tables(spark, sf0001, "documents")
    val perSource = docs.select(col("source"),
        explode(TextAnalysis.shingles(col("text"))).as("w"))
    // build one register file per source, then max-merge across sources
    val bySource = Sketches.hllRegisters(perSource, col("w"), Seq("source"))
    val merged = bySource.groupBy("reg").agg(max(col("rho")).as("rho"))
    assertSameRows(merged, Sketches.queries("d26_hll_registers")(spark, sf0001))
  }

  test("q70 incremental HLL == d26 batch register file") {
    assertSameRows(
      Sketches.queries("q70_inc_hll")(spark, sf0001),
      Sketches.queries("d26_hll_registers")(spark, sf0001))
  }

  test("d27 CMS estimates dominate exact counts and respect the ε-bound") {
    val est = Sketches.queries("d27_cms_heavy")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalN = exact.values.sum
    assert(est.nonEmpty)
    // est ≥ exact is a STRUCTURAL invariant (cells only ever over-count)
    est.foreach { case (w, e) =>
      assert(e >= exact(w), s"CMS estimate $e below exact ${exact(w)} for '$w' — impossible")
    }
    // the ε-bound (est ≤ exact + eN/width) holds per probe with prob
    // 1 − e^-depth ≈ 0.95 — a PROBABILISTIC guarantee, so gate the
    // fraction, not every probe (with this corpus's fixed hashes exactly
    // one of 31 probes triple-collides)
    val bound = (2.72 * totalN / 256).toLong + 1
    val within = est.count { case (w, e) => e - exact(w) <= bound }
    assert(within.toDouble / est.size >= 0.9,
      s"only $within/${est.size} CMS probes within εN bound $bound")
  }

  test("d28 reservoir is mergeable: k-min of partition k-mins == global k-min") {
    val docs = Tables(spark, sf0001, "documents")
    val skey = md5(concat(col("doc_id").cast("string"), lit("|"), col("source")))
    val keyed = docs.select(col("source"), col("doc_id"), skey.as("skey"))
    // split the corpus arbitrarily, take per-split k-min, merge, re-take
    import org.apache.spark.sql.expressions.Window
    def kmin(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy("source").orderBy(col("skey"), col("doc_id"))
      df.withColumn("rn", row_number().over(w).cast("long")).where(col("rn") <= 8)
    }
    val split1 = kmin(keyed.where(pmod(col("doc_id"), lit(2L)) === 0))
    val split2 = kmin(keyed.where(pmod(col("doc_id"), lit(2L)) === 1))
    val remerged = kmin(split1.drop("rn").union(split2.drop("rn")))
      .select("source", "doc_id", "rn")
    assertSameRows(remerged, Sketches.queries("d28_reservoir")(spark, sf0001))
  }
}
