package graft

import org.apache.spark.sql.functions._
import graft.queries.{Dedup, TextAnalysis}

/** Structural checks for the non-oracled similarity operators. */
class DedupSpec extends SparkSpec {

  test("simhash: deterministic, and near-dup pairs are hamming-closer than random") {
    val sh = Dedup.queries("d04_simhash")(spark, sf0001).cache()
    assert(sh.count() == 500)
    // deterministic across two evaluations
    assertSameRows(sh, Dedup.queries("d04_simhash")(spark, sf0001))
    // hamming distance of planted near-dup pairs vs overall average
    val pairs = TextAnalysis.queries("d02_jaccard_pairs")(spark, sf0001)
    val withH = pairs
      .join(sh.select(col("doc_id").as("d1"), col("simhash").as("h1")), Seq("d1"))
      .join(sh.select(col("doc_id").as("d2"), col("simhash").as("h2")), Seq("d2"))
      .select(bit_count(col("h1").bitwiseXOR(col("h2"))).as("ham"))
    val dupAvg = withH.agg(avg("ham")).head().getDouble(0)
    val rnd = sh.select(col("simhash").as("h1")).crossJoin(
        sh.select(col("simhash").as("h2")).limit(50))
      .select(bit_count(col("h1").bitwiseXOR(col("h2"))).as("ham"))
      .agg(avg("ham")).head().getDouble(0)
    assert(dupAvg < rnd / 2,
      s"near-dup hamming avg $dupAvg not well below random-pair avg $rnd")
  }

  test("ann-lsh: every reported neighbor shares the query's bucket and sim is exact") {
    val ann = Dedup.queries("d06_ann_lsh")(spark, sf0001).cache()
    assert(ann.count() > 0)
    // re-verify each reported sim against the exact brute-force value
    val brute = graft.queries.TextAnalysis.queries("d05_cosine_topk")(spark, sf0001)
      .where(col("rn") === 1).select(col("qid"), col("sim").as("best_sim"))
    val joined = ann.join(brute, Seq("qid"))
      .select(col("qid"), col("sim"), col("best_sim")).cache()
    // ANN top-1 sim can never exceed the exact top-1 sim
    assert(joined.where(col("sim") > col("best_sim") + 1e-12).isEmpty)
    // and it should find the true top-1 for a nontrivial fraction of queries
    val n = joined.count()
    val hits = joined.where(abs(col("sim") - col("best_sim")) < 1e-12).count()
    assert(hits.toDouble / n > 0.1, s"ANN recall@1 too low: $hits/$n")
  }

  test("minhash-lsh pairs equal exact jaccard pairs on the planted corpus") {
    assertSameRows(
      Dedup.queries("d03_minhash_lsh")(spark, sf0001),
      TextAnalysis.queries("d02_jaccard_pairs")(spark, sf0001))
  }
}
