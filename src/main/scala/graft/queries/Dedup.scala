package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scale-path near-dup + similarity operators: MinHash+LSH banding, SimHash,
  * and LSH-bucketed approximate nearest neighbors. These avoid the all-pairs
  * comparison of d02/d05: candidate generation is a shuffle on band/bucket
  * keys (bounded fan-out), then only candidates are verified exactly — the
  * pattern that survives 100 TB. All pure column expressions (codegen'd). */
object Dedup extends QueryModule {
  import TextAnalysis.shingles

  private val NumHashes = 32 // 16 bands × 2 rows → P(miss | jac .5) ≈ 1%
  private val BandRows = 2

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Per-doc MinHash signature columns m0..m31 from exploded shingles:
    * one shuffle on doc_id, 32 min-aggregates (partial agg map-side). */
  private def signatures(docs: DataFrame): DataFrame = {
    val sh = docs.select(col("doc_id"), explode(shingles(col("text"))).as("g"))
    val mins = (0 until NumHashes).map(i => min(xxhash64(lit(i), col("g"))).as(s"m$i"))
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MinHash + LSH banding + exact-Jaccard verification. With 16 bands the
    // false-negative rate at jac≥0.5 is ~1% (planted pairs are ≥0.875 →
    // ~1e-10), so the verified output equals the exact d02 result and shares
    // its oracle. reference analog: none (beyond-reference operator).
    "d03_minhash_lsh" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sig = signatures(docs)
      // band key = hash of the band's signature slice
      val bands = (0 until NumHashes / BandRows).map { b =>
        val cols = (0 until BandRows).map(r => col(s"m${b * BandRows + r}"))
        struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
      }
      val buckets = sig.select(col("doc_id"), explode(array(bands: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
      val cand = buckets.as("x").join(buckets.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2")).distinct()
      // exact verification of candidates only
      val sh = docs.select(col("doc_id"), explode(shingles(col("text"))).as("g"))
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val inter = cand
        .join(sh.as("a"), col("d1") === col("a.doc_id"))
        .join(sh.as("b"), col("d2") === col("b.doc_id") && col("a.g") === col("b.g"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      val jac = col("inter").cast("double") / (col("s1.sz") + col("s2.sz") - col("inter"))
      inter.join(sz.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sz.as("s2"), col("d2") === col("s2.doc_id"))
        .where(jac >= 0.5)
        .select(col("d1"), col("d2"), jac.as("jac"))
    }),

    // SimHash document fingerprint (48-bit): token hashes vote per bit.
    // No DuckDB-expressible oracle (xxhash64) → rows-only check + ScalaTest.
    "d04_simhash" -> ((s, dir) => {
      val tk = split(col("text"), " ")
      val th = transform(tk, w => xxhash64(w))
      val masks = typedLit((0 until 48).map(1L << _))
      val counters = aggregate(th, array_repeat(lit(0L), 48),
        (acc, h) => zip_with(acc, masks,
          (c, m) => c + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
      val sim = aggregate(zip_with(counters, masks,
        (c, m) => when(c > 0L, m).otherwise(0L)), lit(0L), (a, b) => a.bitwiseOR(b))
      t(s, dir, "documents").select(col("doc_id"), sim.as("simhash"))
    }),

    // LSH-bucketed ANN: random-hyperplane sign bits → bucket; queries
    // multi-probe buckets at hamming distance ≤ 1 (the IVF-style scale
    // path; d05 is the exact baseline). At 100 TB: more planes + the same
    // multi-probe keeps per-bucket candidate sets bounded while the join
    // stays a plain shuffle on the bucket id. Rows-only check + ScalaTest
    // (sims re-verified against the exact formula, recall vs brute force).
    "d06_ann_lsh" -> ((s, dir) => {
      val rnd = new scala.util.Random(42)
      val nPlanes = 4
      val planes = Seq.fill(nPlanes)(Seq.fill(64)(rnd.nextDouble() * 2 - 1))
      val dotd = (x: Column, y: Column) =>
        aggregate(zip_with(x, y, (u, v) => u * v), lit(0.0), (acc, v) => acc + v)
      val e = transform(col("embedding"), _.cast("double"))
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        when(dotd(e, typedLit(p)) > 0.0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      val dotN = (x: Column, y: Column) => graft.functions.VectorFunctions.dotF(x, y)
      val v = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("e"), bucket.as("bucket"))
        .withColumn("nrm", sqrt(dotN(col("e"), col("e"))))
      val probes = typedLit(0L +: (0 until nPlanes).map(1L << _)) // self + 1-bit flips
      val q = v.where(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"),
          explode(transform(probes, p => col("bucket").bitwiseXOR(p))).as("bucket"))
      val c = v.select(col("vec_id").as("nid"), col("e").as("ce"), col("nrm").as("cn"), col("bucket"))
      val sims = q.join(c, Seq("bucket")).where(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          (dotN(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("sim"))
      val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
      sims.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("qid", "nid", "sim")
    }),

    // per-label embedding centroids (the IVF coarse-quantizer build step):
    // positional explode + decimal-exact mean per (label, dim). One shuffle
    // on (label, pos); at 100 TB this is the standard fan-out that AQE
    // coalesces — no driver-side vectors.
    "d07_label_centroids" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg((sum(col("v").cast("double").cast(DecimalType(18, 9))).cast("double")
          / count(lit(1))).as("cval"))
    })
  )

  override def oracle: Map[String, String] = Map(
    // identical to the exact d02 result (LSH verified-candidates path)
    "d03_minhash_lsh" -> TextAnalysis.oracle("d02_jaccard_pairs"),
    "d07_label_centroids" ->
      """SELECT label, i AS pos,
           CAST(SUM(CAST(CAST(embedding[i+1] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*) AS cval
         FROM embeddings, range(64) t(i) GROUP BY 1, 2"""
  )
}
