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
    // multi-probe buckets at hamming distance ≤ 2 (d05 is the exact
    // baseline). Plane count scales with log(corpus) so the PROBED FRACTION
    // (probes / 2^planes) shrinks as the corpus grows, and planes are
    // hash-SEEDED COLUMN EXPRESSIONS — no driver-side vector literals at
    // any plane count. Rows-only check + DedupSpec (sims re-verified exact,
    // recall ≥0.9 on a 10× planted-near-dup corpus, candidate fraction
    // asserted bounded).
    "d06_ann_lsh" -> ((s, dir) => {
      val v = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      Dedup.annLshTop1(v, col("vec_id") < 100, Dedup.planesFor(v.count()))
    }),

    // IVF ANN: the d07 centroids are the coarse quantizer — every vector is
    // assigned to its nearest centroid cell (build step), a query probes
    // its top-2 cells and reranks EXACTLY inside them. Candidate fraction
    // is nprobe/cells by construction; at 100 TB cells ∝ √corpus keeps both
    // the assign shuffle and the per-cell rerank bounded. Rows-only check +
    // DedupSpec structural/recall assertions.
    "d08_ann_ivf" -> ((s, dir) => {
      val v = t(s, dir, "embeddings").select(
        col("vec_id"), col("label"), col("embedding"))
      Dedup.annIvfTop1(v, col("vec_id") < 100, nprobe = 2)
    }),

    // DUP CLUSTERS: near-dup pairs (d03's verified LSH output) → undirected
    // graph → connected components by min-label reachability, computed with
    // the log-depth doubling closure. The canonical-document assignment a
    // dedup pipeline actually ships: every clustered doc labeled with its
    // component's smallest doc_id.
    "d09_dup_clusters" -> ((s, dir) => {
      import graft.operators.Recursive
      val pairs = queries("d03_minhash_lsh")(s, dir).select("d1", "d2")
      val sym = pairs.select(col("d1").as("src"), col("d2").as("dst"))
        .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      val selfloops = sym.select(col("src")).distinct()
        .select(col("src"), col("src").as("dst"))
      val closure = Recursive.closureDoubling(
        sym.union(selfloops).localCheckpoint(true))
      closure.groupBy(col("src").as("doc_id")).agg(min("dst").as("cluster"))
    }),

    // EMBEDDING near-dup pairs, label-BLOCKED: exact cosine over all pairs
    // within a block (label = source/shard metadata), the standard blocking
    // strategy for embedding dedup at scale — one shuffle on the block key,
    // per-block all-pairs bounded by block size, no driver-side data. The
    // cosine goes through the codegen'd float dot product so the oracle
    // hash-matches bit-for-bit (d05's trick). Cross-block recall composes
    // with the LSH bucketing of d06 when blocks don't align with
    // similarity; within-block the result is EXACT, which is what makes it
    // oracle-certifiable (unlike a pure LSH pass).
    "d11_embed_neardup" -> ((s, dir) => {
      val dotN = (x: Column, y: Column) => graft.functions.VectorFunctions.dotF(x, y)
      val n = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding").as("e"))
        .withColumn("nrm", sqrt(dotN(col("e"), col("e"))))
      val a = n.select(col("label"), col("vec_id").as("d1"),
        col("e").as("ae"), col("nrm").as("an"))
      val b = n.select(col("label"), col("vec_id").as("d2"),
        col("e").as("be"), col("nrm").as("bn"))
      a.join(b, Seq("label")).where(col("d1") < col("d2"))
        .select(col("label"), col("d1"), col("d2"),
          (dotN(col("ae"), col("be")) / (col("an") * col("bn"))).as("sim"))
        .where(col("sim") >= 0.3)
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

  // ------------------------------------------------------------- ANN library

  /** planes ∝ log(corpus): bucket count tracks corpus size so per-bucket
    * occupancy (≈ n / 2^planes) stays constant as n grows. */
  def planesFor(corpusRows: Long, targetBucket: Long = 64L): Int =
    math.max(4, math.ceil(math.log(corpusRows.toDouble / targetBucket)
      / math.log(2.0)).toInt)

  private def dotd(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (u, v) => u * v), lit(0.0), (acc, v) => acc + v)

  /** Hyperplane p as a SEEDED COLUMN EXPRESSION: component j is
    * xxhash64(p, j) scaled to [−1, 1] — deterministic, no driver literals,
    * any plane count. */
  private def planeArr(p: Int, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      j => xxhash64(lit(p), j).cast("double") / lit(9.223372036854776e18))

  /** Sign-bit bucket id of an embedding column under nPlanes hyperplanes. */
  def lshBucket(e: Column, nPlanes: Int, dim: Int = 64): Column = {
    val ed = transform(e, _.cast("double"))
    (0 until nPlanes).map { p =>
      when(dotd(ed, planeArr(p, dim)) > 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Multi-probe masks: self, 1-bit flips, 2-bit flips (hamming ≤ 2). */
  def probeMasks(nPlanes: Int): Seq[Long] = {
    val singles = (0 until nPlanes).map(1L << _)
    val pairs = for {
      i <- 0 until nPlanes; j <- (i + 1) until nPlanes
    } yield (1L << i) | (1L << j)
    0L +: (singles ++ pairs)
  }

  /** Candidate pairs (qid, nid, sim) for queries selected by `isQuery`:
    * bucket-join on multi-probed LSH buckets, exact cosine on candidates
    * only. Exposed so DedupSpec can assert the probed candidate fraction. */
  def annLshCandidates(v: DataFrame, isQuery: Column, nPlanes: Int): DataFrame = {
    val dotN = (x: Column, y: Column) => graft.functions.VectorFunctions.dotF(x, y)
    val base = v.select(col("vec_id"), col("embedding").as("e"),
        lshBucket(col("embedding"), nPlanes).as("bucket"),
        isQuery.as("is_q"))
      .withColumn("nrm", sqrt(dotN(col("e"), col("e"))))
    val probes = typedLit(probeMasks(nPlanes))
    val q = base.where(col("is_q"))
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"),
        explode(transform(probes, p => col("bucket").bitwiseXOR(p))).as("bucket"))
    val c = base.select(col("vec_id").as("nid"), col("e").as("ce"),
      col("nrm").as("cn"), col("bucket"))
    q.join(c, Seq("bucket")).where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dotN(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("sim"))
      .distinct()
  }

  /** ANN top-1 per query via LSH multi-probe + exact rerank. */
  def annLshTop1(v: DataFrame, isQuery: Column, nPlanes: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    annLshCandidates(v, isQuery, nPlanes)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("qid", "nid", "sim")
  }

  /** IVF top-1: nearest-centroid cell assignment (coarse quantize over the
    * d07 per-label centroids), probe the query's top-`nprobe` cells, exact
    * cosine rerank inside them. */
  def annIvfTop1(v: DataFrame, isQuery: Column, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dotN = (x: Column, y: Column) => graft.functions.VectorFunctions.dotF(x, y)
    // build: per-label centroid vectors, collected into a broadcast array
    // column (cells are few — ∝ √corpus; the vectors stay distributed)
    val cent = v
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "cv")))
      .groupBy("label", "pos")
      .agg((sum(col("cv").cast("double").cast(DecimalType(18, 9))).cast("double")
        / count(lit(1))).as("cval"))
      .groupBy("label").agg(array_sort(collect_list(struct(col("pos"), col("cval"))))
        .as("sorted"))
      .select(col("label").as("cell"), transform(col("sorted"), _.getField("cval")).as("cvec"))
    val ed = (e: Column) => transform(e, _.cast("double"))
    // assign every vector to its nearest cell by cosine against centroids
    def cellOf(df: DataFrame, rank: Int): DataFrame = {
      val sims = df.crossJoin(broadcast(cent))
        .withColumn("csim", dotd(ed(col("embedding")), col("cvec"))
          / (sqrt(dotd(ed(col("embedding")), ed(col("embedding")))) *
             sqrt(dotd(col("cvec"), col("cvec")))))
      val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cell"))
      sims.withColumn("crn", row_number().over(w)).where(col("crn") <= rank)
        .select(col("vec_id"), col("embedding"), col("cell"))
    }
    val corpus = cellOf(v, 1) // build step: each vector lives in ONE cell
      .select(col("vec_id").as("nid"), col("embedding").as("ce"), col("cell"))
    val queries = cellOf(v.where(isQuery), nprobe) // probe top-n cells
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("cell"))
    val sims = queries.join(corpus, Seq("cell")).where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dotN(col("qe"), col("ce")) /
          (sqrt(dotN(col("qe"), col("qe"))) * sqrt(dotN(col("ce"), col("ce"))))).as("sim"))
      .distinct()
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    sims.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("qid", "nid", "sim")
  }

  override def oracle: Map[String, String] = Map(
    // identical to the exact d02 result (LSH verified-candidates path)
    "d03_minhash_lsh" -> TextAnalysis.oracle("d02_jaccard_pairs"),
    "d09_dup_clusters" ->
      s"""WITH RECURSIVE pairs AS (${TextAnalysis.oracle("d02_jaccard_pairs")}),
         e AS (SELECT d1 AS src, d2 AS dst FROM pairs
               UNION SELECT d2, d1 FROM pairs
               UNION SELECT d1, d1 FROM pairs
               UNION SELECT d2, d2 FROM pairs),
         r AS (SELECT src, dst FROM e
               UNION
               SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src)
         SELECT src AS doc_id, min(dst) AS cluster FROM r GROUP BY src""",
    "d11_embed_neardup" ->
      """WITH n AS (SELECT vec_id, label, embedding::DOUBLE[] AS e,
               sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
             FROM embeddings)
         SELECT a.label, a.vec_id AS d1, b.vec_id AS d2,
                list_inner_product(a.e, b.e) / (a.nrm * b.nrm) AS sim
         FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE list_inner_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.3""",
    "d07_label_centroids" ->
      """SELECT label, i AS pos,
           CAST(SUM(CAST(CAST(embedding[i+1] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*) AS cval
         FROM embeddings, range(64) t(i) GROUP BY 1, 2"""
  )
}
