package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Mergeable sketch operators — the bounded-state summaries a 100 TB
  * pipeline aggregates with when exact state would be corpus-sized:
  * HyperLogLog approximate distinct (d26 batch, q70 incremental),
  * count-min heavy-hitter estimation (d27), and a deterministic
  * bounded-k reservoir sample (d28).
  *
  * Everything here is ENGINE-NEUTRAL integer arithmetic on an md5-derived
  * 60-bit hash (`Dedup.hash60` — positionally hex-decodable by any SQL
  * engine), so each sketch has a literal DuckDB mirror and the driver's
  * hash-compare gate is exact: the oracle certifies the sketch's actual
  * registers/cells, not a tolerance band. Accuracy vs exact ground truth
  * is gated separately in SketchSpec.
  *
  * Reference: the reference engine ships no sketch aggregates (its
  * aggregates are exact Folds — crates/dbsp/src/operator/aggregate/mod.rs);
  * these follow the standard published constructions (Flajolet et al. 2007
  * HyperLogLog; Cormode & Muthukrishnan 2005 count-min) re-expressed as
  * Spark relational plans.
  */
object Sketches extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // -------------------------------------------------------------- HLL core

  /** Number of HLL registers (2^7). At 100 TB the register file is still
    * 128 rows — the whole point: cardinality state is O(m), not O(n). */
  private[queries] val HllM = 128
  private val HllP = 7 // log2(HllM)

  /** Bit length of a non-negative long (0 for 0) via smear + popcount —
    * pure shift/or/popcount integer ops, so Spark and DuckDB compute the
    * identical value (no libm log2 whose rounding could differ at powers
    * of two). */
  private def bitLen(c: Column): Column = {
    val s1 = c.bitwiseOR(shiftright(c, 1))
    val s2 = s1.bitwiseOR(shiftright(s1, 2))
    val s3 = s2.bitwiseOR(shiftright(s2, 4))
    val s4 = s3.bitwiseOR(shiftright(s3, 8))
    val s5 = s4.bitwiseOR(shiftright(s4, 16))
    val s6 = s5.bitwiseOR(shiftright(s5, 32))
    bit_count(s6)
  }

  /** HLL register file of a column of string values: 60-bit hash → low
    * HllP bits pick the register, the remaining 53 bits' leading-zero rank
    * (rho ∈ [1, 54]) is max-folded per register. One shuffle of ≤ m rows
    * (× |keys| when grouped) after map-side partial max — the build cost is
    * a corpus scan plus a constant-size aggregation regardless of
    * cardinality. `keys` builds one register file per key group (the
    * per-source/per-shard partial sketches the merge test exercises). */
  private[graft] def hllRegisters(values: DataFrame, value: Column,
                                  keys: Seq[String] = Nil): DataFrame = {
    val h = Dedup.hash60(value)
    val cols = keys.map(col) ++ Seq(
      pmod(h, lit(HllM.toLong)).as("reg"),
      (lit(54) - bitLen(shiftright(h, HllP))).cast("long").as("rho"))
    values.select(cols: _*)
      .groupBy((keys :+ "reg").map(col): _*).agg(max(col("rho")).as("rho"))
  }

  /** Standard HLL estimate from a (reg, rho) register file, computed with
    * exact-integer harmonic denominator sum(2^(54-rho)) (each term is an
    * exact power of two ≤ 2^53 and m ≤ 128 terms fit a long, so the sum is
    * order-independent — no float accumulation). Used by SketchSpec's
    * accuracy gate; the certified query output is the register file itself. */
  private[graft] def hllEstimate(regs: Seq[(Long, Long)]): Double = {
    val m = HllM.toDouble
    val denomInt = regs.map { case (_, rho) => 1L << (54 - rho.toInt) }.sum
    val zeros = HllM - regs.size
    // registers never hit: rho = 0 → 2^54 each (value 2^-0 = 1 after scaling)
    val denom = denomInt.toDouble / math.pow(2.0, 54.0) + zeros.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m / denom
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros.toDouble) else raw
  }

  // --------------------------------------------------------------- queries

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // HYPERLOGLOG REGISTER FILE (d26) — approximate distinct-shingle count
    // over the corpus as a 128-register HLL (ground set: the word 5-gram
    // shingles of d02/d03 — ~24k distinct at sf0.01, well inside the raw-
    // estimate regime). The certified artifact is the register file
    // (integer-exact, oracle hash-green); SketchSpec gates the derived
    // estimate within 3σ = 3·1.04/√128 ≈ 27.6% of the exact cardinality
    // and proves MERGEABILITY: per-source register files max-merged equal
    // this global one — the property that makes HLL the 100 TB
    // distinct-count operator (partial sketches combine map-side; the
    // shuffle carries ≤ m rows per partition).
    "d26_hll_registers" -> ((s, dir) => {
      val sh = t(s, dir, "documents")
        .select(explode(TextAnalysis.shingles(col("text"))).as("w"))
      hllRegisters(sh, col("w"))
    }),

    // INCREMENTAL HLL MAINTENANCE (q70) — the register file maintained
    // across 4 arrival batches: each step sketches ONLY its delta (O(Δ)
    // scan) and max-merges into the 128-row state (O(m), broadcast-sized).
    // Insert-monotone by design — max is not invertible, so deletion would
    // need a rebuild; that is the honest semantics of every HLL deployment
    // and exactly why the exact incremental aggregates (q29–q32) coexist
    // with it. Final state == the batch register file (same oracle as d26).
    "q70_inc_hll" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val batches = (0 until 4).map(b =>
        docs.where(pmod(col("doc_id"), lit(4L)) === b)
          .select(explode(TextAnalysis.shingles(col("text"))).as("w")))
      batches.foldLeft(Option.empty[DataFrame]) { (st, b) =>
        val br = hllRegisters(b, col("w"))
        val merged = st.fold(br)(prev =>
          prev.union(br).groupBy("reg").agg(max(col("rho")).as("rho")))
        // state is ≤ m rows; eager checkpoint keeps the per-step plan O(1)
        Some(merged.localCheckpoint(true))
      }.get
    }),

    // COUNT-MIN SKETCH (d27) — heavy-hitter frequency estimation: a 3×256
    // cell array built in ONE shuffle with map-side combine (768 cells
    // total, corpus-size-independent), probed for the distinct tokens of
    // docs 0–9 by min-over-rows of the hashed cells. The sketch is
    // broadcast at probe time — at 100 TB the corpus is touched once to
    // build and once to probe, and the join side that moves is 768 rows.
    // Estimates are exact integers (oracle hash-green); the CMS guarantee
    // (est ≥ true, est ≤ true + εN w.h.p.) is gated in SketchSpec against
    // exact counts.
    "d27_cms_heavy" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tok = docs.select(explode(split(col("text"), " ")).as("w"))
      val ds = array(lit(0L), lit(1L), lit(2L))
      def cellIdx(w: Column, d: Column): Column =
        pmod(Dedup.hash60(concat(d.cast("string"), lit(":"), w)), lit(256L))
      val cells = tok.select(explode(ds).as("d"), col("w"))
        .select(col("d"), cellIdx(col("w"), col("d")).as("idx"))
        .groupBy("d", "idx").agg(count(lit(1)).as("c"))
      val probe = docs.where(col("doc_id") < 10)
        .select(explode(split(col("text"), " ")).as("w")).distinct()
      probe.select(col("w"), explode(ds).as("d"))
        .select(col("w"), col("d"), cellIdx(col("w"), col("d")).as("idx"))
        .join(broadcast(cells), Seq("d", "idx"))
        .groupBy("w").agg(min(col("c")).as("est"))
    }),

    // DETERMINISTIC BOUNDED-K RESERVOIR (d28) — uniform-without-replacement
    // k=8 sample per source via k-minimum md5 rank: keep the k smallest
    // hash values per key. Bounded O(k) state per key, and MERGEABLE (the
    // k smallest of a union = k smallest of the merged k-smallest sets —
    // SketchSpec proves it), which is what makes it the streaming/
    // distributed reservoir: executors keep local top-k heaps, the shuffle
    // carries k rows per (key, partition). Complements d12 (Bernoulli
    // rate-sampling, unbounded output) with the bounded-output contract a
    // per-source eval-set draw needs.
    "d28_reservoir" -> ((s, dir) => {
      val skey = md5(concat(col("doc_id").cast("string"), lit("|"), col("source")))
      val w = Window.partitionBy("source").orderBy(col("skey"), col("doc_id"))
      t(s, dir, "documents")
        .select(col("source"), col("doc_id"), skey.as("skey"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 8)
        .select("source", "doc_id", "rn")
    })
  )

  // ---------------------------------------------------------------- oracle

  /** DuckDB rendition of Dedup.hash60: positional hex decode of the first
    * 15 md5 chars (DuckDB has no hex→int cast). */
  private def h60(sqlExpr: String): String =
    s"""CAST(list_sum(list_transform(range(15), k ->
          (strpos('0123456789abcdef', substr(md5($sqlExpr), CAST(k + 1 AS INT), 1)) - 1)::BIGINT
            * (1::BIGINT << CAST(4 * (14 - k) AS INT)))) AS BIGINT)"""

  /** Literal mirror of the HLL register build (shared by d26 and q70 —
    * incremental max-merge ≡ batch max by monoid associativity). */
  private val hllOracleSql: String =
    s"""WITH tok AS (SELECT unnest(list_distinct(list_transform(
            range(len(string_split(text, ' ')) - 4),
            i -> array_to_string(string_split(text, ' ')[i+1:i+5], ' ')))) AS w
          FROM documents),
        th AS (SELECT ${h60("w")} AS h FROM tok),
        rw AS (SELECT h % 128 AS reg, h >> 7 AS v FROM th),
        sm AS (
          SELECT reg, v5 | (v5 >> 32) AS v6 FROM (
            SELECT reg, v4 | (v4 >> 16) AS v5 FROM (
              SELECT reg, v3 | (v3 >> 8) AS v4 FROM (
                SELECT reg, v2 | (v2 >> 4) AS v3 FROM (
                  SELECT reg, v1 | (v1 >> 2) AS v2 FROM (
                    SELECT reg, v | (v >> 1) AS v1 FROM rw))))))
        SELECT reg, CAST(max(54 - bit_count(v6)) AS BIGINT) AS rho
        FROM sm GROUP BY reg"""

  override def oracle: Map[String, String] = Map(
    "d26_hll_registers" -> hllOracleSql,
    "q70_inc_hll" -> hllOracleSql,
    "d27_cms_heavy" ->
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
          cells AS (
            SELECT d, ${h60("CAST(d AS VARCHAR) || ':' || w")} % 256 AS idx,
                   count(*) AS c
            FROM tok, range(3) t(d) GROUP BY 1, 2),
          probe AS (
            SELECT DISTINCT unnest(string_split(text, ' ')) AS w
            FROM documents WHERE doc_id < 10),
          pidx AS (
            SELECT w, d, ${h60("CAST(d AS VARCHAR) || ':' || w")} % 256 AS idx
            FROM probe, range(3) t(d))
          SELECT w, CAST(min(c) AS BIGINT) AS est
          FROM pidx JOIN cells USING (d, idx) GROUP BY w""",
    "d28_reservoir" ->
      """SELECT source, doc_id, rn FROM (
           SELECT source, doc_id,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '|' || source), doc_id)
               AS BIGINT) AS rn
           FROM documents)
         WHERE rn <= 8"""
  )
}
