package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handles sort-merge
  * skew at runtime; salting is the static escape hatch when one key
  * dominates (e.g. a hot shingle or a null-heavy foreign key at 100 TB):
  * the probe side scatters each row into one of `salts` sub-keys, the build
  * side replicates across all `salts`, restoring uniform partition sizes at
  * the cost of |small| × salts. */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    // deterministic scatter: hash of the whole row, not a rand() — keeps
    // retries/speculative tasks consistent
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }
}
