package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pins broadcast-subtree CollectMetrics behavior (an r18 design probe for
  * Bm25State's stat fusion, kept as documentation): in PLAIN executions the
  * metrics report, but a q90 streaming micro-batch execution was observed
  * to drop them (Observation.get blocked forever), which is why the Bm25
  * stat fusion collects concurrently with the emission instead of riding
  * Observations on the broadcast builds. Do not put an Observation anywhere
  * AQE can rewrite away or a stage may be skipped. */
class ObservationSpec extends SparkSpec {
  import spark.implicits._

  test("observation inside broadcast build subtree reports") {
    val big = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("k"))
    val obs = new Observation()
    val small = spark.range(0, 7).select(col("id").as("k"))
      .observe(obs, count(lit(1)).as("n"), sum(col("k")).as("s"))
    val joined = big.join(broadcast(small), Seq("k"))
    val cnt = joined.count()
    assert(cnt == 1000L)
    val got = scala.concurrent.Future {
      (obs.get("n").asInstanceOf[Long], obs.get("s").asInstanceOf[Long])
    }(scala.concurrent.ExecutionContext.global)
    val r = scala.concurrent.Await.result(got,
      scala.concurrent.duration.Duration(20, "s"))
    assert(r == ((7L, 21L)), s"got $r")
  }

  test("observation below empty-probe broadcast join still reports") {
    // probe side empty at runtime (RDD-backed, statically unknown): the
    // broadcast must still build and its metrics must still report
    val bigEmpty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[(Long, Long)], 4)
        .map { case (a, b) => org.apache.spark.sql.Row(a, b) },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))))
    val obs = new Observation()
    val small = spark.range(0, 5).select(col("id").as("k"))
      .observe(obs, count(lit(1)).as("n"))
    val joined = bigEmpty.join(broadcast(small), Seq("k"))
    assert(joined.count() == 0L)
    val got = scala.concurrent.Future {
      obs.get("n").asInstanceOf[Long]
    }(scala.concurrent.ExecutionContext.global)
    val r = scala.concurrent.Await.result(got,
      scala.concurrent.duration.Duration(20, "s"))
    assert(r == 5L, s"got $r")
  }
}
