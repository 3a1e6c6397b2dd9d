package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Usage sample through the public API — what a library consumer writes.
  * Run: sbt "runMain graft.Demo" */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // geo scalars
    val km = Seq((2.3522, 48.8566, -0.1276, 51.5072)).toDF("lo1", "la1", "lo2", "la2")
      .select(functions.Geo.stDistance(
        functions.Geo.stPoint($"lo1", $"la1"),
        functions.Geo.stPoint($"lo2", $"la2")).as("km")).head.getDouble(0)
    println(f"DEMO geo paris-london = $km%.1f km")

    // typed fold aggregator
    val avg2 = Seq((1L, 1.0), (1L, 2.0), (1L, 3.0)).toDS
      .groupByKey(_._1)
      .agg(new functions.Fold.LastNAvg[(Long, Double)](2, _._2).toColumn.name("a"))
      .collect().toMap
    println(s"DEMO fold last-2 avg = $avg2")

    // Z-set differentiate / integrate
    val prev = core.ZSetFrame.fromTable(Seq((1L, "a")).toDF("k", "v"))
    val curr = core.ZSetFrame.fromTable(Seq((2L, "b")).toDF("k", "v"))
    val delta = incremental.Incremental.differentiate(prev, curr)
    println("DEMO differentiate = " + delta.df.collect().toList)

    // csv source round-trip
    val dir = java.nio.file.Files.createTempDirectory("graft_demo").toString
    Seq((1L, "x")).toDF("k", "s").write.mode("overwrite").option("header", "true").csv(dir)
    println("DEMO csv = " + sources.Sources.csv(spark, dir).collect().toList)

    // SQL front door: views + native function from SQL
    Seq((0L, Array(1f, 0f)), (1L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
      .createOrReplaceTempView("vecs")
    functions.VectorFunctions.register(spark)
    spark.sql("CREATE OR REPLACE TEMP VIEW unit AS SELECT * FROM vecs")
    println("DEMO sql graft_dot = " + spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS n2 FROM unit")
      .collect().toList)

    // key-partitioned incremental state: O(Δ)-step aggregate with retraction
    val st = new incremental.KeyedState(Seq("k"), 4,
      core.ZSetFrame.fromTable(Seq.empty[(Long, Long)].toDF("k", "v")))
    def mx(z: core.ZSetFrame) =
      z.aggregate(Seq($"k"), expandWeights = false, max($"v").as("mx"))
    val d1 = st.aggStep(core.ZSetFrame.fromTable(
      Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v")))(mx)
    val d2 = st.aggStep(core.ZSetFrame.fromDelta(
      Seq((1L, 20L, -1L)).toDF("k", "v", core.ZSetFrame.W)))(mx) // retract max
    println("DEMO keyed agg deltas = " +
      (d1 + d2).consolidate.df.orderBy("k").collect().toList)

    spark.stop()
  }
}
