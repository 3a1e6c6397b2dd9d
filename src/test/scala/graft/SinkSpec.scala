package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Sources

/** Output codecs/sinks: CSV/JSON encoders roundtrip exactly; the streaming
  * file sink delivers every row exactly once on a bounded feed. */
class SinkSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("name", StringType),
    StructField("v", DoubleType)))

  test("CSV encoder roundtrips values exactly (incl. doubles and quoting)") {
    val df = Seq((1L, "plain", 1.5), (2L, "comma, quoted", 0.1 + 0.2),
      (3L, "uni≈", -1.0e-12)).toDF("k", "name", "v")
    val out = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Sources.writeCsv(df, out)
    val back = spark.read.schema(schema).option("header", "true").csv(out)
    assertSameRows(back, df)
  }

  test("JSON encoder roundtrips values exactly") {
    val df = Seq((1L, "a\"b", 2.75), (2L, null.asInstanceOf[String], 3.0))
      .toDF("k", "name", "v")
    val out = java.nio.file.Files.createTempDirectory("graft_json").toString
    Sources.writeJson(df, out)
    assertSameRows(spark.read.schema(schema).json(out), df)
  }

  test("streaming file sink: bounded feed lands exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Double)]
    val out = java.nio.file.Files.createTempDirectory("graft_ssink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssink_ck").toString
    in.addData((1L, "x", 1.0), (2L, "y", 2.0))
    in.addData((3L, "z", 3.0))
    Sources.streamToFiles(in.toDF().toDF("k", "name", "v"), out, ckpt)
    val back = spark.read.schema(schema).option("header", "true").csv(out)
    assertSameRows(back, Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0))
      .toDF("k", "name", "v"))
  }
}
