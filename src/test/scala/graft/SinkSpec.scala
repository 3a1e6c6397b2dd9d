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

  test("SqlProgram.split: top-level semicolons only; quotes/comments opaque") {
    import graft.sources.SqlProgram
    val p = """CREATE TEMP VIEW a AS SELECT 'x;y' AS s; -- note; here
              |SELECT "q;ident", `b;t` FROM a;
              |SELECT 1""".stripMargin
    val ss = SqlProgram.split(p)
    assert(ss.size == 3)
    assert(ss(0).contains("'x;y'"))
    // the comment (with its protected ';') opens statement 1
    assert(ss(1).startsWith("-- note; here"))
    assert(ss(1).contains("\"q;ident\"") && ss(1).contains("`b;t`"))
    assert(ss(2) == "SELECT 1")
  }

  test("SqlProgram.split: backslash-escaped quote cannot close a literal") {
    import graft.sources.SqlProgram
    // Spark's default literal mode: \' is an escaped quote INSIDE the
    // string — the ; after it is still quoted, not a separator
    val ss = SqlProgram.split("""SELECT 'a\';b' AS x; SELECT 2""")
    assert(ss.size == 2, ss)
    assert(ss(0) == """SELECT 'a\';b' AS x""")
    assert(ss(1) == "SELECT 2")
    // doubled-quote escape keeps working via close-and-reopen
    val dd = SqlProgram.split("SELECT 'a'';b' AS x; SELECT 2")
    assert(dd.size == 2 && dd(0).contains("'a'';b'"))
  }

  test("SqlProgram.split: bracketed comments are opaque; comment-only fragments drop") {
    import graft.sources.SqlProgram
    // a ; inside /* ... */ must not split (code-review r16)
    val bc = SqlProgram.split("SELECT 1 /* step 1; then read back */; SELECT 2")
    assert(bc.size == 2, bc)
    assert(bc(0) == "SELECT 1 /* step 1; then read back */")
    // a trailing comment-only fragment is NOT a statement — Spark accepts
    // a program ending in '; -- done', so run() must too
    val tc = SqlProgram.split("SELECT 1; -- done")
    assert(tc == Seq("SELECT 1"), tc)
    val tb = SqlProgram.split("SELECT 1; /* done */\n  ")
    assert(tb == Seq("SELECT 1"), tb)
  }

  test("SqlProgram.run: source binding -> view chain -> sink -> read-back") {
    import graft.sources.SqlProgram
    val src = java.nio.file.Files.createTempDirectory("graft_prog_src").toString
    val sink = java.nio.file.Files.createTempDirectory("graft_prog_out").toString
    Seq((1L, 10.0), (1L, 5.0), (2L, 7.0)).toDF("k", "v")
      .write.mode("overwrite").parquet(src)
    val got = SqlProgram.run(spark,
      s"""CREATE OR REPLACE TEMPORARY VIEW prog_src
            USING parquet OPTIONS (path '$src');
          CREATE OR REPLACE TEMPORARY VIEW prog_agg AS
            SELECT k, SUM(v) AS sv FROM prog_src GROUP BY k;
          INSERT OVERWRITE DIRECTORY '$sink' USING parquet
            SELECT k, sv FROM prog_agg;
          SELECT k, sv FROM parquet.`$sink`""")
    assert(got.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set((1L, 15.0), (2L, 7.0)))
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
