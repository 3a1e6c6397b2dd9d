package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: run ONE declared query (args: name sfDir [outDir]) — fast
  * iteration without the full Verify sweep; writes parquet + oracle SQL
  * like Verify so tools/check.py can diff a single query. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/vone"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    println(f"[runone] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    SparkEntry.oracleSql.get(name).foreach { sql =>
      def q(s: String): String = "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\r' => "\\r"; case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
      // MERGE with any existing oracle file so successive RunOne calls
      // into the same outDir accumulate and check.py diffs them all
      val p = java.nio.file.Paths.get(s"$outDir/oracle_sql.json")
      val prior = if (java.nio.file.Files.exists(p)) {
        val txt = java.nio.file.Files.readString(p).trim
          .stripPrefix("{").stripSuffix("}").trim
        if (txt.isEmpty) "" else txt + ", "
      } else ""
      java.nio.file.Files.writeString(p, s"{$prior${q(name)}: ${q(sql)}}")
    }
    spark.stop()
  }
}
