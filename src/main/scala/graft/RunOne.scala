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
    // dev-loop timing mode: a comma-separated name list runs each query
    // SPARK_GRAFT_RUNONE_REPS times (count(), no parquet write) in THIS
    // warm JVM — cold-JVM single-query times are JIT/planning-dominated
    // and not comparable to the bench's warm medians
    if (name.contains(',')) {
      val reps = sys.env.getOrElse("SPARK_GRAFT_RUNONE_REPS", "2").toInt
      name.split(',').map(_.trim).filter(_.nonEmpty).foreach { n =>
        val times = (1 to reps).map { _ =>
          val s0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir).count()
          val dt = (System.nanoTime() - s0) / 1e9
          graft.incremental.Pinned.sweepSession(spark.sparkContext)
          dt
        }
        println(f"[runone] $n: " + times.map(t => f"$t%.2f").mkString(" ") + " s")
      }
      spark.stop()
      return
    }
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
      // into the same outDir accumulate and check.py diffs them all;
      // REPLACE any prior entry for this name (duplicate JSON keys are
      // parser-dependent — re-running a query must update, not append)
      val p = java.nio.file.Paths.get(s"$outDir/oracle_sql.json")
      val prior: Seq[String] = if (java.nio.file.Files.exists(p)) {
        val txt = java.nio.file.Files.readString(p).trim
          .stripPrefix("{").stripSuffix("}")
        // split on top-level commas only (commas inside the escaped SQL
        // strings don't separate entries)
        val parts = scala.collection.mutable.Buffer[String]()
        val sb = new StringBuilder
        var inStr = false
        var esc = false
        txt.foreach { c =>
          if (esc) { sb += c; esc = false }
          else if (inStr && c == '\\') { sb += c; esc = true }
          else if (c == '"') { sb += c; inStr = !inStr }
          else if (c == ',' && !inStr) { parts += sb.toString; sb.clear() }
          else sb += c
        }
        parts += sb.toString
        parts.map(_.trim).filter(_.nonEmpty).toSeq
      } else Seq.empty
      val kept = prior.filterNot(_.startsWith(q(name) + ":"))
      java.nio.file.Files.writeString(p,
        (kept :+ s"${q(name)}: ${q(sql)}").mkString("{", ", ", "}"))
    }
    spark.stop()
  }
}
