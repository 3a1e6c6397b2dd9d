package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declarative SQL-program runner — the pipeline-manager front door
  * (reference: crates/pipeline_manager/src/compiler.rs:291-333: POST a SQL
  * program → compile → wire source/sink connectors → run) re-expressed on
  * Spark. A program is a single string of `;`-separated statements:
  *
  *   - source binding:  CREATE TEMPORARY VIEW t USING parquet/csv
  *                      OPTIONS (path '...')   — Spark's native declarative
  *                      connector syntax, the analog of the reference's
  *                      `CREATE TABLE ... WITH (connector = ...)`;
  *   - transforms:      CREATE TEMP VIEW ... AS SELECT ... chains;
  *   - sink binding:    INSERT OVERWRITE DIRECTORY '...' USING parquet
  *                      SELECT ...;
  *   - the final statement's result is returned (the output handle).
  *
  * No Scala query body anywhere: the program text IS the pipeline. Every
  * statement goes through `spark.sql`, so Catalyst compiles the whole chain
  * exactly as it does the DataFrame API (pushdown/pruning/broadcast/AQE) —
  * there is no second, weaker execution path to certify. */
object SqlProgram {

  /** Split on top-level semicolons: quotes ('', "", ``) and `--` line
    * comments are respected; a trailing statement needs no `;`. */
  private[graft] def split(program: String): Seq[String] = {
    val stmts = scala.collection.mutable.Buffer[String]()
    val sb = new StringBuilder
    var quote: Char = 0
    var comment = false
    var i = 0
    while (i < program.length) {
      val c = program.charAt(i)
      if (comment) {
        sb += c
        if (c == '\n') comment = false
      } else if (quote != 0) {
        sb += c
        // Spark's default string-literal mode treats \' (and \\) as escapes
        // inside '…'/"…" — consume the escaped char so a \' cannot read as
        // the closing quote (backticks have no escapes)
        if (c == '\\' && quote != '`' && i + 1 < program.length) {
          sb += program.charAt(i + 1)
          i += 1
        } else if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`' => quote = c; sb += c
        case '-' if i + 1 < program.length && program.charAt(i + 1) == '-' =>
          comment = true; sb += c
        case ';' => stmts += sb.toString; sb.clear()
        case _ => sb += c
      }
      i += 1
    }
    stmts += sb.toString
    stmts.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Execute the program's statements in order; returns the LAST one's
    * result DataFrame (the program's declared output). */
  def run(spark: SparkSession, program: String): DataFrame = {
    val stmts = split(program)
    require(stmts.nonEmpty, "graft: empty SQL program")
    stmts.init.foreach(spark.sql(_))
    spark.sql(stmts.last)
  }
}
