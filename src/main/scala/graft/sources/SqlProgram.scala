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

  /** Split on top-level semicolons: quotes ('', "", ``), `--` line
    * comments AND `/* … */` bracketed comments are respected (code-review
    * r16: a `;` inside a bracketed comment used to split the program
    * mid-comment); a trailing statement needs no `;`. Bracketed comments
    * NEST, as Spark's lexer accepts (SPARK-28880) — a depth counter, not a
    * boolean, or a top-level `;` after an inner comment-close splits
    * mid-comment (ADVICE r16). Fragments that are COMMENT-ONLY after the last
    * semicolon are dropped — Spark accepts a program ending in `; -- done`,
    * so run() must too. */
  private[graft] def split(program: String): Seq[String] = {
    val stmts = scala.collection.mutable.Buffer[String]()
    val sb = new StringBuilder
    var quote: Char = 0
    var comment = false
    var block = 0 // bracketed-comment nesting depth
    var i = 0
    while (i < program.length) {
      val c = program.charAt(i)
      if (block > 0) {
        sb += c
        if (c == '*' && i + 1 < program.length && program.charAt(i + 1) == '/') {
          sb += '/'; i += 1; block -= 1
        } else if (c == '/' && i + 1 < program.length &&
            program.charAt(i + 1) == '*') {
          sb += '*'; i += 1; block += 1
        }
      } else if (comment) {
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
        case '/' if i + 1 < program.length && program.charAt(i + 1) == '*' =>
          block = 1; sb += c; sb += '*'; i += 1
        case ';' => stmts += sb.toString; sb.clear()
        case _ => sb += c
      }
      i += 1
    }
    stmts += sb.toString
    stmts.map(_.trim).filter(s => s.nonEmpty && !isCommentOnly(s)).toSeq
  }

  /** True when a fragment holds nothing but comments/whitespace (it is not
    * a statement — executing it would be a ParseException Spark itself
    * would not raise on the same program). */
  private def isCommentOnly(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        val nl = s.indexOf('\n', i)
        i = if (nl < 0) s.length else nl + 1
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        // nesting-aware skip (ADVICE r16): scan with a depth counter so an
        // inner */ does not end the outer comment early
        var depth = 1
        var j = i + 2
        while (depth > 0 && j < s.length) {
          if (s.charAt(j) == '*' && j + 1 < s.length && s.charAt(j + 1) == '/') {
            depth -= 1; j += 2
          } else if (s.charAt(j) == '/' && j + 1 < s.length &&
              s.charAt(j + 1) == '*') {
            depth += 1; j += 2
          } else j += 1
        }
        i = if (depth > 0) s.length else j
      } else if (c.isWhitespace) i += 1
      else return false
    }
    true
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
