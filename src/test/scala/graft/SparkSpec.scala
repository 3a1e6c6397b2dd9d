package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM, one session). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf0001 = "/root/testdata/sf0.001"

  /** Canonical multiset view of a DataFrame for equality checks. */
  def canon(df: DataFrame): Map[String, Int] =
    df.collect().toSeq
      .map(r => r.toSeq.map(v => if (v == null) "NULL" else v.toString).mkString("|"))
      .groupBy(identity).map { case (k, v) => k -> v.size }

  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val (ca, cb) = (canon(a), canon(b))
    assert(ca == cb, s"multisets differ:\n only-left=${(ca.toSet -- cb.toSet).take(5)}\n only-right=${(cb.toSet -- ca.toSet).take(5)}")
  }
}
