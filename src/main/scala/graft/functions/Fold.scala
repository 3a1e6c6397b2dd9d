package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Generic fold UDAF — the reference's `Fold` aggregator contract (init,
  * step, merge, output; reference: aggregate/fold.rs:39 and the Aggregator
  * trait at aggregate/mod.rs:75-122) as a typed Spark Aggregator. */
object Fold {

  /** Keep the last N doubles (by arrival order within the sorted group) and
    * finish with their mean — the reference's nexmark q6 "average of last 10"
    * fold (reference: crates/nexmark/src/queries/q6.rs:97-110). */
  class LastNAvg[IN](n: Int, get: IN => Double) extends Aggregator[IN, List[Double], Double] {
    def zero: List[Double] = Nil
    def reduce(b: List[Double], v: IN): List[Double] = (get(v) :: b).take(n)
    def merge(x: List[Double], y: List[Double]): List[Double] = (y ++ x).take(n)
    def finish(b: List[Double]): Double =
      if (b.isEmpty) 0.0 else b.sum / b.size
    def bufferEncoder: Encoder[List[Double]] = Encoders.kryo[List[Double]]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Weighted sum fold: Σ value·weight — the linear-aggregate building block
    * (reference: aggregate/mod.rs:287 weigh) as a typed Aggregator. */
  val weightedSum: Aggregator[(Long, Long), Long, Long] =
    new Aggregator[(Long, Long), Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, v: (Long, Long)): Long = b + v._1 * v._2
      def merge(x: Long, y: Long): Long = x + y
      def finish(b: Long): Long = b
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
}
