package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Generic fold UDAF — the reference's `Fold` aggregator contract (init,
  * step, merge, output; reference: aggregate/fold.rs:39 and the Aggregator
  * trait at aggregate/mod.rs:75-122) as a typed Spark Aggregator. */
object Fold {

  /** Keep the last N doubles (by arrival order within the sorted group) and
    * finish with their mean — the reference's nexmark q6 "average of last 10"
    * fold (reference: crates/nexmark/src/queries/q6.rs:97-110).
    *
    * SINGLE-PARTITION GROUPS ONLY (code-review r16): merge ranks the
    * incoming buffer's values as newer, so for a group spanning multiple
    * partitions the kept element set depends on Spark's nondeterministic
    * partial-merge order and the mean is not reproducible. That is the
    * reference fold's own arrival-order semantics, which only a
    * single-partition group preserves; use [[LastNAvgBy]] — the
    * order-carrying rendition — for distributed groups (q83 does). */
  class LastNAvg[IN](n: Int, get: IN => Double) extends Aggregator[IN, List[Double], Double] {
    def zero: List[Double] = Nil
    def reduce(b: List[Double], v: IN): List[Double] = (get(v) :: b).take(n)
    def merge(x: List[Double], y: List[Double]): List[Double] = (y ++ x).take(n)
    def finish(b: List[Double]): Double =
      if (b.isEmpty) 0.0 else b.sum / b.size
    def bufferEncoder: Encoder[List[Double]] = Encoders.kryo[List[Double]]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Order-CARRYING last-N mean — the oracle-certifiable rendition of the
    * nexmark q6 fold. The reference's fold sees rows already time-ordered
    * (its VecDeque keeps arrival order, aggregate/fold.rs:39 +
    * nexmark/src/queries/q6.rs:97-110); Spark's shuffle gives no such
    * guarantee, so the ORDER KEY rides in the buffer: each element is
    * ((ordA, ordB), scaledValue), the buffer is the N largest elements by
    * (ordA, ordB) descending, and reduce/merge keep it sorted — a
    * commutative, associative monoid on top-N lists, deterministic under
    * any partitioning or merge order. Values are caller-scaled BIGINTs so
    * the final sum is integer-exact (cross-engine hashable); `finish`
    * returns sum/scale/count as double — one division, engine-identical. */
  class LastNAvgBy[IN](n: Int, scale: Double,
                       ord: IN => (Long, Long), get: IN => Long)
      extends Aggregator[IN, List[(Long, Long, Long)], Double] {
    // TOTAL order including the value: ties on (ordA, ordB) at the top-N
    // truncation boundary would otherwise keep whichever side's element the
    // merge saw first — the merge order is partitioning-dependent, so the
    // monoid claim requires the comparator to break every tie
    private def gt(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && (a._2 > b._2 ||
        (a._2 == b._2 && a._3 > b._3)))
    def zero: List[(Long, Long, Long)] = Nil
    def reduce(b: List[(Long, Long, Long)], v: IN): List[(Long, Long, Long)] = {
      val (oa, ob) = ord(v)
      merge(b, List((oa, ob, get(v))))
    }
    def merge(x: List[(Long, Long, Long)],
              y: List[(Long, Long, Long)]): List[(Long, Long, Long)] = {
      // merge two desc-sorted lists, keep the N largest
      val out = List.newBuilder[(Long, Long, Long)]
      var (a, b, k) = (x, y, 0)
      while (k < n && (a.nonEmpty || b.nonEmpty)) {
        if (b.isEmpty || (a.nonEmpty && gt(a.head, b.head))) {
          out += a.head; a = a.tail
        } else { out += b.head; b = b.tail }
        k += 1
      }
      out.result()
    }
    def finish(b: List[(Long, Long, Long)]): Double =
      if (b.isEmpty) 0.0 else b.map(_._3).sum / scale / b.size
    def bufferEncoder: Encoder[List[(Long, Long, Long)]] =
      Encoders.kryo[List[(Long, Long, Long)]]
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
