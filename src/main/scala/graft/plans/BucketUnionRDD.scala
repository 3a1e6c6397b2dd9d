package graft.plans

import org.apache.spark.{NarrowDependency, Partition, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow

private[graft] class BucketUnionPartition(
    override val index: Int,
    /** choices(i) = partition indexes to read from parent i (0 or 1 here) */
    val choices: Array[Array[Int]]) extends Partition

/** Multi-parent NARROW union of bucket-aligned segment partitions: output
  * partition j concatenates, from each parent segment, the one physical
  * partition holding bucket j's rows (segments that don't carry bucket j
  * contribute nothing). This is a KeyedState spine read as ONE scan: all
  * of a bucket's spine batches stream through a single task, so the view
  * keeps the segments' key co-location — the property
  * [[BucketClusteredPartitioning]] then declares to Catalyst. (The stock
  * alternatives lose it: `union` of per-segment DataFrames erases
  * partitioning, and `UnionRDD` appends partitions instead of aligning
  * them.) Dependencies are narrow, so no shuffle and full locality; the
  * reference analog is reading one shard's spine batches sequentially
  * (crates/dbsp/src/trace/spine_fueled.rs — a shard's batches live
  * together and merge locally, never across shards). */
private[graft] class BucketUnionRDD(
    @transient private val parents: Seq[RDD[InternalRow]],
    choices: Array[Array[Array[Int]]])
  extends RDD[InternalRow](
    parents.head.sparkContext,
    parents.zipWithIndex.map { case (p, i) =>
      new NarrowDependency[InternalRow](p) {
        override def getParents(partitionId: Int): Seq[Int] =
          choices(partitionId)(i).toSeq
      }
    }) {

  override def getPartitions: Array[Partition] =
    Array.tabulate(choices.length)(j => new BucketUnionPartition(j, choices(j)))

  override def compute(split: Partition, ctx: TaskContext): Iterator[InternalRow] = {
    val bp = split.asInstanceOf[BucketUnionPartition]
    dependencies.iterator.zipWithIndex.flatMap { case (dep, i) =>
      val parent = dep.rdd.asInstanceOf[RDD[InternalRow]]
      bp.choices(i).iterator.flatMap(pi => parent.iterator(parent.partitions(pi), ctx))
    }
  }

  /** Memoized per-split host lists (ADVICE r15): segments are immutable
    * once installed — and this RDD is rebuilt per view, so the cache can
    * never go stale — while the scheduler may consult locations several
    * times per job; without the memo the enumeration cost grew with a
    * bucket's unconsolidated spine depth on every call. */
  @transient private lazy val locCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Seq[String]]()

  override def getPreferredLocations(split: Partition): Seq[String] =
    locCache.computeIfAbsent(split.index, _ => {
      val bp = split.asInstanceOf[BucketUnionPartition]
      // hosts across ALL contributing parents' partitions, most-frequent
      // first (code-review r15): consulting only the FIRST parent with a
      // choice — and only its first partition — gave locality to one spine
      // segment and remote-fetched every other segment's pinned blocks on
      // every read of a multi-segment bucket (and returned Nil outright when
      // that one segment had no locations even if the others did).
      val hosts = dependencies.iterator.zipWithIndex.flatMap { case (dep, i) =>
        val parent = dep.rdd.asInstanceOf[RDD[InternalRow]]
        bp.choices(i).iterator.flatMap(pi =>
          parent.preferredLocations(parent.partitions(pi)))
      }.toSeq
      hosts.groupBy(identity).toSeq.sortBy(-_._2.size).map(_._1)
    })
}
