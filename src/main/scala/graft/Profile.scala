package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (optimization rounds): per-JOB profile of one or more declared
  * queries. Local-mode step-loop queries are BARRIER-floor dominated
  * (~0.2-0.4 s of planning+scheduling per driver-synchronous action), so the
  * figure that decides an optimization is the number of jobs a query
  * launches and where their wall time goes — not per-row CPU. Prints one
  * line per job (start-relative time, duration, description) and a summary
  * (n_jobs, sum of job wall, query wall; the gap is driver-side
  * planning/collect time between jobs). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Seq[Int])]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String, Seq[Int])]()
    // per-stage: (nTasks, task-time-sum-ms, run-time-ms, callsite name)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time,
          Option(js.properties.getProperty("spark.job.description"))
            .orElse(Option(js.properties.getProperty("callSite.short")))
            .getOrElse(""),
          js.stageIds.map(_.toInt)))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc, sids) = jobs.getOrDefault(je.jobId, (je.time, "", Nil))
        done.add((je.jobId, t0, je.time, desc, sids))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.put(si.stageId, (si.numTasks,
          si.taskMetrics.executorRunTime,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.name))
      }
    })
    args.foreach { name =>
      if (name == "canary") {
        val reps = (0 until 5).map(_ => Bench.canaryRep(spark))
        val cpu = Bench.median(reps.map(_._1)); val bar = Bench.median(reps.map(_._2))
        println(f"[profile] canary cpu=$cpu%.3f barrier=$bar%.3f sec=${cpu + bar}%.3f")
      } else {
      val fn = SparkEntry.queries(name)
      // one untimed warmup rep absorbs codegen/parquet-footer costs
      fn(spark, sfDir).count()
      // sweep the warmup rep's pinned debris BEFORE timing (the Bench
      // discipline): leaked pins inflate the timed rep via memory pressure
      graft.incremental.Pinned.sweepSession(spark.sparkContext)
      System.gc()
      Thread.sleep(500) // let queued listener events drain
      done.clear()
      val w0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val rows = done.asScala.toSeq.sortBy(_._2)
      val base = rows.headOption.map(_._2).getOrElse(0L)
      println(s"===== $name =====")
      rows.foreach { case (id, t0, t1, desc, sids) =>
        val st = sids.flatMap(s => Option(stages.get(s)))
        val nt = st.map(_._1).sum
        val taskMs = st.map(_._2).sum
        val stageMs = st.map(_._3).sum
        val where = if (desc.nonEmpty) desc
          else st.map(_._4).filter(_.nonEmpty).distinct.mkString(" | ").take(90)
        println(f"job $id%5d  +${(t0 - base) / 1e3}%8.2fs  ${(t1 - t0) / 1e3}%7.3fs  stages=${st.size}%2d tasks=$nt%3d taskSum=${taskMs / 1e3}%6.2fs stageWall=${stageMs / 1e3}%6.2fs  $where")
      }
      println(f"[profile] $name n_jobs=${rows.size} job_wall=${rows.map(r => r._3 - r._2).sum / 1e3}%.2fs query_wall=$wall%.2fs")
      graft.incremental.Pinned.sweepSession(spark.sparkContext)
      }
    }
    spark.stop()
  }
}
