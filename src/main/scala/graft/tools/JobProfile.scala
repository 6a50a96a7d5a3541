package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Where does a query's wall time go? Attaches a listener that records
  * every Spark job (duration, description, task count, task time) plus the
  * gaps between jobs (driver-side planning / metadata / commit work), runs
  * the named queries once warm + once measured, and prints a per-query
  * job timeline. The local profiling loop for fixed-cost hunting — not part
  * of the driver contract.
  *
  *   sbt 'runMain graft.tools.JobProfile <sfDir> q1 q2 ...'
  */
object JobProfile {
  final case class JobRec(id: Int, desc: String, start: Long, var end: Long,
      var tasks: Int, var taskTimeMs: Long)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <sfDir> <query>...")
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = GraftSession("job-profile")
    spark.sparkContext.setLogLevel("WARN")
    // A/B experiments: override runtime-settable confs from the env, e.g.
    //   SPARK_GRAFT_CONF="spark.sql.shuffle.partitions=4;spark.foo=bar"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })

    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val rec = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, desc, e.time, e.time, 0, 0L)
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
          j.tasks += 1
          if (e.taskMetrics != null) j.taskTimeMs += e.taskMetrics.executorRunTime
        }
      }
    }
    spark.sparkContext.addSparkListener(rec)

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm pass (untimed)
      spark.catalog.clearCache()
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val t0 = System.currentTimeMillis()
      fn(spark, dir).count()
      val t1 = System.currentTimeMillis()
      spark.catalog.clearCache()
      Thread.sleep(300) // let listener events drain
      jobs.synchronized {
        println(f"== $name total=${(t1 - t0) / 1000.0}%.2fs jobs=${jobs.size}")
        var prevEnd = t0
        var gapSum = 0L
        var jobSum = 0L
        jobs.values.toSeq.sortBy(_.start).foreach { j =>
          val gap = j.start - prevEnd
          if (gap > 0) gapSum += gap
          jobSum += (j.end - j.start)
          val d = if (j.desc.length > 60) j.desc.take(60) else j.desc
          println(f"  job ${j.id}%4d +${(j.start - t0) / 1000.0}%6.2fs dur=${(j.end - j.start) / 1000.0}%6.2fs gapBefore=${math.max(gap, 0) / 1000.0}%5.2fs tasks=${j.tasks}%4d taskTime=${j.taskTimeMs / 1000.0}%7.2fs  $d")
          prevEnd = math.max(prevEnd, j.end)
        }
        val tailGap = t1 - prevEnd
        println(f"  SUM jobs=${jobSum / 1000.0}%.2fs gaps=${gapSum / 1000.0}%.2fs tailGap=${math.max(tailGap, 0) / 1000.0}%.2fs  (wall ${(t1 - t0) / 1000.0}%.2fs)")
      }
    }
    spark.stop()
  }
}
