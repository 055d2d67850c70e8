package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev tool (not part of the driver contract): run named gates with a
  * SparkListener attached and print one line per Spark JOB (wall time,
  * stage/task counts, final-stage call site) plus a per-gate rollup of
  * job count, total task run time, GC time and shuffle bytes — the
  * job/task/byte counts are deterministic, so they stay meaningful on
  * a noisy box where wall-clock is ±2x. Mirrors Bench's methodology:
  * one untimed warm-up pass, then the profiled pass.
  *
  * Usage: runMain graft.JobProfile <sfDir> q106,q293
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: JobProfile <sfDir> <namePrefixes>")
    val Array(sfDir, names) = args
    val prefixes = names.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-jobprofile")
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val jobs = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val runMs = new AtomicLong(0)
    val gcMs = new AtomicLong(0)
    val shRead = new AtomicLong(0)
    val shWrite = new AtomicLong(0)
    @volatile var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val t = js.stageInfos.map(_.numTasks).sum
        val site = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
          .getOrElse("?")
        starts.put(js.jobId,
          (System.nanoTime(), s"stages=${js.stageInfos.size} tasks=$t  $site"))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (collecting && s != null) {
          jobs.incrementAndGet()
          val secs = (System.nanoTime() - s._1) / 1e9
          lines.add(f"    job ${je.jobId}%4d ${secs}%8.3f s  ${s._2}")
        }
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (collecting && te.taskMetrics != null) {
          tasks.incrementAndGet()
          runMs.addAndGet(te.taskMetrics.executorRunTime)
          gcMs.addAndGet(te.taskMetrics.jvmGCTime)
          shRead.addAndGet(te.taskMetrics.shuffleReadMetrics.totalBytesRead)
          shWrite.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
          ()
        }
    })
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warm
        lines.clear(); jobs.set(0); tasks.set(0)
        runMs.set(0); gcMs.set(0); shRead.set(0); shWrite.set(0)
        collecting = true
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val total = (System.nanoTime() - t0) / 1e9
        collecting = false
        Thread.sleep(300) // let listener drain
        println(f"== $name rows=$n total=$total%.3f s jobs=${jobs.get} " +
          f"tasks=${tasks.get} taskTime=${runMs.get / 1e3}%.2f s " +
          f"gc=${gcMs.get / 1e3}%.2f s " +
          f"shRead=${shRead.get / 1e6}%.1f MB shWrite=${shWrite.get / 1e6}%.1f MB")
        lines.forEach(l => println(l))
      }
    spark.stop()
  }
}
