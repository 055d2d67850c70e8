package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool (not part of the driver contract): run named gates with a
  * SparkListener attached and print one line per Spark JOB (wall time +
  * call site), so driver-sequenced composite gates (CDC ticks, graph
  * loops) show where their seconds actually go. Mirrors Bench's
  * methodology: one untimed warm-up pass, then the profiled pass.
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
    @volatile var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (collecting && s != null) {
          val secs = (System.nanoTime() - s._1) / 1e9
          lines.add(f"    job ${je.jobId}%4d ${secs}%8.3f s  ${s._2}")
        }
      }
    })
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warm
        lines.clear(); collecting = true
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val total = (System.nanoTime() - t0) / 1e9
        collecting = false
        Thread.sleep(200) // let listener drain
        println(f"== $name rows=$n total=$total%.3f s")
        lines.forEach(l => println(l))
      }
    spark.stop()
  }
}
