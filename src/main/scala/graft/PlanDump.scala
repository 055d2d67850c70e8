package graft

import java.nio.file.{Files, Paths}

/** Dev tool (not part of the driver contract): write
  * `.explain("formatted")` for named queries to text files, so plan
  * shapes (Exchange count, join strategy, PushedFilters/ReadSchema)
  * can be diffed before/after an optimization and committed as
  * evidence.
  *
  * Usage:
  *   runMain graft.PlanDump <sfDir> <outDir> <tag> q116,q141,...
  * writes <outDir>/<query>_<tag>.txt per matched query (name-prefix
  * match, the SPARK_GRAFT_ONLY convention).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: PlanDump <sfDir> <outDir> <tag> <namePrefixes,comma-sep>")
    val Array(sfDir, outDir, tag, names) = args
    val prefixes = names.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-plandump")
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(
            Paths.get(outDir, s"${name}_$tag.txt"), plan)
          println(s"[plandump] wrote ${name}_$tag.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: $e")
        }
      }
    spark.stop()
  }
}
