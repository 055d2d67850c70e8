package graft
import java.nio.file.{Files, Paths}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(cpus, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    Tables.validate(spark, sfDir) // fail fast on testdata schema drift
    // Warm the session (codegen, shuffle infra, parquet footer cache, JIT)
    // with one untimed pass over every query, then time the steady-state
    // pass. First-execution codegen costs seconds per query shape and would
    // otherwise dominate the sub-second query times at this scale.
    // Dev iteration aids (driver ignores them): SPARK_GRAFT_ONLY=q40,q31
    // restricts to named queries; SPARK_GRAFT_REPS=3 times each query N
    // times and reports the minimum (cuts this box's ±2× timing noise).
    val keep = SparkEntry.onlyFilter()
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => keep(n) }
    ordered.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
    }
    // A failing query is a loud per-query error record, never a fake
    // timing (VERDICT r7 #3): timings and errors are disjoint keys.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = ordered.flatMap { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          errors.getOrElseUpdate(name,
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(3).mkString(" | "))
          None
        }
      }
      if (times.isEmpty) None else Some(name -> times.min)
    }
    def qesc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => qesc(k) + ":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => qesc(k) + ":" + qesc(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}"""
    // stdout is the driver contract, but the driver records only a 2 KB
    // tail — also write the full line as a file artifact (mirrors
    // Verify's _errors.json pattern) so per-query numbers for the whole
    // suite survive machine-readable. Override path via env.
    println(json)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "_bench.json")
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(
        s"[bench] ${errors.size} queries FAILED: " + errors.keys.mkString(", "))
      sys.exit(1)
    }
  }
}
