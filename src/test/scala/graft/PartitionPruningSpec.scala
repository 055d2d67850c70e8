package graft

import org.apache.spark.sql.functions._

/** Partitioned-layout plan properties: a date/source-partitioned lake
  * layout must prune partitions at planning time — at 100 TB the
  * difference between scanning one day and scanning the corpus.
  */
class PartitionPruningSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = java.nio.file.Files
    .createTempDirectory("graft_part").toString

  private lazy val setup: Unit = {
    Tables.load(spark, sfDir, "events")
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day", "event_type")
      .parquet(dir)
  }

  test("equality filters on partition columns prune to matching dirs") {
    setup
    val q = spark.read.parquet(dir)
      .filter($"day" === "2024-01-05" && $"event_type" === "click")
      .select($"event_id")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters:"), scan)
    assert(scan.contains("isnotnull(day"), scan)
    // data filters must NOT appear: both predicates resolve at the
    // partition level, nothing is re-checked per row
    assert(!scan.contains("PushedFilters: [IsNotNull"), scan)
    // and the result matches the unpartitioned scan
    val expected = Tables.load(spark, sfDir, "events")
      .filter(date_format($"ts", "yyyy-MM-dd") === "2024-01-05" &&
        $"event_type" === "click")
      .count()
    assert(q.count() === expected && expected > 0)
  }

  test("range filter on the partition column prunes too (dynamic day range)") {
    setup
    val q = spark.read.parquet(dir)
      .filter($"day" >= "2024-01-28")
      .groupBy($"day").agg(count(lit(1)).as("n"))
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters:") &&
      scan.contains("(day"), scan)
    val got = q.select($"day").as[String].collect().toSet
    assert(got.nonEmpty && got.forall(_ >= "2024-01-28"), got)
  }

  test("compact: many small files rewritten into byte-targeted evenly-" +
       "sized files; content identical; never fewer than 1 file") {
    import graft.ops.LayoutOps
    val smallDir = java.nio.file.Files
      .createTempDirectory("graft_small").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_compact").toString + "/out"
    val src = Tables.load(spark, sfDir, "orders")
    src.repartition(64).write.mode("overwrite").parquet(smallDir)
    val fs = new org.apache.hadoop.fs.Path(smallDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs
      .listStatus(new org.apache.hadoop.fs.Path(smallDir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    // target ~quarter of the data per file → expect ~4 output files
    val (before, after) =
      LayoutOps.compact(spark, smallDir, outDir, totalBytes / 4 + 1)
    assert(before === 64)
    assert(after >= 1 && after <= 8, s"got $after files")
    assert(after < before)
    // content survives the rewrite exactly
    val a = spark.read.parquet(smallDir).orderBy("o_orderkey").collect()
    val b = spark.read.parquet(outDir).orderBy("o_orderkey").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // degenerate: huge target still yields one file
    val outDir2 = outDir + "2"
    val (_, one) = LayoutOps.compact(spark, smallDir, outDir2, Long.MaxValue)
    assert(one === 1)
    // never-in-place guard compares QUALIFIED Hadoop paths, so scheme'd
    // or differently-spelled aliases of the same dir are caught too
    for (alias <- Seq(smallDir, s"file:$smallDir", smallDir + "/."))
      intercept[IllegalArgumentException] {
        LayoutOps.compact(spark, smallDir, alias, 1024L)
      }
  }
}
