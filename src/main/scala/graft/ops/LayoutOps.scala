package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan
  * pruning. See functions.ZInterleave for the scale rationale.
  */
object LayoutOps {

  /** Codegen'd Morton key over the low `bits` bits of two long columns. */
  def zValue(a: Column, b: Column, bits: Int): Column =
    graft.functions.GraftColumns.zInterleave(a, b, bits)

  /** HOF reference formulation of the same fold (CodegenFallback —
    * keeps the native expression honest in ZValueSpec; doubles are
    * exact for every intermediate < 2^53, and 2·bits ≤ 62 keeps the
    * result inside that).
    */
  def zValueHof(a: Column, b: Column, bits: Int): Column =
    aggregate(
      sequence(lit(0), lit(bits - 1)), lit(0L),
      (acc, i) => {
        val p = pow(lit(2.0), i)
        val bitA = (floor(a.cast("double") / p).cast("long") % 2) *
          pow(lit(2.0), i * 2).cast("long")
        val bitB = (floor(b.cast("double") / p).cast("long") % 2) *
          pow(lit(2.0), i * 2 + 1).cast("long")
        acc + bitA + bitB
      })

  /** Range-partition and sort a table by its Morton key so file-level
    * min/max statistics become selective on BOTH dimensions — call
    * before a partitioned write (the Z-ORDER OPTIMIZE primitive).
    */
  def zorderBy(
      df: DataFrame, a: String, b: String, bits: Int,
      numFiles: Int): DataFrame =
    df.withColumn("__z", zValue(col(a), col(b), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /** Hive-style partitioned write: one directory per value of
    * `partCol`, repartitioned by it first so each partition directory
    * is written by the tasks that own its rows (without this, every
    * task writes a file into every directory — the small-files
    * explosion: tasks × partitions files).
    *
    * Reads that filter on `partCol` then prune whole directories at
    * planning time (`PartitionFilters` in the scan, no file I/O at
    * all for pruned values) — the coarse-grained complement to
    * zorderBy's file-level min/max pruning. Use for low-cardinality
    * columns only (lang, date, source); high-cardinality partition
    * keys recreate the small-files problem at directory granularity.
    */
  def writePartitioned(
      df: DataFrame, path: String, partCol: String): Unit =
    df.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Small-files compaction (the OPTIMIZE primitive): rewrite a parquet
    * directory into ⌈total_bytes ∕ targetFileBytes⌉ evenly-sized files.
    *
    * A streaming/CDC sink that commits every few seconds strands
    * thousands of KB-sized files per day; every downstream scan then
    * pays one task + one footer read per file. Compaction restores
    * scan-sized files. `repartition(n)` (round-robin shuffle) rather
    * than `coalesce(n)`: coalesce skips the shuffle but glues adjacent
    * input files together, inheriting their skew — compaction's whole
    * point is predictable file sizes. Returns (filesBefore, filesAfter).
    *
    * Writes to `outPath` (never in place — readers of `inPath` are
    * unaffected until the catalog/symlink flips, the standard
    * compact-then-swap protocol).
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetFileBytes: Long): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // never-in-place guard on QUALIFIED Hadoop paths: all IO here goes
    // through the FileSystem API (hdfs://, s3a://, file:), where
    // java.io.File canonicalization is meaningless — two spellings of
    // the same remote dir would both pass a local-File comparison
    val outFs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(
      fs.makeQualified(new org.apache.hadoop.fs.Path(inPath)) !=
        outFs.makeQualified(new org.apache.hadoop.fs.Path(outPath)),
      "compact never rewrites in place — write to a new dir and swap")
    // recursive: partitioned layouts (day=.../part-*.parquet) are the
    // MAIN compaction customer — a top-level listing would see zero
    // bytes and glue everything into one file
    def listParquet(p: String): Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      val buf = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.result()
    }
    val parquetFiles = listParquet(inPath)
    val totalBytes = parquetFiles.map(_.getLen).sum
    val n = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath).repartition(n)
      .write.mode("overwrite").parquet(outPath)
    (parquetFiles.length, listParquet(outPath).length)
  }
}
