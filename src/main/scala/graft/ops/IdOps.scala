package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Contiguous global id assignment at scale.
  *
  * `row_number() OVER (ORDER BY …)` funnels the whole table through ONE
  * reducer — dead at 100 TB. The scale-safe equivalent: range-partition
  * by the order key, sort within partitions (a global sort with
  * parallel reducers), then add per-partition offsets computed from one
  * count pass (RDD zipWithIndex — the one legitimately RDD-shaped step:
  * it needs partition indices and local positions, which Catalyst does
  * not expose). Ids are dense, 0-based, and equal to the rank in the
  * total order, so the result is oracle-checkable against row_number
  * (q64) while the plan stays multi-reducer.
  *
  * `orderCols` must be a total order (unique key or explicit tiebreak) —
  * otherwise ties make the assignment nondeterministic.
  */
object IdOps {

  def contiguousIds(
      df: DataFrame, idName: String, orderCols: String*): DataFrame = {
    require(orderCols.nonEmpty, "contiguousIds needs an ordering")
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(
        spark.sparkContext.defaultParallelism,
        orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val withIds = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(i +: r.toSeq)
    }
    spark.createDataFrame(
      withIds,
      StructType(StructField(idName, LongType, nullable = false) +:
        sorted.schema.fields.toIndexedSeq))
  }

  /** Sequence packing (the "concatenate, then split every `budget`
    * tokens" step that turns a curated corpus into fixed-length training
    * sequences): gives each document its global token offset in the
    * corpus concatenation ordered by `orderCols`, and the id of the
    * training sequence its first token lands in
    * (`seqIdName = tokenStart div budget`).
    *
    * A `SUM(n) OVER (ORDER BY …)` window is the one-reducer trap again;
    * same cure as [[contiguousIds]]: range-partition by the order key,
    * sort within partitions, ONE small pass for per-partition token
    * totals (collected — #partitions rows), then a partition-local
    * prefix sum seeded with the partition's offset. Offsets are pure
    * arithmetic over the total order, so results are deterministic and
    * oracle-checkable against the window formulation.
    *
    * `tokenCol` must be a non-null LongType column (cast upstream).
    */
  def packIntoSequences(
      df: DataFrame, tokenCol: String, budget: Long,
      offsetName: String, seqIdName: String,
      orderCols: String*): DataFrame = {
    require(orderCols.nonEmpty, "packIntoSequences needs a total order")
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(
        spark.sparkContext.defaultParallelism,
        orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val tokenIdx = sorted.schema.fieldIndex(tokenCol)
    val rdd = sorted.rdd
    // pass 1: per-partition token totals (tiny: one row per partition;
    // the second pass reuses the range shuffle's map outputs, the same
    // two-job profile as zipWithIndex in contiguousIds)
    val partSums = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(tokenIdx))
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    // pass 2: partition-local prefix sum seeded by the global offset
    val withOffsets = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val start = acc
        acc += r.getLong(tokenIdx)
        Row.fromSeq(start +: (start / budget) +: r.toSeq)
      }
    }
    spark.createDataFrame(
      withOffsets,
      StructType(
        StructField(offsetName, LongType, nullable = false) +:
          StructField(seqIdName, LongType, nullable = false) +:
          sorted.schema.fields.toIndexedSeq))
  }

  /** Range-partitioned running sums — the scale-safe replacement for
    * `SUM(x) OVER (ORDER BY …)` when the ordered domain is UNBOUNDED
    * (grows with the corpus: revenue values, merged length histograms).
    * A global ordered window funnels every row through one reducer; this
    * computes the same exact values with parallel reducers: range
    * -partition by the order key, sort within partitions, one tiny pass
    * for per-partition totals (collected — #partitions × k longs), then
    * a partition-local prefix sum seeded with the partition's offsets.
    *
    * Computes k running sums in ONE pass (`valueCols(i)` → `sumNames(i)`).
    * `inclusive = false` gives the exclusive form (sum of strictly
    * -preceding rows). `orderCols` must be a total order; value columns
    * must be non-null LongType (cast upstream).
    */
  def prefixSums(
      df: DataFrame, valueCols: Seq[String], sumNames: Seq[String],
      inclusive: Boolean, orderCols: String*): DataFrame =
    prefixFold(df, valueCols, sumNames, inclusive, 0L, _ + _,
      nullableOut = false, orderCols: _*)

  /** Range-partitioned running MAX — `MAX(x) OVER (ORDER BY …)` without
    * the one-reducer global window (the skyline / best-so-far shape).
    * Same mechanics as [[prefixSums]] with the max monoid; the exclusive
    * form yields NULL on rows with no predecessor (SQL's empty-frame
    * MAX), which is why the output columns are nullable.
    */
  def prefixMaxes(
      df: DataFrame, valueCols: Seq[String], maxNames: Seq[String],
      inclusive: Boolean, orderCols: String*): DataFrame =
    prefixFold(df, valueCols, maxNames, inclusive, Long.MinValue,
      math.max, nullableOut = !inclusive, orderCols: _*)

  private def prefixFold(
      df: DataFrame, valueCols: Seq[String], outNames: Seq[String],
      inclusive: Boolean, zero: Long, op: (Long, Long) => Long,
      nullableOut: Boolean, orderCols: String*): DataFrame = {
    require(orderCols.nonEmpty, "prefix fold needs a total order")
    require(valueCols.nonEmpty && valueCols.length == outNames.length,
      "valueCols and outNames must align")
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(
        spark.sparkContext.defaultParallelism,
        orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val idxs = valueCols.map(sorted.schema.fieldIndex).toArray
    val k = idxs.length
    val rdd = sorted.rdd
    // pass 1: per-partition fold totals (tiny: #partitions × k longs);
    // pass 2 reuses the range shuffle's map outputs (two-job profile,
    // same as contiguousIds/packIntoSequences)
    val partFolds = rdd
      .mapPartitionsWithIndex { (i, it) =>
        val s = Array.fill(k)(zero)
        it.foreach { r =>
          var j = 0
          while (j < k) { s(j) = op(s(j), r.getLong(idxs(j))); j += 1 }
        }
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partFolds.scanLeft(Array.fill(k)(zero)) { (acc, s) =>
      Array.tabulate(k)(j => op(acc(j), s(j)))
    }
    val withFolds = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = offsets(i).clone()
      it.map { r =>
        val out = new Array[Any](k)
        var j = 0
        while (j < k) {
          val v = r.getLong(idxs(j))
          val pre = if (inclusive) op(acc(j), v) else acc(j)
          out(j) = if (nullableOut && pre == zero) null else pre
          acc(j) = op(acc(j), v)
          j += 1
        }
        Row.fromSeq(out.toIndexedSeq ++ r.toSeq)
      }
    }
    spark.createDataFrame(
      withFolds,
      StructType(
        outNames.map(n => StructField(n, LongType, nullable = nullableOut))
          .toIndexedSeq ++ sorted.schema.fields))
  }

  /** Length-bucketed batch assembly (padding-minimizing batching for
    * inference/training): bucket documents by `lenCol div bucketWidth`,
    * order (len, id) within each bucket, and cut batches of `batchSize`
    * documents — similar-length docs batch together, so per-batch
    * padding waste (batch_max − each) stays small.
    *
    * Scale shape: a `row_number() OVER (PARTITION BY bucket)` window
    * sorts each bucket on ONE reducer — a skewed length distribution
    * (most of a web corpus is short) funnels most of the corpus through
    * one task. Instead: ONE global contiguous rank over
    * (bucket, len, id) via [[contiguousIds]] (range-partitioned,
    * multi-reducer), then batch = (rank − bucket's first rank) div
    * batchSize. The bucket-start table is ≤ maxLen/bucketWidth rows —
    * broadcastable by construction. Restricted to a bucket, the global
    * order is exactly (len, id), so the derived batch ids equal the
    * per-bucket row_number formulation (the oracle replays that).
    *
    * Output: input columns + bucketName + batchName.
    */
  def bucketedBatches(
      df: DataFrame, lenCol: String, idCol: String,
      bucketWidth: Long, batchSize: Long,
      bucketName: String, batchName: String): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0,
      "bucketWidth and batchSize must be positive")
    val div = graft.functions.GraftColumns.longDiv _
    val bucketed = df.withColumn(bucketName,
      div(col(lenCol).cast("long"), lit(bucketWidth)))
    val ranked = contiguousIds(
      bucketed, "__rank", bucketName, lenCol, idCol)
    val starts = ranked.groupBy(col(bucketName))
      .agg(min(col("__rank")).as("__b0"))
    ranked
      .join(broadcast(starts), Seq(bucketName))
      .withColumn(batchName,
        div(col("__rank") - col("__b0"), lit(batchSize)))
      .drop("__rank", "__b0")
  }
}
