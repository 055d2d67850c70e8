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
    val withIds = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(i +: r.toSeq)
    }
    spark.createDataFrame(
      withIds,
      StructType(StructField(idName, LongType, nullable = false) +:
        sorted.schema.fields.toIndexedSeq))
  }
}
