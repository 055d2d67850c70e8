package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize larger scale factors from an existing testdata dir for
  * the LOCAL scaling audit (measured scaling curves instead of
  * argued-from-plan claims): `runMain graft.ScaleData <src> <out> <R>`
  * writes all ten conformance tables with the corpus replicated R×
  * under the ISOMORPHIC-DOMAIN model —
  *
  *  - scaling keys shift by `replica · 1e8` with referential integrity
  *    preserved (orders follow customers, lineitems follow all three
  *    fact keys, events follow users); fixed dims (region, nation)
  *    copy once, as in TPC-H;
  *  - `documents`: replica r&gt;0 suffixes every whitespace token with
  *    a replica marker — a token BIJECTION preserves every
  *    within-replica shingle/posting/dup structure exactly while
  *    keeping cross-replica vocabulary disjoint, so dup clusters
  *    multiply in COUNT, never in size;
  *  - `embeddings`: replica r&gt;0 multiplies a deterministic
  *    per-replica ±1 sign pattern into every vector — within-replica
  *    dot products and cosines are BIT-IDENTICAL (the signs square
  *    away), cross-replica similarities scramble.
  *
  * Result: an R× corpus carries R× the entities and R× the structure,
  * never R² — so a measured per-gate scaling exponent is attributable
  * to the ENGINE's plan, not to synthetic cluster inflation (naive
  * exact replication would square every dup-cluster and
  * nearest-neighbor readout and poison the exponents).
  */
object ScaleData {

  /** Key shift per replica — far above any sf0.1 key domain. */
  private val Off = 100000000L

  def main(args: Array[String]): Unit = {
    val Array(src, out, repsS) = args
    val reps = repsS.toInt
    require(reps >= 1 && reps <= 16, "replicas in [1, 16]")
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-scale")
    spark.sparkContext.setLogLevel("WARN")
    // keep the physical ts encoding the loaders already normalize
    spark.conf.set(
      "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    Tables.validate(spark, src)
    write(spark, src, out, reps)
    spark.stop()
  }

  def write(
      spark: SparkSession, src: String, out: String, reps: Int): Unit = {
    def t(n: String) = Tables.load(spark, src, n)
    def shifted(df: DataFrame, r: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, k) =>
        d.withColumn(k, col(k) + lit(r * Off)))
    def replicate(
        name: String, df: DataFrame,
        f: (DataFrame, Int) => DataFrame): Unit =
      (0 until reps).map(r => f(df, r)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")

    Seq("region", "nation").foreach { n => // fixed dims: copy once
      t(n).write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    replicate("customer", t("customer"),
      (d, r) => shifted(d, r, "c_custkey"))
    replicate("supplier", t("supplier"),
      (d, r) => shifted(d, r, "s_suppkey"))
    replicate("part", t("part"), (d, r) => shifted(d, r, "p_partkey"))
    replicate("orders", t("orders"),
      (d, r) => shifted(d, r, "o_orderkey", "o_custkey"))
    replicate("lineitem", t("lineitem"),
      (d, r) => shifted(d, r, "l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", t("events"),
      (d, r) => shifted(d, r, "event_id", "user_id"))
    replicate("documents", t("documents"), { (d, r) =>
      val d2 = shifted(d, r, "doc_id")
      if (r == 0) d2
      else d2
        .withColumn("text",
          array_join(transform(split(col("text"), "\\s+"),
            tk => concat(tk, lit(s"·r$r"))), " "))
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    replicate("embeddings", t("embeddings"), { (d, r) =>
      val d2 = shifted(d, r, "vec_id")
      if (r == 0) d2
      else d2.withColumn("embedding",
        zip_with(
          col("embedding"),
          transform(sequence(lit(0), size(col("embedding")) - 1),
            i => when(pmod(hash(i, lit(r)), lit(2)) === 0,
              lit(1.0f)).otherwise(lit(-1.0f))),
          (x, s) => (x * s).cast("float")))
    })
  }
}
