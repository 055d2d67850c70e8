package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (Deequ-style constraint suites).
  *
  * A check is (name, aggregate-violation-count expression); a suite of
  * checks over one table runs in a SINGLE aggregation pass — one scan,
  * map-side combined, no matter how many checks — then unpivots to one
  * row per check: (check_name, violations, total, passed).
  *
  * At 100 TB this is the shape you want: constraint evaluation rides the
  * same partial-aggregate machinery as any rollup (no per-check scans,
  * no driver-side row inspection). Referential-integrity checks need a
  * second relation, so they run as a LEFT ANTI join counted the same way
  * and union into the report ([[riViolations]]).
  */
object ValidationOps {

  /** violations += 1 where `c` is null. (Coalesced: an EMPTY table has
    * zero violations, not a NULL sum — empty partitions are routine.)
    */
  def notNull(c: Column): Column =
    coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L))

  /** violations += 1 where the predicate FAILS (null counts as fail —
    * SQL three-valued logic would otherwise let nulls slip through).
    */
  def satisfies(pred: Column): Column =
    coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)),
      lit(0L))

  /** violations = rows − distinct keys (0 ⇔ key is unique among
    * non-null keys AND no row has a null key). NULL semantics:
    * `count_distinct` skips rows whose key column(s) are all null, so
    * EVERY null-key row counts as a violation — even a single one.
    * That is the strict reading for a uniqueness check on a key column
    * (a null key can't be proven unique); pair with [[notNull]] when
    * null keys should surface as their own named check instead.
    */
  def unique(cols: Column*): Column =
    count(lit(1)) - count_distinct(cols.head, cols.tail: _*)

  /** Run a suite of aggregate checks in one pass over `df`.
    *
    * Check names are carried as LITERALS (never spliced into SQL text
    * or used as column identifiers), so any string — quotes, spaces,
    * dots — is a valid check name.
    */
  def runChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.zipWithIndex.map { case ((_, c), i) => c.as(s"__v$i") } :+
      count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.zipWithIndex.map { case ((n, _), i) =>
      struct(lit(n).as("check_name"), col(s"__v$i").as("violations"))
    }
    row.select(explode(array(entries: _*)).as("e"),
        col("__total").as("total"))
      .select(col("e.check_name").as("check_name"),
        col("e.violations").as("violations"), col("total"),
        (col("e.violations") === 0L).as("passed"))
  }

  /** Referential integrity: rows of `child` whose `childKey` has no
    * match in `parent.parentKey` (nulls in the child key count as
    * violations — an FK that is null is a missing reference here; model
    * nullable FKs by filtering upstream). One LEFT ANTI join — at scale
    * this is a shuffle (or broadcast, when the parent is a dim) semi
    * structure, never a row-by-row lookup.
    */
  def riViolations(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame =
    // LEFT OUTER against the distinct parent keys keeps child
    // cardinality, so total and violations come from ONE pass (a
    // count() + anti-join spelling would scan the child twice).
    // The parent key is renamed to a reserved name first — with the
    // common FK convention childKey == parentKey, raw column refs
    // would be AMBIGUOUS_REFERENCE across the join.
    child.select(col(childKey).as("__fk"))
      .join(parent.select(col(parentKey).as("__pk")).distinct(),
        col("__fk") === col("__pk"), "left_outer")
      .agg(
        count(lit(1)).as("total"),
        coalesce(sum(when(col("__pk").isNull, 1L).otherwise(0L)),
          lit(0L)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"), col("total"),
        (col("violations") === 0L).as("passed"))
}
