package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association / co-occurrence analytics over (basket, item) tables —
  * the "bought-together" family: pair supports and lift. Feeds
  * recommendation candidates and, over (document, entity) tables,
  * entity co-occurrence graphs (the q136 triangle input is the same
  * shape).
  */
object AssocOps {

  /** Item-item association lift: for every item pair co-occurring in at
    * least `minCo` baskets, lift = P(a,b) / (P(a)·P(b)) in integer ppm
    * = co·N·1e6 div (c_a·c_b). Lift > 1e6 means the pair co-occurs
    * more than independence predicts — the classic market-basket
    * association signal (Agrawal et al.'s support/confidence family,
    * with lift's symmetry).
    *
    * Scale shape: pairs come from a self-equi-join on the BASKET key,
    * so the stream is Σ|basket|² — bounded by the basket-size cap, not
    * corpus size (baskets larger than `maxBasket` items are dropped as
    * degenerate: a crawl page linking 10⁶ products is list boilerplate,
    * not co-purchase signal — same philosophy as the LSH hot-bucket
    * bound). Supports ride along via two item equi-joins; N enters as
    * an in-plan broadcast 1-row aggregate (the q96 scalar pattern).
    * `minCo` prunes BEFORE the support joins, so the joined stream is
    * already the answer-sized pair set.
    *
    * Long-safe while co·N ≤ 9.2e12 — co ≤ N, so N up to ~3e6 baskets
    * of any size; beyond that scale `lift_ppm` to per-cent.
    *
    * Output: (item_a, item_b, co, c_a, c_b, lift_ppm), item_a < item_b.
    */
  def itemLift(
      baskets: DataFrame, basketCol: String, itemCol: String,
      minCo: Long, maxBasket: Int = 1024): DataFrame = {
    require(minCo >= 1, "minCo must be >= 1")
    val div = graft.functions.GraftColumns.longDiv _
    val op = baskets
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val sized = op.groupBy(col("__b")).agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasket)
    val bounded = op.join(sized.select(col("__b")), Seq("__b"))
    val co = bounded.select(col("__b"), col("__i").as("item_a"))
      .join(bounded.select(col("__b"), col("__i").as("item_b")), Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    val c = bounded.groupBy(col("__i")).agg(count(lit(1)).as("c"))
    val n = bounded.agg(countDistinct(col("__b")).as("__n"))
    co
      .join(c.select(col("__i").as("item_a"), col("c").as("c_a")),
        Seq("item_a"))
      .join(c.select(col("__i").as("item_b"), col("c").as("c_b")),
        Seq("item_b"))
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("co"),
        col("c_a"), col("c_b"),
        div(col("co") * col("__n") * 1000000L, col("c_a") * col("c_b"))
          .as("lift_ppm"))
  }
}
