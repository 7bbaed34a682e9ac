package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise market-basket association rules (SURVEY §2.10 widening:
  * the co-occurrence analytics a clickstream/order pipeline runs on
  * the same engine — "customers who bought A also bought B").
  *
  * Pair generation is a self-join of the DISTINCT (basket, item)
  * table on the basket key with `item_a < item_b`, so the work is
  * Σ |basket|² over baskets — basket size is the natural bound (orders
  * hold a handful of items), never the item-vocabulary square. Item
  * supports aggregate separately and broadcast back (items are the
  * bounded vocabulary side).
  */
object MarketBasket {

  /** Association metrics for every item pair co-occurring in at least
    * `minCount` baskets: support (pair frequency over baskets),
    * confidence(a→b) = supp(ab)/supp(a), and lift =
    * supp(ab)/(supp(a)·supp(b)) — lift > 1 is genuine affinity, lift
    * ≈ 1 is coincidence of two popular items.
    *
    * Output: (item_a, item_b, n_baskets, support, confidence, lift),
    * metrics rounded to 6.
    */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
                minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val items = baskets
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val n = items.select(countDistinct(col("__b")).as("__n"))
    val itemCounts = items.groupBy(col("__i"))
      .agg(count(lit(1)).as("__ic"))
    val pairs = items.select(col("__b"), col("__i").as("item_a"))
      .join(items.select(col("__b"), col("__i").as("item_b")), Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minCount)
    pairs
      .join(broadcast(itemCounts.select(col("__i").as("item_a"),
        col("__ic").as("__ca"))), Seq("item_a"))
      .join(broadcast(itemCounts.select(col("__i").as("item_b"),
        col("__ic").as("__cb"))), Seq("item_b"))
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("n_baskets"),
        round(col("n_baskets") / col("__n").cast("double"), 6).as("support"),
        round(col("n_baskets") / col("__ca").cast("double"), 6).as("confidence"),
        round(col("n_baskets").cast("double") * col("__n") /
          (col("__ca") * col("__cb")), 6).as("lift"))
  }
}
