package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise market-basket association rules (SURVEY §2.10 widening:
  * the co-occurrence analytics a clickstream/order pipeline runs on
  * the same engine — "customers who bought A also bought B").
  *
  * Pair generation streams `item_a < item_b` pairs out of each
  * basket's sorted distinct item set, so the work is Σ |basket|² over
  * baskets — basket size is the natural bound (orders hold a handful
  * of items), never the item-vocabulary square. Item supports
  * aggregate from the same per-basket sets and broadcast back (items
  * are the bounded vocabulary side).
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
    *
    * One basket-keyed pass serves all three consumers: the sorted
    * DISTINCT item set per basket (collect_set = the distinct
    * (basket, item) table, grouped) feeds pair generation as a
    * codegen'd posexplode + slice stream — each unordered a < b pair
    * exactly once per basket, the same Σ |basket|² bound — instead of
    * a basket-keyed self-join whose probe side broadcast the WHOLE
    * distinct table (unbounded at corpus scale). Item supports and the
    * basket count explode/count the same per-basket sets, so every
    * consumer shares the one basket exchange rather than re-deriving
    * the distinct table from its own scan.
    *
    * Null semantics match the self-join shape it replaces: a NULL
    * basket key never joins itself, so its items pair with nothing
    * (but still count toward item supports), and countDistinct skips
    * the NULL basket; NULL items never satisfy `item_a < item_b` and
    * never match the support join, so they only ever contributed
    * no-op rows.
    */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
                minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val basketItems = baskets
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .groupBy(col("__b"))
      .agg(sort_array(collect_set(col("__i"))).as("__is"))
    val live = basketItems.filter(col("__b").isNotNull)
    val n = live.select(count(lit(1)).as("__n"))
    val itemCounts = basketItems
      .select(explode(col("__is")).as("__i"))
      .groupBy(col("__i"))
      .agg(count(lit(1)).as("__ic"))
    val pairs = live
      .select(col("__is"), posexplode(col("__is")).as(Seq("__p", "item_a")))
      .select(col("item_a"),
        explode(expr("slice(__is, __p + 2, size(__is))")).as("item_b"))
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
