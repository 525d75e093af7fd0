package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence — the candidate-generation half of frequent
  * itemset mining, and the "items bought together" / "docs cited together"
  * counting primitive. Not in the reference's surface; included because a
  * training-data pipeline uses the same shape for co-occurring entities,
  * tags, and sources.
  */
object Baskets {

  /** Item-pair co-occurrence counts across baskets: for every unordered
    * item pair, in how many baskets both appear. Presence-based — an item
    * repeated within one basket counts once (the distinct-first contract).
    *
    * The quadratic surface is WITHIN a basket: a basket of n items emits
    * n(n−1)/2 pairs, so one mega-basket (a crawler session touching 10⁵
    * docs, a wholesale order) would emit 5·10⁹ rows from a single join
    * key. `maxBasketSize` DROPS oversized baskets entirely — deterministic
    * (a size threshold, not a sample), and the standard practice: a basket
    * that large carries no pairwise signal, only noise mass. Dropped
    * baskets are countable by the caller via a size profile; nothing is
    * silently truncated mid-basket.
    *
    * Scale shape: distinct → size-filter (two keyed aggregates) → one
    * self-equi-join on the basket key whose per-key fan-out is bounded by
    * `maxBasketSize`² → a partial-aggregating pair count. `minCount`
    * floors the hapax-pair tail before the result leaves the aggregate. */
  def basketPairs(df: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Int, minCount: Long = 1L): DataFrame = {
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val items = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val sized = items.groupBy("basket").agg(count(lit(1)).as("_sz"))
      .filter(col("_sz") <= maxBasketSize)
      .select("basket")
    val kept = items.join(sized, "basket")
    val a = kept.select(col("basket"), col("item").as("item_a"))
    val b = kept.select(col("basket"), col("item").as("item_b"))
    a.join(b, Seq("basket"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minCount)
  }
}
