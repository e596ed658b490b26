package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys at cluster scale (SURVEY.md
  * §7.6 risk 4). AQE's skew-join splitting handles most cases
  * automatically; these are the explicit forms for when the skew is in
  * an AGGREGATION (AQE does not split hot groupBy keys) or when the
  * join strategy must be pinned.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) partials, then
    * combine per key. A key with 10^9 rows becomes `salts` parallel
    * partials instead of one straggler task. Salt is derived from a
    * row-unique column, so it is deterministic (no rand() — replays
    * and retries stay consistent).
    *
    * Returns per-key count, sum, min, max over `valueCol`.
    */
  def saltedStats(df: DataFrame, key: Column, saltSource: Column,
      valueCol: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts.toLong)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("c"), sum(valueCol).as("s"),
        min(valueCol).as("mn"), max(valueCol).as("mx"))
      .groupBy(col("key"))
      .agg(sum(col("c")).as("n"), sum(col("s")).as("sum"),
        min(col("mn")).as("min"), max(col("mx")).as("max"))

  /** Salted equi-join for a skewed fact against a small-ish dim that
    * cannot broadcast: the dim is replicated `salts` times, the fact
    * picks a deterministic salt, and the join key becomes (key, salt)
    * — one hot key spreads over `salts` tasks.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
