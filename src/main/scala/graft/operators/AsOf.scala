package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — the time-series enrichment the
  * reference's dual-timestamp model implies (SURVEY.md §7.6 stretch):
  * for every left row, the latest right row with
  * `right.ts <= left.ts` (and within `toleranceSec`, if set) per key.
  *
  * Built by COMPOSITION, not a custom physical operator: tag + union
  * both sides, one window per key ordered by (ts, side), carry the
  * last non-null right payload forward, keep left rows. Cost = ONE
  * shuffle on the key (the window partition) — the same exchange a
  * sort-merge join would pay, with no range-explosion. This is the
  * preferred shape at 100 TB: it inherits AQE, spills, and codegen
  * instead of hand-writing a BinaryExecNode.
  */
object AsOf {

  /** @param left        left frame
    * @param right       right frame
    * @param key         equi-key column name (both sides)
    * @param leftTs      left event-time column name
    * @param rightTs     right event-time column name
    * @param rightVals   right payload column names to carry; must not
    *                    collide with left column names
    * @param toleranceSec max allowed |left.ts - right.ts| age; 0 = any
    * @param forward     false (default): latest right at-or-BEFORE
    *                    left.ts; true: earliest right at-or-AFTER
    *                    left.ts (the look-ahead enrichment — next
    *                    maintenance slot, next quote). Same one-shuffle
    *                    window composition, ts ordering reversed.
    *
    * Note: multiple right rows with identical (key, ts) are an
    * undefined-order tie (as in every asof implementation); pre-dedup
    * the right side on (key, ts) if that can occur.
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String],
      toleranceSec: Long = 0L, forward: Boolean = false): DataFrame = {
    val leftCols = left.columns
    // side 0 sorts before side 1 at equal ts → a right row at exactly
    // left.ts matches (asof <= semantics). The whole right row rides
    // in ONE struct so last(..., ignoreNulls) carries it atomically —
    // a matched row with NULL payload fields stays that row's NULLs
    // rather than falling back to older rows' values per-column.
    val rowStruct = (c: Seq[Column]) => struct(c: _*)
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs))
      .withColumn("__r",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("__rts",
            right.schema(rightTs).dataType) +:
            rightVals.map(c => org.apache.spark.sql.types.StructField(
              c, right.schema(c).dataType)))))
      .select(Seq(col("__side"), col("__ts"), col("__r"), col(key)) ++
        leftCols.filterNot(_ == key).map(col): _*)
    val r = right
      .withColumn("__side", lit(0))
      .withColumn("__ts", col(rightTs))
      .withColumn("__r", rowStruct(
        col(rightTs).as("__rts") +: rightVals.map(c => col(c).as(c))))
      .select(Seq(col("__side"), col("__ts"), col("__r"), col(key)) ++
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // ts DESC for forward: walking from the future backward, the last
    // right row seen is the EARLIEST one at-or-after the current left
    // row; __side keeps the equal-ts right row visible in both modes
    val w = Window.partitionBy(col(key))
      .orderBy(if (forward) col("__ts").desc else col("__ts").asc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    val mts = col("__m").getField("__rts")
    val age = if (forward)
      mts.cast("double") - col("__ts").cast("double")
    else col("__ts").cast("double") - mts.cast("double")
    val fresh = if (toleranceSec > 0)
      col("__m").isNotNull && (age <= toleranceSec)
    else col("__m").isNotNull
    carried.filter(col("__side") === 1)
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        Seq(when(fresh, mts).otherwise(lit(null)).as("matched_ts")) ++
        rightVals.map(c =>
          when(fresh, col("__m").getField(c)).otherwise(lit(null)).as(c)): _*)
  }
}
