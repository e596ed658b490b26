package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType embedding columns (north-star similarity
  * surface, SURVEY.md §2.8 X2). Pure higher-order-function Column
  * expressions: codegen'd, no UDFs, distributed per-row.
  *
  * Elements are float32 in the test tables; every kernel casts to
  * double FIRST (SURVEY.md §7.4) so Spark and the DuckDB oracle do
  * bit-identical IEEE arithmetic in the same left-to-right fold order.
  */
object Vectors {
  private def d(x: Column): Column = x.cast("double")

  /** Dot product via zip_with + sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(Signal.arraySumSq(a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
