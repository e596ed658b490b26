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

  /** Dot product — native codegen'd expression (VectorExpressions);
    * same element-cast + left-to-right accumulation as the zip_with +
    * aggregate fold it replaces, so oracle parity is unchanged.
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(VectorExpressions.sumsq(a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
