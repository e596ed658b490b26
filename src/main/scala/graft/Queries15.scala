package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-6 batch 4: one more columnar source format and the typed
  * Aggregator surface.
  *
  *  - q150 ORC round-trip: the warehouse's other columnar format
  *    (q115/q116's convention — write, read back under an explicit
  *    schema, aggregate; the oracle runs on the ORIGINAL parquet, so
  *    the hash match proves the ORC path lossless, doubles included,
  *    with zero text-format caveats).
  *  - q151 per-group top-k via a typed `Aggregator` with a BOUNDED
  *    buffer (TypedAggs.TopKByLen) — q129's window semantics, but the
  *    shuffle carries at most k pairs per group instead of every
  *    group member. The oracle IS q129's window SQL, so the bounded
  *    fold is hash-proved equivalent to row_number() ≤ k.
  */
object Queries15 {
  import Tables._

  private def rtDir(fmt: String, d: String): String =
    Tables.scratchDir(fmt, d)

  /** q150 — ORC SOURCE. Customers exported to ORC, read back under an
    * explicit StructType (schema-on-read declared, like S1's parquet
    * contract), then the per-segment account rollup. Binary columnar
    * format → doubles round-trip bit-exactly; the decimal-summed
    * total matches the oracle computed on the parquet originals.
    */
  def q150(s: SparkSession, d: String): DataFrame = {
    val dir = rtDir("orc", d)
    customer(s, d).write.mode("overwrite").orc(s"$dir/customer")
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    s.read.schema(schema).orc(s"$dir/customer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal").cast(DecimalType(38, 6))), 4)
          .cast("double").as("total_acctbal"),
        min(col("c_name")).as("first_name"),
        max(col("c_name")).as("last_name"))
      // asc_nulls_last = DuckDB's default NULL ordering
      .orderBy(col("c_mktsegment").asc_nulls_last)
  }

  /** q151 — TYPED-AGGREGATOR TOP-K (bounded-buffer form of q129). */
  def q151(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.TypedAggs
    val ds = documents(s, d)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .as[TypedAggs.DocRow]
    ds.groupByKey(_.lang)
      .agg(new TypedAggs.TopKByLen(3).toColumn.name("top"))
      .toDF("lang", "top")
      .select(col("lang"), posexplode(col("top.items")).as(Seq("pos", "p")))
      .select(col("lang"), col("p._1").as("doc_id"),
        col("p._2").as("n_chars"), (col("pos") + 1).cast("int").as("rnk"))
      // asc_nulls_last: a NULL lang group must sort where the q129
      // oracle's ORDER BY puts it (DuckDB defaults NULLS LAST)
      .orderBy(col("lang").asc_nulls_last, col("rnk"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q150_orc_roundtrip" -> (q150 _),
    "q151_typed_topk" -> (q151 _))
}

object Oracle15 {

  val sql: Map[String, String] = Map(
    // runs on the ORIGINAL parquet — hash parity proves ORC losslessness
    "q150_orc_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(round(SUM(CAST(c_acctbal AS DECIMAL(38,6))), 4) AS DOUBLE)
        |    AS total_acctbal,
        |  min(c_name) AS first_name, max(c_name) AS last_name
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    // q129's window SQL verbatim: the bounded typed fold must equal
    // row_number() <= 3
    "q151_typed_topk" -> Oracle9.sql("q129_group_topk"))
}
