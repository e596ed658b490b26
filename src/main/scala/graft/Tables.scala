package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver test tables (TESTDATA.md / FIXTURES.md §A).
  *
  * Parquet carries its own schema; we deliberately read it as-is (the
  * files are the schema registry — mirrors the reference's
  * jsonpath-pinned discipline, FeatureEngineeringApproaches.md:134-147)
  * rather than re-declare StructTypes that could drift on timestamp
  * precision (events.ts is ns in parquet, µs in Spark).
  *
  * At 100 TB these would be partitioned-directory datasets; the reader
  * shape (`spark.read.parquet(dir)`) is identical — Catalyst handles
  * partition pruning, filter pushdown, and column pruning on top.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) in parquet, which Spark 4 refuses
    * to read as a timestamp ([PARQUET_TYPE_ILLEGAL]). Read it as a
    * nanos long (legacy flag) and truncate to microseconds — exactly
    * what DuckDB's ns→µs conversion does, so oracle parity holds.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
