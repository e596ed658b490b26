package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 batch 4: tokenizer-construction dynamics and the two
  * remaining built-in file formats (SURVEY §2.8 X192-X194) — one BPE
  * merge step applied corpus-wide, and Avro + XML source round-trips
  * completing the format family (parquet S1, CSV X25, JSONL X26, ORC
  * X60, fixed-width X166).
  */
object Queries63 {
  import Tables._

  /** q282 — BPE MERGE STEP APPLY (X192). The tokenizer-training
    * inner loop, one step, corpus-wide: find the most frequent
    * adjacent character pair over token occurrences (count desc,
    * pair asc — both engines derive the SAME winner), apply the
    * merge everywhere (leftmost non-overlapping replace — identical
    * semantics in JVM `replace` and DuckDB `replace`), and report
    * the corpus delta: total merges performed, affected token
    * occurrences and types, and the exact average symbols-per-token
    * before/after. Merge counts come from integer length deltas
    * (len − len(replaced))/2, never from regex; q164's census
    * measures pair frequencies, this op performs the step they feed.
    *
    * Scale: one token census shuffle; pair counting explodes
    * len−1 substrings per DISTINCT token (frequency-weighted by the
    * census, not by re-scanning the corpus); the merge audit is
    * arithmetic on the census table.
    */
  def q282(s: SparkSession, d: String): DataFrame = {
    // word census from the shared TokenStages arm; materialized
    // (≈|vocab| rows) because its TWO consumers — the pair census and
    // the merge audit — are differently shaped, so the lazy form ran
    // the census twice per execution (the r10 lazy-re-eval rule)
    val words = TokenStages.docToks(s, d)
      .select(explode(col("toks")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .transform(Materialize.truncate)
    val top = words.filter(length(col("w")) >= 2)
      .select(col("w"), col("freq"),
        explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("n_pair"))
      .orderBy(col("n_pair").desc, col("pair"))
      .limit(1)
    val audited = words.crossJoin(broadcast(top))
      .withColumn("n_occ",
        ((length(col("w")) - length(replace(col("w"), col("pair"), lit("")))) /
          2).cast("long"))
    audited.agg(
      max(col("pair")).as("merged_pair"),
      max(col("n_pair")).as("pair_frequency"),
      sum(col("n_occ") * col("freq")).as("total_merges"),
      sum(when(col("n_occ") > 0, col("freq")).otherwise(0L))
        .as("n_tokens_affected"),
      sum(when(col("n_occ") > 0, 1L).otherwise(0L)).as("n_types_affected"),
      round(sum(length(col("w")).cast("long") * col("freq")).cast("double") /
        sum(col("freq")).cast("double"), 4).as("avg_len_before"),
      round(sum((length(col("w")).cast("long") - col("n_occ")) * col("freq"))
        .cast("double") / sum(col("freq")).cast("double"), 4)
        .as("avg_len_after"))
  }

  /** q283 — AVRO SOURCE ROUND-TRIP (X193). Orders exported to Avro
    * (Spark's built-in `avro` format — row-oriented with an embedded
    * writer schema, the Kafka-ecosystem interchange format the
    * reference's JSON envelope would graduate to), re-read, and
    * rolled up to monthly counts + decimal-exact revenue. The oracle
    * computes the same rollup from the ORIGINAL parquet, so the hash
    * match proves export→import is lossless for int64 / double /
    * timestamp-µs — the schema-fidelity claim that matters when a
    * lake zone feeds a schema-registry pipeline.
    *
    * Scale: one write + one scan; the rollup is a calendar-bounded
    * aggregate. Avro is splittable (block-compressed), so the read
    * parallelizes like any file scan.
    */
  def q283(s: SparkSession, d: String): DataFrame = {
    val dir = Tables.scratchDir("avro", d)
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_orderpriority"))
      .write.mode("overwrite")
      // the avro FileFormat class ships inside spark-sql in this build
      // but is NOT service-registered (the shortname resolver points
      // at the external module) — the fully-qualified provider name
      // resolves the class directly
      .format("org.apache.spark.sql.avro.AvroFileFormat")
      .save(s"$dir/orders_avro")
    s.read.format("org.apache.spark.sql.avro.AvroFileFormat")
      .load(s"$dir/orders_avro")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        round(sum(col("o_totalprice").cast("decimal(38,10)")), 4)
          .cast("double").as("revenue"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("n_urgent"))
      .orderBy(col("month"))
  }

  /** q284 — XML SOURCE ROUND-TRIP (X194). The supplier dimension
    * exported as XML (Spark 4's built-in `xml` source, rowTag
    * records — the enterprise B2B/config interchange shape), re-read
    * under an EXPLICIT schema (schema-on-read declared, the S1/X25
    * contract), joined back to nation and rolled up. Oracle from the
    * original parquet: hash parity proves the XML path is lossless
    * for int64 / string payloads including escaping.
    *
    * Scale: dimension-sized by design (XML is a dimension/config
    * format, not a fact format); the rollup joins through the
    * broadcast nation dim.
    */
  def q284(s: SparkSession, d: String): DataFrame = {
    val dir = Tables.scratchDir("xml", d)
    supplier(s, d)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))
      .write.mode("overwrite").format("xml")
      .option("rootTag", "suppliers").option("rowTag", "supplier")
      .save(s"$dir/supplier_xml")
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", LongType),
      StructField("s_acctbal", DoubleType)))
    s.read.format("xml").option("rowTag", "supplier")
      .schema(schema).load(s"$dir/supplier_xml")
      .join(broadcast(nation(s, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        round(sum(col("s_acctbal").cast("decimal(38,10)")), 4)
          .cast("double").as("total_acctbal"),
        min(col("s_name")).as("first_supplier"))
      .orderBy(col("n_name"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q282_bpe_merge_step" -> (q282 _),
    "q283_avro_roundtrip" -> (q283 _),
    "q284_xml_roundtrip" -> (q284 _))
}

/** DuckDB mirrors of Queries63 — the BPE step replayed with identical
  * replace semantics; the format round-trips audited from the
  * ORIGINAL parquet (the q115/q150/q256 convention: a hash match
  * proves losslessness).
  */
object Oracle63 {

  val sql: Map[String, String] = Map(
    "q282_bpe_merge_step" ->
      """WITH wr AS (SELECT unnest(string_split(text, ' ')) AS w
        |    FROM documents),
        |words AS (SELECT w, count(*) AS freq FROM wr
        |  WHERE length(w) > 0 GROUP BY w),
        |pc AS (SELECT p.pair, CAST(sum(freq) AS BIGINT) AS n_pair
        |  FROM words,
        |    LATERAL (SELECT unnest(list_transform(
        |      range(1, length(w)), i -> substring(w, CAST(i AS INT), 2)))
        |      AS pair) p
        |  WHERE length(w) >= 2
        |  GROUP BY p.pair),
        |top AS (SELECT pair, n_pair FROM pc
        |  ORDER BY n_pair DESC, pair LIMIT 1),
        |aud AS (SELECT w, freq,
        |    (length(w) - length(replace(w, top.pair, ''))) // 2 AS n_occ,
        |    top.pair, top.n_pair
        |  FROM words, top)
        |SELECT max(pair) AS merged_pair,
        |  max(n_pair) AS pair_frequency,
        |  CAST(sum(n_occ * freq) AS BIGINT) AS total_merges,
        |  CAST(sum(CASE WHEN n_occ > 0 THEN freq ELSE 0 END) AS BIGINT)
        |    AS n_tokens_affected,
        |  CAST(sum(CASE WHEN n_occ > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_types_affected,
        |  round(CAST(sum(length(w) * freq) AS DOUBLE) /
        |    CAST(sum(freq) AS DOUBLE), 4) AS avg_len_before,
        |  round(CAST(sum((length(w) - n_occ) * freq) AS DOUBLE) /
        |    CAST(sum(freq) AS DOUBLE), 4) AS avg_len_after
        |FROM aud""".stripMargin,

    "q283_avro_roundtrip" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,10))), 4)
        |    AS DOUBLE) AS revenue,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    "q284_xml_roundtrip" ->
      """SELECT n.n_name,
        |  count(*) AS n_suppliers,
        |  CAST(round(sum(CAST(s_acctbal AS DECIMAL(38,10))), 4)
        |    AS DOUBLE) AS total_acctbal,
        |  min(s_name) AS first_supplier
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY n.n_name""".stripMargin)
}
