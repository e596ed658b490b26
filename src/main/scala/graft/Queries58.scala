package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-8 batch 22: bipartite link analysis (SURVEY §2.8 X180).
  */
object Queries58 {
  import Tables._

  /** q270 — HITS HUBS & AUTHORITIES (X180, 2 fixed iterations).
    * Kleinberg's mutual-reinforcement scores on the DIRECTED
    * customer → part purchase bipartite graph: authority(p) = Σ_c
    * hub(c), hub(c) = Σ_p authority(p), L1-normalized each half-step
    * — "big buyers confer importance on what they buy" — the
    * link-analysis complement to q130's PageRank (flat random walk)
    * and q243's Adamic-Adar (local overlap). Scores are 8dp
    * FIXED-POINT BIGINTs: each L1 normalization is the integer floor
    * (x·10⁸) div Σx — no float division and no round(double,8)
    * anywhere in the iteration (round-of-double inside a compounding
    * recursion proved engine-build-sensitive at the round-8 driver
    * gate, the q237 lesson) — so the state is integer-identical
    * cross-engine; fixed iterations keep the plan static and the
    * oracle unrollable (q130/q222 argument). `authority` is the
    * exact IEEE division a_e8/10⁸.
    *
    * Scale: per half-step ONE aggregate over the distinct (c, p)
    * edge list + a 1-row broadcast norm; scores live on the node
    * tables, never materialized per edge beyond the join.
    */
  /** Distinct (customer, part) edge list, persisted once per
    * (session, sf dir) — each HITS invocation reads it FOUR times
    * (h0 seed + three half-step joins); without materialization the
    * lineitem⋈orders distinct re-ran per reference (measured 3.25 s
    * → the worst query in the 270-query bench).
    */
  private val edgeCache = new SessionCache
  private def bipartiteEdges(s: SparkSession, d: String): DataFrame =
    edgeCache.getOrCompute(s, d) {
      val e = lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      e.count()
      e
    }

  /** The final authority table, materialized once per (session,
    * sf dir). EVERY level is referenced twice (its own L1-norm
    * aggregate + the next half-step's join), so without eager
    * per-level persistence the lazy lineage re-evaluates the chain
    * 2^levels times (measured: 3.3 s with nothing persisted, 6.9 s
    * with only the edges persisted — the blowup, not the edge scan,
    * is the cost; the q222 lpaLabels lesson). Each level is a
    * ≤|nodes|-row table.
    */
  private val hitsCache = new SessionCache
  private[graft] def authorities(s: SparkSession, d: String): DataFrame =
    hitsCache.getOrCompute(s, d) {
      // localCheckpoint, NOT persist, at every level: each level is
      // read twice (its own L1-norm total + the next half-step's
      // join) — without truncation the lazy lineage re-evaluates the
      // chain 2^levels times (measured 3.3-6.9 s), and WITH persist
      // the surviving giant plan makes every later action pay
      // seconds of canonicalized cache lookup (the q250 finding)
      val edges = bipartiteEdges(s, d)
      def l1Norm(df: DataFrame, v: String): DataFrame = {
        val in = Materialize.truncate(df)
        val tot = in.agg(sum(col(v)).as("tot"))
        in.crossJoin(broadcast(tot))
          .select(in.columns.filter(_ != v).map(col) :+
            expr(s"($v * 100000000) div tot").as(v): _*)
          .transform(Materialize.truncate)
      }
      // h0 = uniform over customers (raw weight 1 → e8 div n each)
      val h0 = l1Norm(edges.select(col("c")).distinct()
        .withColumn("h", lit(1L)), "h")
      // a1 ∝ Σ_c h0(c); h1 ∝ Σ_p a1(p); a2 ∝ Σ_c h1(c)
      val a1 = l1Norm(edges.join(h0, Seq("c"))
        .groupBy(col("p")).agg(sum(col("h")).as("a")), "a")
      val h1 = l1Norm(edges.join(a1, Seq("p"))
        .groupBy(col("c")).agg(sum(col("a")).as("h")), "h")
      l1Norm(edges.join(h1, Seq("c"))
        .groupBy(col("p")).agg(sum(col("h")).as("a")), "a")
    }

  def q270(s: SparkSession, d: String): DataFrame =
    authorities(s, d).orderBy(col("a").desc, col("p")).limit(10)
      .select(col("p").as("part"),
        (col("a").cast("double") / lit(100000000L)).as("authority"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q270_hits_authorities" -> (q270 _))
}

/** DuckDB mirror of Queries58 — the same unrolled half-steps with
  * identical 8dp renormalization.
  */
object Oracle58 {

  val sql: Map[String, String] = Map(
    "q270_hits_authorities" ->
      """WITH e AS (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |h0r AS (SELECT DISTINCT c FROM e),
        |h0n AS (SELECT count(*) AS tot FROM h0r),
        |h0 AS (SELECT c, CAST((1 * 100000000) // (SELECT tot FROM h0n)
        |    AS BIGINT) AS h FROM h0r),
        |a1r AS (SELECT e.p, CAST(sum(h0.h) AS BIGINT) AS a
        |  FROM e JOIN h0 USING (c) GROUP BY e.p),
        |a1n AS (SELECT CAST(sum(a) AS BIGINT) AS tot FROM a1r),
        |a1 AS (SELECT p, CAST((a * 100000000) //
        |    (SELECT tot FROM a1n) AS BIGINT) AS a FROM a1r),
        |h1r AS (SELECT e.c, CAST(sum(a1.a) AS BIGINT) AS h
        |  FROM e JOIN a1 USING (p) GROUP BY e.c),
        |h1n AS (SELECT CAST(sum(h) AS BIGINT) AS tot FROM h1r),
        |h1 AS (SELECT c, CAST((h * 100000000) //
        |    (SELECT tot FROM h1n) AS BIGINT) AS h FROM h1r),
        |a2r AS (SELECT e.p, CAST(sum(h1.h) AS BIGINT) AS a
        |  FROM e JOIN h1 USING (c) GROUP BY e.p),
        |a2n AS (SELECT CAST(sum(a) AS BIGINT) AS tot FROM a2r),
        |a2 AS (SELECT p, CAST((a * 100000000) //
        |    (SELECT tot FROM a2n) AS BIGINT) AS a FROM a2r)
        |SELECT p AS part, CAST(a AS DOUBLE) / 100000000 AS authority
        |FROM a2 ORDER BY a DESC, p LIMIT 10""".stripMargin)
}
