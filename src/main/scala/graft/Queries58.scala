package graft

import scala.collection.concurrent.TrieMap
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
    * and q243's Adamic-Adar (local overlap). Every normalization
    * quotient is cast to double for ONE division then 8dp-rounded
    * back into decimal, so the iteration state is bit-identical
    * cross-engine (the q224 convention); fixed iterations keep the
    * plan static and the oracle unrollable (q130/q222 argument).
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
  private val edgeCache = TrieMap.empty[String, DataFrame]
  private def bipartiteEdges(s: SparkSession, d: String): DataFrame = {
    val appId = s.sparkContext.applicationId
    edgeCache.keys.filterNot(_.startsWith(appId + "|")).foreach { k =>
      edgeCache.remove(k).foreach(df =>
        try df.unpersist(blocking = false) catch { case _: Throwable => () })
    }
    edgeCache.getOrElseUpdate(appId + "|" + d, {
      val e = lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      e.count()
      e
    })
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
  private val hitsCache = TrieMap.empty[String, DataFrame]
  private[graft] def authorities(s: SparkSession, d: String): DataFrame = {
    val appId = s.sparkContext.applicationId
    hitsCache.keys.filterNot(_.startsWith(appId + "|")).foreach { k =>
      hitsCache.remove(k).foreach(df =>
        try df.unpersist(blocking = false) catch { case _: Throwable => () })
    }
    hitsCache.getOrElseUpdate(appId + "|" + d, {
      // localCheckpoint, NOT persist, at every level: each level is
      // read twice (its own L1-norm total + the next half-step's
      // join) — without truncation the lazy lineage re-evaluates the
      // chain 2^levels times (measured 3.3-6.9 s), and WITH persist
      // the surviving giant plan makes every later action pay
      // seconds of canonicalized cache lookup (the q250 finding)
      val edges = bipartiteEdges(s, d)
      def l1Norm(df: DataFrame, v: String): DataFrame = {
        val in = df.localCheckpoint()
        val tot = in.agg(sum(col(v)).as("tot"))
        in.crossJoin(broadcast(tot))
          .select(in.columns.filter(_ != v).map(col) :+
            round(col(v).cast("double") / col("tot").cast("double"), 8)
              .cast("decimal(12,8)").as(v): _*)
          .localCheckpoint()
      }
      // h0 = uniform over customers (normalized constant 1)
      val h0 = l1Norm(edges.select(col("c")).distinct()
        .withColumn("h", lit(1L).cast("decimal(12,8)")), "h")
      // a1 ∝ Σ_c h0(c); h1 ∝ Σ_p a1(p); a2 ∝ Σ_c h1(c)
      val a1 = l1Norm(edges.join(h0, Seq("c"))
        .groupBy(col("p")).agg(sum(col("h")).as("a")), "a")
      val h1 = l1Norm(edges.join(a1, Seq("p"))
        .groupBy(col("c")).agg(sum(col("a")).as("h")), "h")
      l1Norm(edges.join(h1, Seq("c"))
        .groupBy(col("p")).agg(sum(col("h")).as("a")), "a")
    })
  }

  def q270(s: SparkSession, d: String): DataFrame =
    authorities(s, d).orderBy(col("a").desc, col("p")).limit(10)
      .select(col("p").as("part"), col("a").as("authority"))

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
        |h0 AS (SELECT c, CAST(round(1.0 / (SELECT tot FROM h0n), 8)
        |    AS DECIMAL(12,8)) AS h FROM h0r),
        |a1r AS (SELECT e.p, sum(h0.h) AS a FROM e JOIN h0 USING (c)
        |  GROUP BY e.p),
        |a1n AS (SELECT sum(a) AS tot FROM a1r),
        |a1 AS (SELECT p, CAST(round(CAST(a AS DOUBLE) /
        |    CAST((SELECT tot FROM a1n) AS DOUBLE), 8) AS DECIMAL(12,8))
        |    AS a FROM a1r),
        |h1r AS (SELECT e.c, sum(a1.a) AS h FROM e JOIN a1 USING (p)
        |  GROUP BY e.c),
        |h1n AS (SELECT sum(h) AS tot FROM h1r),
        |h1 AS (SELECT c, CAST(round(CAST(h AS DOUBLE) /
        |    CAST((SELECT tot FROM h1n) AS DOUBLE), 8) AS DECIMAL(12,8))
        |    AS h FROM h1r),
        |a2r AS (SELECT e.p, sum(h1.h) AS a FROM e JOIN h1 USING (c)
        |  GROUP BY e.p),
        |a2n AS (SELECT sum(a) AS tot FROM a2r),
        |a2 AS (SELECT p, CAST(round(CAST(a AS DOUBLE) /
        |    CAST((SELECT tot FROM a2n) AS DOUBLE), 8) AS DECIMAL(12,8))
        |    AS a FROM a2r)
        |SELECT p AS part, a AS authority FROM a2
        |ORDER BY authority DESC, p LIMIT 10""".stripMargin)
}
