package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Text

/** Round-9 batch 2: graph micro-structure and embedding compression
  * (SURVEY §2.8 X186-X188) — local clustering coefficients and
  * truncated k-core peeling on the co-order graph, and a
  * Johnson-Lindenstrauss sign-projection with its distortion audit
  * on the embedding table.
  */
object Queries61 {
  import Tables._

  /** q276 — LOCAL CLUSTERING COEFFICIENT HISTOGRAM (X186). Per-node
    * C(u) = 2·T(u)/(deg(u)·(deg(u)−1)) on the min-support-2 co-order
    * graph (Watts & Strogatz 1998) — how clique-like each product's
    * co-purchase neighbourhood is; the per-node refinement of q112's
    * global triangle count. T(u) counts edges among u's neighbours
    * via the same bounded wedge join q112 runs; the coefficient is
    * the EXACT integer floor (2·T·10⁴) div (deg·(deg−1)) (round-9
    * fixed-point convention — no float anywhere), histogrammed in
    * tenths with an exact-decimal mean.
    *
    * Scale: wedge expansion is bounded by the min-support-2 degree
    * (the q243 argument); the histogram is ≤11 rows.
    */
  def q276(s: SparkSession, d: String): DataFrame = {
    val e = Queries40.coOrderEdges(s, d)
    val deg = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // neighbour pairs of u with v < w, closed by an edge v-w
    val wedges = e.select(col("u"), col("v"))
      .join(e.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
    val closed = wedges
      .join(e.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
      .groupBy(col("u")).agg(count(lit(1)).as("t"))
    val coef = deg.filter(col("deg") >= 2)
      .join(closed, Seq("u"), "left")
      .select(col("u"),
        expr("(coalesce(t, 0) * 2 * 10000) div (deg * (deg - 1))")
          .as("coef_e4"))
    val mean = coef.agg(
      round(sum(col("coef_e4").cast("decimal(38,0)")).cast("double") /
        (count(lit(1)) * 10000).cast("double"), 4).as("mean_coef"),
      count(lit(1)).as("n_nodes"))
    coef.groupBy(expr("coef_e4 div 1000").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(mean))
      .select(col("bucket"), col("n"), col("n_nodes"), col("mean_coef"))
      .orderBy(col("bucket"))
  }

  /** q277 — TRUNCATED k-CORE PEELING (X187, 4 fixed rounds, k=2,3).
    * Round r keeps nodes whose degree WITHIN the surviving subgraph
    * is ≥ k (Seidman 1983) — the densest-region extraction behind
    * spam-cluster and community-core mining. Four declared rounds
    * keep the plan static and the oracle unrollable (the q222/q270
    * argument); each round's survivor set is integer-exact, so both
    * engines peel identically. Output: per (k, round) surviving
    * node and edge counts — the convergence profile.
    *
    * Scale: per round ONE semi-join of the edge list against the
    * survivor set + a degree aggregate; survivors only shrink.
    */
  def q277(s: SparkSession, d: String): DataFrame = {
    val e0 = Queries40.coOrderEdges(s, d)
    val out = (2 to 3).map { k =>
      var nodes = e0.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("u"))
      var acc: DataFrame = null
      for (r <- 1 to 4) {
        val e = e0.join(nodes, Seq("u"))
          .join(nodes.select(col("u").as("v")), Seq("v"))
        nodes = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("u"))
          .transform(Materialize.truncate)
        val stats = e.agg(
          countDistinct(col("u")).as("n_nodes_in"),
          (count(lit(1)) / 2).cast("long").as("n_edges_in"))
          .select(lit(k).as("k"), lit(r).as("round"), col("n_nodes_in"),
            col("n_edges_in"))
        acc = if (acc == null) stats else acc.unionByName(stats)
      }
      acc
    }.reduce(_ unionByName _)
    out.orderBy(col("k"), col("round"))
  }

  /** q278 — JL SIGN-PROJECTION DISTORTION AUDIT (X188). Project the
    * 64-dim embeddings to 16 dims with the deterministic ±1 matrix
    * s(d,j) = 1 − 2·(md5(d·127 + j) mod 2) (Achlioptas 2003 — the
    * database-friendly JL construction; md5 is the engine-shared
    * randomness, the q78 convention) and audit the norm distortion
    * ratio |y|²/(16·|x|²) per vector — the compression every ANN
    * index considers before paying full-width distance math.
    * Projections sum in exact decimal; each ratio is one double
    * division 6dp-pinned into decimal, histogrammed in tenths with
    * an exact-decimal mean.
    *
    * Scale: explode is |vecs|·64 rows joined to a broadcast 1024-row
    * sign grid; the per-(vec, j) aggregate is the only shuffle.
    */
  def q278(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 18)
    val xs = embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("vec_id"), col("dim"), col("xf").cast("double").as("x"))
    val dims = xs.select(col("dim")).distinct()
    val grid = dims.crossJoin(
        broadcast(s.range(0, 16).toDF("j")))
      .select(col("dim"), col("j"),
        (lit(1) - lit(2) *
          pmod(Text.md5Long((col("dim") * 127 + col("j")).cast("string")),
            lit(2L))).as("sgn"))
    val y = xs.join(broadcast(grid), Seq("dim"))
      .groupBy(col("vec_id"), col("j"))
      .agg(sum((col("x") * col("sgn")).cast(dec)).cast("double").as("y"))
    val ynorm = y.groupBy(col("vec_id"))
      .agg(sum((col("y") * col("y")).cast(dec)).cast("double").as("ysq"))
    val xnorm = xs.groupBy(col("vec_id"))
      .agg(sum((col("x") * col("x")).cast(dec)).cast("double").as("xsq"))
    val ratios = ynorm.join(xnorm, Seq("vec_id"))
      .select(col("vec_id"),
        round(col("ysq") / (lit(16.0) * col("xsq")), 6)
          .cast("decimal(18,6)").as("ratio"))
    val mean = ratios.agg(
      round(sum(col("ratio")).cast("double") / count(lit(1)), 4)
        .as("mean_ratio"),
      count(lit(1)).as("n_vecs"))
    ratios.groupBy(floor(col("ratio") * 10).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(mean))
      .select(col("bucket"), col("n"), col("n_vecs"), col("mean_ratio"))
      .orderBy(col("bucket"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q276_clustering_coef" -> (q276 _),
    "q277_kcore_peeling" -> (q277 _),
    "q278_jl_projection" -> (q278 _))
}

/** DuckDB mirrors of Queries61 — the q222 edge CTEs, generated
  * peeling unrolls, the same md5 sign grid. The peeling chain and the
  * edge CTEs are `AS MATERIALIZED`: DuckDB 1.0 INLINES multiply-
  * referenced CTEs (auto-materialization arrived later), and the
  * 4-round unroll references each prior round 2-3× — inlined, the
  * heavy lineitem pair join re-expands 2^r times and spills >20 GiB
  * at sf0.1; materialized it runs in 0.4 s. Semantics are identical
  * (plan hint only), and every DuckDB ≥0.9 parses the keyword.
  */
object Oracle61 {

  private val edgeCtes =
    """e0 AS MATERIALIZED (
      |  SELECT DISTINCT a.l_orderkey, a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |ew AS MATERIALIZED (SELECT u, v FROM e0 GROUP BY u, v HAVING count(*) >= 2),
      |ed AS MATERIALIZED (SELECT u, v FROM ew UNION ALL SELECT v, u FROM ew)""".stripMargin

  /** 4-round peeling unroll for one k, textually identical per round
    * (the Oracle40 LPA generation move): n{r} = survivors after round
    * r, er{r} = induced edges of round r.
    */
  private def peelCtes(k: Int): String = {
    val rounds = (1 to 4).map { r =>
      val prev = if (r == 1) s"n0_$k" else s"n${r - 1}_$k"
      s"""er${r}_$k AS MATERIALIZED (SELECT ed.u, ed.v FROM ed
         |  JOIN $prev a ON a.u = ed.u
         |  JOIN $prev b ON b.u = ed.v),
         |n${r}_$k AS MATERIALIZED (SELECT u FROM er${r}_$k GROUP BY u
         |  HAVING count(*) >= $k)""".stripMargin
    }.mkString(",\n")
    s"""n0_$k AS MATERIALIZED (SELECT u FROM ed GROUP BY u HAVING count(*) >= $k),
       |$rounds""".stripMargin
  }

  private def peelRows(k: Int): String =
    (1 to 4).map { r =>
      s"""SELECT $k AS k, $r AS round,
         |  (SELECT count(DISTINCT u) FROM er${r}_$k) AS n_nodes_in,
         |  (SELECT count(*) // 2 FROM er${r}_$k) AS n_edges_in""".stripMargin
    }.mkString("\nUNION ALL\n")

  val sql: Map[String, String] = Map(
    "q276_clustering_coef" ->
      s"""WITH $edgeCtes,
         |deg AS (SELECT u, count(*) AS deg FROM ed GROUP BY u),
         |wed AS (SELECT a.u, a.v, b.v AS w
         |  FROM ed a JOIN ed b ON a.u = b.u AND a.v < b.v),
         |clo AS (SELECT w.u, count(*) AS t
         |  FROM wed w JOIN ed e ON e.u = w.v AND e.v = w.w
         |  GROUP BY w.u),
         |coef AS (SELECT deg.u,
         |    (coalesce(clo.t, 0) * 2 * 10000) // (deg.deg * (deg.deg - 1))
         |      AS coef_e4
         |  FROM deg LEFT JOIN clo ON clo.u = deg.u
         |  WHERE deg.deg >= 2),
         |m AS (SELECT
         |    round(CAST(sum(CAST(coef_e4 AS DECIMAL(38,0))) AS DOUBLE) /
         |      CAST(count(*) * 10000 AS DOUBLE), 4) AS mean_coef,
         |    count(*) AS n_nodes
         |  FROM coef)
         |SELECT coef_e4 // 1000 AS bucket, count(*) AS n,
         |  m.n_nodes, m.mean_coef
         |FROM coef, m GROUP BY 1, 3, 4 ORDER BY bucket""".stripMargin,

    "q277_kcore_peeling" ->
      s"""WITH $edgeCtes,
         |${peelCtes(2)},
         |${peelCtes(3)}
         |${peelRows(2)}
         |UNION ALL
         |${peelRows(3)}
         |ORDER BY k, round""".stripMargin,

    "q278_jl_projection" -> {
      val md5l = "CAST('0x' || substring(md5(CAST(x.dim * 127 + j.j " +
        "AS VARCHAR)), 1, 15) AS BIGINT)"
      s"""WITH x AS (SELECT vec_id, r.i AS dim,
         |    CAST(embedding[CAST(r.i AS INT) + 1] AS DOUBLE) AS x
         |  FROM embeddings,
         |    LATERAL unnest(range(0, len(embedding))) AS r(i)),
         |pj AS (SELECT x.vec_id, j.j,
         |    CAST(sum(CAST(x.x * (1 - 2 * ($md5l % 2))
         |      AS DECIMAL(38,18))) AS DOUBLE) AS y
         |  FROM x CROSS JOIN (SELECT unnest(range(0, 16)) AS j) j
         |  GROUP BY x.vec_id, j.j),
         |yn AS (SELECT vec_id,
         |    CAST(sum(CAST(y * y AS DECIMAL(38,18))) AS DOUBLE) AS ysq
         |  FROM pj GROUP BY vec_id),
         |xn AS (SELECT vec_id,
         |    CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS xsq
         |  FROM x GROUP BY vec_id),
         |rt AS (SELECT yn.vec_id,
         |    CAST(round(ysq / (16.0 * xsq), 6) AS DECIMAL(18,6)) AS ratio
         |  FROM yn JOIN xn USING (vec_id)),
         |m AS (SELECT
         |    round(CAST(sum(ratio) AS DOUBLE) / count(*), 4) AS mean_ratio,
         |    count(*) AS n_vecs
         |  FROM rt)
         |SELECT CAST(floor(ratio * 10) AS BIGINT) AS bucket,
         |  count(*) AS n, m.n_vecs, m.mean_ratio
         |FROM rt, m GROUP BY 1, 3, 4 ORDER BY bucket""".stripMargin
    })
}
