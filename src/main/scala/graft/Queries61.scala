package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    * Scale: BOTH peels share one joined edge frame per round —
    * round-r k=3 survivors are a subset of k=2 survivors (stricter
    * threshold, monotone deletion), so the k=3 peel is a boolean
    * flag on the k=2 frame, never a second join. Per round exactly
    * ONE eager job: edge list ⋈ broadcast survivors → per-node
    * degree table, materialized. Survivors AND the round's stats
    * both read that tiny table (n_nodes = its row count, n_edges =
    * Σ deg / 2 by the handshake lemma) — no second pass over edges,
    * no countDistinct expand. The round-9 form ran the
    * join-per-k-per-round = 16 edge-frame executions; this runs 4.
    */
  def q277(s: SparkSession, d: String): DataFrame = {
    val e0 = Queries40.coOrderEdges(s, d)
    var deg: DataFrame = e0.groupBy(col("u"))
      .agg(count(lit(1)).as("d2"), count(lit(1)).as("d3"))
      .transform(Materialize.truncateLazy)
    var acc: DataFrame = null
    for (r <- 1 to 4) {
      // survivors of round r-1: ids + two booleans (<=|parts| rows),
      // broadcast on both endpoints so no round shuffles the edge
      // list (the q222 broadcast-labels convention)
      val nodes = deg.select(col("u"), (col("d2") >= 2).as("in2"),
        (col("d3") >= 3).as("in3"))
      // ONE materialized degree frame per round carries everything:
      // d2/d3 = degree of u within the round's k=2 / k=3 induced
      // subgraph (k=3 edges are a FLAG on the k=2 frame - round-r
      // k=3 survivors are a subset of k=2 survivors: stricter
      // threshold, monotone deletion - never a second join)
      deg = e0.join(broadcast(nodes), Seq("u"))
        .join(broadcast(nodes.select(col("u").as("v"), col("in2").as("i2v"),
          col("in3").as("i3v"))), Seq("v"))
        .filter(col("in2") && col("i2v"))
        .groupBy(col("u")).agg(count(lit(1)).as("d2"),
          sum(when(col("in3") && col("i3v"), lit(1L)).otherwise(lit(0L)))
            .as("d3"))
        .transform(Materialize.truncateLazy)
      // round stats fall out of the degree table: n_nodes = rows with
      // >=1 induced edge (every deg row has d2 >= 1 by construction),
      // n_edges = sum(deg) / 2 (handshake)
      // coalesce: sum() over an empty degree table (every node peeled)
      // is NULL where the oracle's count(*)-based rows give 0
      val stats = deg.agg(
        count(lit(1)).as("nn2"),
        (coalesce(sum(col("d2")), lit(0L)) / 2).cast("long").as("ne2"),
        coalesce(sum(when(col("d3") >= 1, lit(1L)).otherwise(lit(0L))),
          lit(0L)).as("nn3"),
        (coalesce(sum(col("d3")), lit(0L)) / 2).cast("long").as("ne3"))
      val rows = stats.select(explode(array(
        struct(lit(2).as("k"), lit(r).as("round"),
          col("nn2").as("n_nodes_in"), col("ne2").as("n_edges_in")),
        struct(lit(3).as("k"), lit(r).as("round"),
          col("nn3").as("n_nodes_in"), col("ne3").as("n_edges_in"))))
        .as("s"))
        .select(col("s.*"))
      acc = if (acc == null) rows else acc.unionByName(rows)
    }
    acc.orderBy(col("k"), col("round"))
  }

  /** The 16×64 Achlioptas sign grid s(d,j) = 1 − 2·(md5(d·127 + j)
    * mod 2), computed ONCE in Scala and spliced as LITERALS into both
    * engines (the q243/q68 shared-grid convention — md5 here is
    * provenance, not runtime work; no engine evaluates a hash). Keyed
    * [j][dim].
    */
  private[graft] lazy val jlSigns: IndexedSeq[IndexedSeq[Int]] =
    (0 until 16).map { j =>
      (0 until 64).map { dim =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(String.valueOf(dim * 127 + j).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        1 - 2 * (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2).toInt
      }
    }

  /** q278 — JL SIGN-PROJECTION DISTORTION AUDIT (X188). Project the
    * 64-dim embeddings to 16 dims with the deterministic ±1 matrix
    * s(d,j) = 1 − 2·(md5(d·127 + j) mod 2) (Achlioptas 2003 — the
    * database-friendly JL construction; the md5 draw is frozen into
    * the [[jlSigns]] literal grid shared verbatim by both engines)
    * and audit the norm distortion ratio |y|²/(16·|x|²) per vector —
    * the compression every ANN index considers before paying
    * full-width distance math. The projection and both norms are ONE
    * native [[graft.functions.VectorExpressions.JlAudit]] kernel per
    * row in exact floor(v·1eN)-BIGINT fixed point (the round-8
    * engine-build-proof convention): y_e12(j) = Σ floor(x·s·1e12),
    * ysq_e8 = Σ floor(y²·1e8), xsq_e8 = Σ floor(x²·1e8) — all longs,
    * so the DuckDB row-wise replay is BIT-EXACT. Zero shuffles before
    * the ≤20-row histogram aggregate (round-9 posexploded 64× through
    * two exchanges — the r9 verdict's scale-killer; an interpreted
    * HOF-fold rewrite measured 1.4 s of lambda boxing — the kernel is
    * a tight primitive loop). Zero-norm vectors are excluded on BOTH
    * engines (Spark divides to NULL where DuckDB gives inf — the q246
    * zero-variance convention). Each ratio is one double division
    * 6dp-pinned into decimal, histogrammed in tenths with an
    * exact-decimal mean.
    *
    * Scale: one scan, no exchange until the final tiny aggregates —
    * at 100 TB the projection cost is the scan itself.
    */
  def q278(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorExpressions
    val ratios = embeddings(s, d)
      .select(col("vec_id"),
        VectorExpressions.jl_audit(col("embedding"), jlSigns).as("a"))
      .select(col("vec_id"), col("a.ysq_e8").as("ysq_e8"),
        col("a.xsq_e8").as("xsq_e8"))
      .filter(col("xsq_e8") > 0)
      .select(col("vec_id"),
        round(col("ysq_e8").cast("double") /
          (lit(16.0) * col("xsq_e8").cast("double")), 6)
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
      // the SAME Scala-computed sign literals the JlAudit kernel
      // inlines (the q243 VALUES-grid convention): 1,024 (dim, j,
      // sgn) rows. Every accumulated value is a floor(v·1eN) BIGINT
      // over IEEE-identical doubles, so this row-wise replay matches
      // the Spark kernel bit-for-bit on any engine build.
      val grid = (for (dim <- 0 until 64; j <- 0 until 16)
        yield s"($dim,$j,${Queries61.jlSigns(j)(dim)})").mkString(",")
      s"""WITH sg(dim, j, sgn) AS (VALUES $grid),
         |x AS (SELECT vec_id, r.i AS dim,
         |    CAST(embedding[CAST(r.i AS INT) + 1] AS DOUBLE) AS x
         |  FROM embeddings,
         |    LATERAL unnest(range(0, len(embedding))) AS r(i)),
         |pj AS (SELECT x.vec_id, sg.j,
         |    sum(CAST(floor(x.x * sg.sgn * 1e12) AS BIGINT)) AS y_e12
         |  FROM x JOIN sg ON sg.dim = x.dim
         |  GROUP BY x.vec_id, sg.j),
         |yn AS (SELECT vec_id,
         |    sum(CAST(floor((CAST(y_e12 AS DOUBLE) / 1e12) *
         |      (CAST(y_e12 AS DOUBLE) / 1e12) * 1e8) AS BIGINT))
         |      AS ysq_e8
         |  FROM pj GROUP BY vec_id),
         |xn AS (SELECT vec_id,
         |    sum(CAST(floor(x * x * 1e8) AS BIGINT)) AS xsq_e8
         |  FROM x GROUP BY vec_id),
         |rt AS (SELECT yn.vec_id,
         |    CAST(round(CAST(ysq_e8 AS DOUBLE) /
         |      (16.0 * CAST(xsq_e8 AS DOUBLE)), 6) AS DECIMAL(18,6))
         |      AS ratio
         |  FROM yn JOIN xn USING (vec_id) WHERE xn.xsq_e8 > 0),
         |m AS (SELECT
         |    round(CAST(sum(ratio) AS DOUBLE) / count(*), 4) AS mean_ratio,
         |    count(*) AS n_vecs
         |  FROM rt)
         |SELECT CAST(floor(ratio * 10) AS BIGINT) AS bucket,
         |  count(*) AS n, m.n_vecs, m.mean_ratio
         |FROM rt, m GROUP BY 1, 3, 4 ORDER BY bucket""".stripMargin
    })
}
