package graft

/** DuckDB mirror of q50d — a fixed-iteration POWER METHOD with
  * deflation, written as recursive SQL over the same synthetic 240×6
  * integer-built matrix the Spark side feeds to the PCA kernel.
  *
  * Why this exists: q50's real-data component values cannot carry a
  * SQL oracle (the driver corpus's covariance spectrum is
  * near-degenerate — λ₂/λ₁ = 0.987 — so no fixed iteration count
  * converges; measured round 8). This synthetic matrix has
  * λ₂/λ₁ = 0.167 and λ₃/λ₂ = 0.0037, so 60 iterations converge to
  * ~1e-47 — far past double precision — and the kernel's eigenvector
  * VALUES get a hard DuckDB gate.
  *
  * Mechanics worth noting:
  *  - both engines rebuild the data in exact integer arithmetic from
  *    a row index (no parquet, no RNG to coordinate);
  *  - covariance is the (n−1)-divisor MLlib convention, assembled
  *    from Σxy / column means;
  *  - the three `it{k}` recursive CTEs each run 60 normalized
  *    iterations v ← C·v / ‖C·v‖; deflation subtracts λ·vvᵀ with
  *    λ = vᵀCv before the next component;
  *  - the non-recursive CTEs between iterations are MATERIALIZED —
  *    without that DuckDB re-inlines the upstream chain into every
  *    recursive step and the plan goes exponential (measured: the
  *    un-materialized form does not finish);
  *  - sign rule (largest-|loading| coordinate positive) is applied on
  *    both sides before the 4 dp rounding, because eigenvectors are
  *    defined only up to sign.
  */
object Q50dOracle {

  /** C·v as SQL: row `rv` of the flattened 6×6 matrix `f` dotted with
    * vector `v` (1-based list indexing).
    */
  private def cv(rv: String, f: String, v: String): String =
    s"list_sum(list_transform(range(0,6), c -> $f[CAST($rv*6+c AS INT)+1]" +
      s" * $v[CAST(c AS INT)+1]))"

  /** One normalized power-method step over matrix `f` and vector `v`:
    * list_transform(range, r -> (C·v)ᵣ / ‖C·v‖). The C·v expression is
    * repeated inside the norm (DuckDB lambdas cannot capture a LATERAL
    * alias from the recursive scope); 6×6 re-evaluation is free.
    */
  private def step(f: String, v: String): String =
    s"""list_transform(range(0,6), r -> ${cv("r", f, v)} /
       |      sqrt(list_sum(list_transform(range(0,6), rr ->
       |        ${cv("rr", f, v)} * ${cv("rr", f, v)}))))""".stripMargin

  /** λ = vᵀCv over matrix `f` and unit vector `v`. */
  private def lam(f: String, v: String): String =
    s"list_sum(list_transform(range(0,6), r -> ${cv("r", f, v)}" +
      s" * $v[CAST(r AS INT)+1]))"

  /** Deflation: f′ = f − λ·vvᵀ, flattened. */
  private def deflate(f: String, v: String): String =
    s"""list_transform(range(0,36), p ->
       |    $f[CAST(p AS INT)+1] - ${lam(f, v)}
       |      * $v[CAST(p//6 AS INT)+1] * $v[CAST(p%6 AS INT)+1])""".stripMargin

  val sql: String =
    s"""WITH RECURSIVE
       |u AS (SELECT [3,1,4,1,5,9] AS u1, [-2,7,1,-8,2,8] AS u2,
       |  [1,-6,1,8,0,-3] AS u3),
       |raw AS (
       |  SELECT i, (i*53+7)%101 - 50 AS s1, (i*29+3)%89 - 44 AS s2,
       |    (i*17+5)%61 - 30 AS s3
       |  FROM range(0,240) t(i)),
       |x AS (
       |  SELECT i, CAST(r.j AS INT) AS j,
       |    CAST(4*s1*u1[CAST(r.j AS INT)+1] + 2*s2*u2[CAST(r.j AS INT)+1]
       |       + 1*s3*u3[CAST(r.j AS INT)+1] AS DOUBLE) AS v
       |  FROM raw, u, LATERAL unnest(range(0,6)) r(j)),
       |mu AS (SELECT j, avg(v) AS m FROM x GROUP BY j),
       |cov AS (
       |  SELECT a.j AS r, b.j AS c,
       |    (sum(a.v*b.v) - 240.0*ma.m*mb.m)/239.0 AS cv
       |  FROM x a JOIN x b USING (i)
       |  JOIN mu ma ON ma.j = a.j JOIN mu mb ON mb.j = b.j
       |  GROUP BY a.j, b.j, ma.m, mb.m),
       |cm AS MATERIALIZED (SELECT list(cv ORDER BY r*6 + c) AS f FROM cov),
       |it1 AS (
       |  SELECT 0 AS t, CAST([1,1,1,1,1,1] AS DOUBLE[]) AS v
       |  UNION ALL
       |  SELECT t+1, ${step("f", "v")}
       |  FROM it1, cm WHERE t < 60),
       |v1 AS MATERIALIZED (SELECT v AS v1 FROM it1 WHERE t = 60),
       |d2 AS MATERIALIZED (SELECT ${deflate("f", "v1")} AS f FROM cm, v1),
       |it2 AS (
       |  SELECT 0 AS t, CAST([1,1,1,1,1,1] AS DOUBLE[]) AS v
       |  UNION ALL
       |  SELECT t+1, ${step("f", "v")}
       |  FROM it2, d2 WHERE t < 60),
       |v2 AS MATERIALIZED (SELECT v AS v2 FROM it2 WHERE t = 60),
       |d3 AS MATERIALIZED (SELECT ${deflate("f", "v2")} AS f FROM d2, v2),
       |it3 AS (
       |  SELECT 0 AS t, CAST([1,1,1,1,1,1] AS DOUBLE[]) AS v
       |  UNION ALL
       |  SELECT t+1, ${step("f", "v")}
       |  FROM it3, d3 WHERE t < 60),
       |v3 AS MATERIALIZED (SELECT v AS v3 FROM it3 WHERE t = 60),
       |comps AS (
       |  SELECT 1 AS component, v1 AS v FROM v1
       |  UNION ALL SELECT 2, v2 FROM v2
       |  UNION ALL SELECT 3, v3 FROM v3),
       |signed AS (SELECT component,
       |  CASE WHEN v[list_position(list_transform(v, z -> abs(z)),
       |      list_max(list_transform(v, z -> abs(z))))] < 0
       |    THEN list_transform(v, z -> -z) ELSE v END AS v
       |  FROM comps)
       |SELECT component, CAST(r.j AS INT) AS dim,
       |  round(v[CAST(r.j AS INT)+1], 4) AS loading
       |FROM signed, LATERAL unnest(range(0,6)) r(j)
       |ORDER BY component, dim""".stripMargin
}
