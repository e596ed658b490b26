package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-8 batch 16: network mixing structure, ranking-quality
  * evaluation, and robust two-way decomposition
  * (SURVEY §2.8 X163-X165).
  */
object Queries52 {
  import Tables._

  /** q253 — DEGREE ASSORTATIVITY (X163). Pearson correlation of
    * endpoint degrees over the directed edge list of the
    * min-support-2 co-order graph (Newman 2002) — one number that
    * says whether hubs co-purchase with hubs (assortative, r > 0) or
    * with the periphery (disassortative, r < 0); the mixing-structure
    * complement to q210's degree distribution on the dedup graph.
    * All five moments are EXACT decimal(38,0) sums of integer degree
    * products; r is one float expression at the end.
    *
    * Scale: reuses the persisted q222 edge list; the degree table is
    * |parts|-bounded and broadcast twice (u side, v side); one
    * 5-moment aggregate.
    */
  def q253(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val e = Queries40.coOrderEdges(s, d)
    val deg = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val du = deg.select(col("u"), col("deg").as("du"))
    val dv = deg.select(col("u").as("v"), col("deg").as("dv"))
    val m = e.join(broadcast(du), Seq("u")).join(broadcast(dv), Seq("v"))
      .agg(count(lit(1)).as("m"),
        sum(col("du").cast(dec)).as("sdu"),
        sum(col("dv").cast(dec)).as("sdv"),
        sum((col("du") * col("dv")).cast(dec)).as("sduv"),
        sum((col("du") * col("du")).cast(dec)).as("sduu"),
        sum((col("dv") * col("dv")).cast(dec)).as("sdvv"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    m.crossJoin(broadcast(nNodes))
      .select(col("n_nodes"), expr("m div 2").as("n_edges"),
        round((col("m").cast("double") * col("sduv").cast("double") -
          col("sdu").cast("double") * col("sdv").cast("double")) /
          (sqrt(col("m").cast("double") * col("sduu").cast("double") -
            col("sdu").cast("double") * col("sdu").cast("double")) *
           sqrt(col("m").cast("double") * col("sdvv").cast("double") -
             col("sdv").cast("double") * col("sdv").cast("double"))), 4)
          .as("assortativity"))
      .withColumn("verdict",
        when(col("assortativity") > 0.05, "assortative")
          .when(col("assortativity") < -0.05, "disassortative")
          .otherwise("neutral"))
  }

  /** q254 — NDCG@10 RANKING EVALUATION (X164). Normalized discounted
    * cumulative gain of the BM25 lexical ranking (q131's top-20,
    * truncated to 10) against graded relevance defined by the cosine
    * arm (q29's top-10: rel = 11 − cosine-rank, 0 otherwise) —
    * the standard ranking-quality metric (Järvelin & Kekäläinen
    * 2002) completing the eval family (q213 AUC, q214 lift, q187
    * confusion, q199 recall). The position discounts 1/log₂(pos+1)
    * are a Scala-computed LITERAL e6 grid shared with the oracle
    * (the q68/q243 move — log₂ is a libm call that diverged across
    * DuckDB builds at the round-8 driver gate), gains rel·ilog_e6
    * and DCG sum as exact BIGINTs, IDCG is a Scala-folded constant,
    * and NDCG is the integer floor (dcg_e6·10⁴) div idcg_e6 — the
    * whole metric is float-free until the final exact e-scale →
    * double divisions.
    *
    * Scale: both arms are independently gate-checked TakeOrdered
    * lists; the eval is 10-row broadcast algebra.
    */
  /** ⌊round(10⁶/log₂(p+1))⌉ for p = 1..10 — one Scala computation
    * feeds both engines.
    */
  private[graft] val ndcgIlogE6: IndexedSeq[Long] =
    (1 to 10).map(p =>
      BigDecimal(math.log(2.0) / math.log(p + 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLongExact)

  /** IDCG@10 at the e6 scale for the graded ladder rel = 11−j. */
  private[graft] val ndcgIdcgE6: Long =
    (1 to 10).map(j => (11 - j) * ndcgIlogE6(j - 1)).sum

  def q254(s: SparkSession, d: String): DataFrame = {
    val sys = Queries10.bm25Top20Cached(s, d)
      .withColumn("pos", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))))
      .filter(col("pos") <= 10)
      .select(col("doc_id"), col("pos"))
    val truth = Queries.q29(s, d)
      .withColumn("crank", row_number().over(
        Window.orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("crank") <= 10)
      .select(col("vec_id").as("doc_id"), (lit(11) - col("crank")).as("rel"))
    val ilog = (1 to 10).foldLeft(lit(0L)) { (acc, p) =>
      when(col("pos") === p, lit(ndcgIlogE6(p - 1))).otherwise(acc)
    }
    val gains = sys.join(broadcast(truth), Seq("doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
      .withColumn("gain_e6", col("rel").cast("long") * ilog)
    val dcg = gains.agg(sum(col("gain_e6")).as("dcg_e6"),
      sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_overlap"))
    gains.select(col("pos"), col("doc_id"), col("rel"), col("gain_e6"))
      .crossJoin(broadcast(dcg))
      .select(col("pos"), col("doc_id"), col("rel"),
        (col("gain_e6").cast("double") / lit(1000000.0)).as("gain"),
        col("n_overlap"),
        (col("dcg_e6").cast("double") / lit(1000000.0)).as("dcg"),
        (expr(s"(dcg_e6 * 10000) div ${ndcgIdcgE6}").cast("double") /
          lit(10000.0)).as("ndcg"))
      .orderBy(col("pos"))
  }

  /** Lower-median pick of `v` per `key`: the row at rank
    * (count+1) div 2 in (v, tiebreak) order — EXACT (a decimal value
    * that exists in the data is selected, never interpolated).
    */
  /** Lower-median CARRIED onto every row of its partition (round 16):
    * rank the partition, pick the value at rank (__n + 1) div 2, and
    * broadcast it partition-wide with max(when(...)) over the SAME
    * partitioning the rank window established — one exchange per key
    * switch, zero joins. The old form filtered the picked row out and
    * broadcast-joined it back: each of q255's four medians paid a
    * broadcast build plus a full re-execution of its input branch
    * (15 AQE stage-jobs for the query; the join-back chains re-ran
    * every upstream sweep per consumer — see
    * plans/r16/q255_median_polish_before.txt). Pick, tiebreak and
    * exact-BIGINT value are unchanged.
    */
  private def withMedianBy(df: DataFrame, key: String, v: String,
      tiebreak: String, out: String): DataFrame = {
    val wAll = Window.partitionBy(col(key))
    df.withColumn("__rn", row_number().over(
        wAll.orderBy(col(v), col(tiebreak))))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn(out,
        max(when(col("__rn") === expr("(__n + 1) div 2"), col(v)))
          .over(wAll))
      .drop("__rn", "__n")
  }

  /** q255 — TUKEY MEDIAN POLISH (X165, 2 fixed sweeps). Robust
    * two-way decomposition of the event_type × day-of-week total
    * value matrix into row effects + column effects + residuals by
    * alternately sweeping out row and column medians (Tukey 1977;
    * the robust alternative to two-way ANOVA means, immune to the
    * single weird cell). Cell totals are pinned to integer
    * ten-thousandths by floor(value·10⁴) BEFORE summing (the q241
    * move — double→decimal casts proved engine-build-sensitive at
    * the round-8 driver gate); the 5×7 matrix has odd rows AND odd
    * columns, so every median is an EXACT BIGINT rank pick and every
    * subtraction exact BIGINT — the whole decomposition is
    * float-free until the final exact e4 → double divisions. Two
    * sweeps declared (plan + oracle stay static, the q224 argument);
    * effects accumulate across sweeps.
    *
    * Scale: one fact-table pass into the 35-cell aggregate;
    * everything after is window algebra on ≤35 rows.
    */
  def q255(s: SparkSession, d: String): DataFrame = {
    val cells = events(s, d)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("(unix_micros(ts) div 86400000000) % 7").as("dow"))
      .agg(sum(floor(col("value") * lit(10000.0)).cast("long")).as("v"))
      // the 35-cell matrix heads every sweep stage's lineage — the
      // lazy chain re-aggregated the events fact FIVE times (once per
      // median + the final select); materialized it runs once
      .transform(Materialize.truncate)
    // sweep 1: rows then columns — each median rides its own window
    // carry (one linear plan, alternating event_type/dow exchanges;
    // no joins, no re-executed sweep branches)
    val c1 = withMedianBy(cells, "event_type", "v", "dow", "rm1")
      .withColumn("v1", col("v") - col("rm1"))
    val c2 = withMedianBy(c1, "dow", "v1", "event_type", "cm1")
      .withColumn("v2", col("v1") - col("cm1"))
    // sweep 2
    val c3 = withMedianBy(c2, "event_type", "v2", "dow", "rm2")
      .withColumn("v3", col("v2") - col("rm2"))
    withMedianBy(c3, "dow", "v3", "event_type", "cm2")
      .select(col("event_type"), col("dow"),
        (col("v").cast("double") / lit(10000.0)).as("v"),
        ((col("rm1") + col("rm2")).cast("double") / lit(10000.0))
          .as("row_effect"),
        ((col("cm1") + col("cm2")).cast("double") / lit(10000.0))
          .as("col_effect"),
        ((col("v3") - col("cm2")).cast("double") / lit(10000.0))
          .as("residual"))
      .orderBy(col("event_type"), col("dow"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q253_assortativity" -> (q253 _),
    "q254_ndcg_eval" -> (q254 _),
    "q255_median_polish" -> (q255 _))
}

/** DuckDB mirrors of Queries52 — the q222 edge CTEs, the q131/q29
  * arm CTEs (the q226 splice), identical rank-pick medians.
  */
object Oracle52 {

  val sql: Map[String, String] = Map(
    "q253_assortativity" ->
      """WITH e0 AS (
        |  SELECT DISTINCT a.l_orderkey, a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |ew AS (SELECT u, v FROM e0 GROUP BY u, v HAVING count(*) >= 2),
        |ed AS (SELECT u, v FROM ew UNION ALL SELECT v, u FROM ew),
        |deg AS (SELECT u, count(*) AS deg FROM ed GROUP BY u),
        |mm AS (SELECT count(*) AS m,
        |    sum(CAST(a.deg AS DECIMAL(38,0))) AS sdu,
        |    sum(CAST(b.deg AS DECIMAL(38,0))) AS sdv,
        |    sum(CAST(a.deg * b.deg AS DECIMAL(38,0))) AS sduv,
        |    sum(CAST(a.deg * a.deg AS DECIMAL(38,0))) AS sduu,
        |    sum(CAST(b.deg * b.deg AS DECIMAL(38,0))) AS sdvv
        |  FROM ed JOIN deg a ON a.u = ed.u JOIN deg b ON b.u = ed.v),
        |nn AS (SELECT count(*) AS n_nodes FROM deg)
        |SELECT nn.n_nodes, CAST(mm.m / 2 AS BIGINT) AS n_edges,
        |  round((CAST(mm.m AS DOUBLE) * CAST(sduv AS DOUBLE) -
        |    CAST(sdu AS DOUBLE) * CAST(sdv AS DOUBLE)) /
        |    (sqrt(CAST(mm.m AS DOUBLE) * CAST(sduu AS DOUBLE) -
        |      CAST(sdu AS DOUBLE) * CAST(sdu AS DOUBLE)) *
        |     sqrt(CAST(mm.m AS DOUBLE) * CAST(sdvv AS DOUBLE) -
        |       CAST(sdv AS DOUBLE) * CAST(sdv AS DOUBLE))), 4)
        |    AS assortativity,
        |  CASE WHEN round((CAST(mm.m AS DOUBLE) * CAST(sduv AS DOUBLE) -
        |      CAST(sdu AS DOUBLE) * CAST(sdv AS DOUBLE)) /
        |      (sqrt(CAST(mm.m AS DOUBLE) * CAST(sduu AS DOUBLE) -
        |        CAST(sdu AS DOUBLE) * CAST(sdu AS DOUBLE)) *
        |       sqrt(CAST(mm.m AS DOUBLE) * CAST(sdvv AS DOUBLE) -
        |         CAST(sdv AS DOUBLE) * CAST(sdv AS DOUBLE))), 4) > 0.05
        |      THEN 'assortative'
        |    WHEN round((CAST(mm.m AS DOUBLE) * CAST(sduv AS DOUBLE) -
        |      CAST(sdu AS DOUBLE) * CAST(sdv AS DOUBLE)) /
        |      (sqrt(CAST(mm.m AS DOUBLE) * CAST(sduu AS DOUBLE) -
        |        CAST(sdu AS DOUBLE) * CAST(sdu AS DOUBLE)) *
        |       sqrt(CAST(mm.m AS DOUBLE) * CAST(sdvv AS DOUBLE) -
        |         CAST(sdv AS DOUBLE) * CAST(sdv AS DOUBLE))), 4) < -0.05
        |      THEN 'disassortative'
        |    ELSE 'neutral' END AS verdict
        |FROM mm, nn""".stripMargin,

    "q254_ndcg_eval" -> {
      // the SAME Scala-computed discount grid + IDCG constant the
      // Spark plan uses (Queries52.ndcgIlogE6/ndcgIdcgE6)
      val grid = (1 to 10)
        .map(p => s"($p,${Queries52.ndcgIlogE6(p - 1)})").mkString(",")
      s"""WITH il(pos, e6) AS (VALUES $grid),
        |tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents),
        |lens AS (SELECT doc_id, count(*) AS len FROM tk GROUP BY doc_id),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |    avg(len) AS avg_len FROM lens),
        |dfc AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tk
        |    GROUP BY tok),
        |q AS (SELECT tok, df FROM dfc ORDER BY df DESC, tok LIMIT 2),
        |tf AS (SELECT t.doc_id, t.tok, count(*) AS tf
        |  FROM tk t JOIN q USING (tok) GROUP BY t.doc_id, t.tok),
        |sc AS (SELECT tf.doc_id,
        |    ln((s.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0) *
        |      (tf.tf * 2.2) /
        |      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * l.len / s.avg_len))
        |      AS term_score
        |  FROM tf JOIN q USING (tok) JOIN lens l USING (doc_id), stats s),
        |bm AS (SELECT doc_id, round(SUM(term_score), 4) AS bm25
        |  FROM sc GROUP BY doc_id
        |  ORDER BY bm25 DESC, doc_id LIMIT 20),
        |sys AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS pos
        |  FROM bm QUALIFY pos <= 10),
        |p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
        |cos AS (SELECT e.vec_id AS doc_id,
        |    round(
        |      list_sum(list_transform(range(1, len(e.embedding)+1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(p.pe[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |           x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(p.pe,
        |           x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))), 4) AS cosine
        |  FROM embeddings e, p WHERE e.vec_id <> 0
        |  ORDER BY cosine DESC, doc_id LIMIT 10),
        |truth AS (SELECT doc_id,
        |    11 - row_number() OVER (ORDER BY cosine DESC, doc_id) AS rel
        |  FROM cos),
        |gains AS (SELECT s.pos, s.doc_id,
        |    CAST(coalesce(t.rel, 0) AS INT) AS rel,
        |    CAST(coalesce(t.rel, 0) * il.e6 AS BIGINT) AS gain_e6
        |  FROM sys s LEFT JOIN truth t USING (doc_id)
        |  JOIN il ON il.pos = s.pos),
        |dcg AS (SELECT CAST(sum(gain_e6) AS BIGINT) AS dcg_e6,
        |    CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_overlap
        |  FROM gains)
        |SELECT g.pos, g.doc_id, g.rel,
        |  CAST(g.gain_e6 AS DOUBLE) / 1000000.0 AS gain, d.n_overlap,
        |  CAST(d.dcg_e6 AS DOUBLE) / 1000000.0 AS dcg,
        |  CAST((d.dcg_e6 * 10000) // ${Queries52.ndcgIdcgE6} AS DOUBLE)
        |    / 10000.0 AS ndcg
        |FROM gains g, dcg d
        |ORDER BY g.pos""".stripMargin
    },

    "q255_median_polish" ->
      """WITH cells AS (
        |  SELECT event_type,
        |    ((epoch_ns(ts) // 1000) // 86400000000) % 7 AS dow,
        |    CAST(sum(CAST(floor("value" * 10000.0) AS BIGINT)) AS BIGINT)
        |      AS v
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |rm1 AS (SELECT event_type, v AS rm1 FROM (
        |    SELECT event_type, v, dow,
        |      row_number() OVER (PARTITION BY event_type ORDER BY v, dow)
        |        AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM cells) z WHERE rn = (n + 1) // 2),
        |c1 AS (SELECT c.*, r.rm1, c.v - r.rm1 AS v1
        |  FROM cells c JOIN rm1 r USING (event_type)),
        |cm1 AS (SELECT dow, v1 AS cm1 FROM (
        |    SELECT dow, v1, event_type,
        |      row_number() OVER (PARTITION BY dow ORDER BY v1, event_type)
        |        AS rn,
        |      count(*) OVER (PARTITION BY dow) AS n
        |    FROM c1) z WHERE rn = (n + 1) // 2),
        |c2 AS (SELECT c.*, c.v1 - m.cm1 AS v2, m.cm1
        |  FROM c1 c JOIN cm1 m USING (dow)),
        |rm2 AS (SELECT event_type, v2 AS rm2 FROM (
        |    SELECT event_type, v2, dow,
        |      row_number() OVER (PARTITION BY event_type ORDER BY v2, dow)
        |        AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM c2) z WHERE rn = (n + 1) // 2),
        |c3 AS (SELECT c.*, c.v2 - r.rm2 AS v3, r.rm2
        |  FROM c2 c JOIN rm2 r USING (event_type)),
        |cm2 AS (SELECT dow, v3 AS cm2 FROM (
        |    SELECT dow, v3, event_type,
        |      row_number() OVER (PARTITION BY dow ORDER BY v3, event_type)
        |        AS rn,
        |      count(*) OVER (PARTITION BY dow) AS n
        |    FROM c3) z WHERE rn = (n + 1) // 2)
        |SELECT c.event_type, c.dow,
        |  CAST(c.v AS DOUBLE) / 10000.0 AS v,
        |  CAST(c.rm1 + c.rm2 AS DOUBLE) / 10000.0 AS row_effect,
        |  CAST(c.cm1 + m.cm2 AS DOUBLE) / 10000.0 AS col_effect,
        |  CAST(c.v3 - m.cm2 AS DOUBLE) / 10000.0 AS residual
        |FROM c3 c JOIN cm2 m USING (dow)
        |ORDER BY c.event_type, c.dow""".stripMargin)
}
