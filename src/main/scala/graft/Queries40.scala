package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 batch 4: community detection on the co-order graph and
  * per-user interval coverage (SURVEY §2.8 X132-X133).
  */
object Queries40 {
  import Tables._

  /** Co-order edge list (both directions), persisted once per
    * (session, sf dir) — the LPA loop below scans it 4×, and
    * recomputing the lineitem self-join per iteration would multiply
    * the dominant cost (the LshStages rationale).
    */
  private val edgeCache = new SessionCache
  private[graft] def coOrderEdges(s: SparkSession, d: String): DataFrame =
    edgeCache.getOrCompute(s, d) {
      val li = lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      // min-support 2: an edge needs ≥ 2 DISTINCT co-orders. Random
      // single co-occurrences are noise (and at sf0.1 they are 1.2M
      // pairs — 300× the signal); every real co-purchase graph prunes
      // them, and the threshold is what keeps the per-iteration join
      // input proportional to the SIGNAL, not to |orders|·k².
      // Pair generation: ONE shuffle to per-order sorted part sets,
      // then in-row i<j expansion — the self-join+DISTINCT alternative
      // shuffles the fact table twice and dedups |orders|·k² rows.
      val pairs = li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"))
          .as("p"))
        .select(col("p.u"), col("p.v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select(col("u"), col("v"))
      // eager localCheckpoint, NOT persist: the edge list is referenced
      // by q222/q243/q253/q271 many times per bench pass, and a
      // persisted lineitem-self-join lineage makes every later action
      // pay driver-side canonicalized-plan-cache lookups against that
      // tree (the q250/q270 finding, VERDICT r8 #3) — truncation hands
      // consumers a small LogicalRDD instead
      // symmetrize with an in-row 2-struct flip (the r10 q234
      // convention) — union-with-mirror re-ran the whole pair
      // census once per side during the arm build
      pairs.select(explode(array(
          struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("e"))
        .select(col("e.u"), col("e.v"))
        .transform(Materialize.truncate)
    }

  /** q222 — LABEL-PROPAGATION COMMUNITIES (X132, 4 synchronous
    * iterations). Nodes are parts; edges connect parts appearing in
    * the same order (the co-purchase graph). Each iteration every
    * node adopts the most frequent label among its neighbors (ties →
    * smallest label; isolated nodes keep their own). Four fixed
    * iterations keep the plan static and the oracle unrollable — the
    * same reasoning as q130 PageRank's fixed power iterations. LPA
    * complements the dedup family's connected components (q62): CC
    * merges anything touching, LPA splits dense-vs-sparse regions by
    * neighbourhood majority.
    *
    * Scale: per iteration one equi-join of the persisted
    * min-support-pruned edge list against the |nodes|-row label table
    * (broadcast — labels are ids, not data) + the (node,label) count
    * and per-node argmax folded into two chained aggregates (no
    * ranking window). Edges shuffle once into the persisted layout;
    * iterations reuse it.
    */
  /** Final 4-round labeling, materialized once per (session, sf dir):
    * each round's labels are persisted EAGERLY and the previous
    * round's are dropped — without this, labels_k appears twice in
    * round k+1's plan (majority join + apply join) and the lazy
    * lineage recomputes the whole prefix 2^rounds times.
    */
  private val lpaCache = new SessionCache
  private[graft] def lpaLabels(s: SparkSession, d: String): DataFrame =
    lpaCache.getOrCompute(s, d) {
      val edges = coOrderEdges(s, d)
      var labels = part(s, d)
        .select(col("p_partkey").as("node"), col("p_partkey").as("lbl"))
      for (_ <- 1 to 4) {
        // neighbor-majority label with (count desc, label asc)
        // tie-break as ONE aggregate: max(struct(c, -lbl)) orders
        // lexicographically — max count first, then min label — so no
        // per-node row_number window (a second shuffle) is needed
        val top = edges
          .join(broadcast(labels.select(col("node").as("u"),
            col("lbl").as("ulbl"))), Seq("u"))
          .groupBy(col("v"), col("ulbl")).agg(count(lit(1)).as("c"))
          .groupBy(col("v"))
          .agg(max(struct(col("c"), (-col("ulbl")).as("neg"))).as("m"))
          .select(col("v").as("node"), (-col("m.neg")).as("newlbl"))
        // eager localCheckpoint per round (NOT persist + count): each
        // round is read twice by the next one, and a persisted 4-round
        // join lineage costs seconds of driver-side canonicalized-plan
        // cache lookup on EVERY later action over it — q271 paid 2.86 s
        // per call on a 6k-row table (VERDICT r8 #3; the q250/q270 fix)
        labels = labels.join(top, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("newlbl"), col("lbl")).as("lbl"))
          .transform(Materialize.truncate)
      }
      labels
    }

  def q222(s: SparkSession, d: String): DataFrame = {
    lpaLabels(s, d).groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_members"), min(col("node")).as("min_member"))
      .filter(col("n_members") >= 2)
      .orderBy(col("n_members").desc, col("community"))
  }

  /** q223 — INTERVAL UNION / COVERAGE (X133). Each event opens a
    * 5-minute activity interval [t, t+300 s); per user, overlapping
    * or touching intervals merge (gaps-and-islands: a row starts a
    * new island iff its start exceeds the running max of all previous
    * ends), then per-user totals: merged-interval count, covered
    * time, longest merged span. The utilization/SLA primitive — union
    * of time ranges without a range self-join.
    *
    * Scale: one hash shuffle on user_id, each partition scanned once
    * by two frame-bounded windows; state per row is one long. The
    * quadratic interval-overlap join never materializes.
    */
  def q223(s: SparkSession, d: String): DataFrame = {
    val ivUs = 300L * 1000000L
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("t0"), col("event_id"))
    val prev = byUser.rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t0"))
      .withColumn("t1", col("t0") + lit(ivUs))
      .withColumn("run_end", max(col("t1")).over(prev))
      .withColumn("new_island",
        when(col("run_end").isNull || col("t0") > col("run_end"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("t0")).as("start"), max(col("t1")).as("end"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("end") - col("start")).as("covered_us"),
        max(col("end") - col("start")).as("longest_us"))
      .orderBy(col("user_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q222_label_prop" -> (q222 _),
    "q223_interval_union" -> (q223 _))
}

/** DuckDB mirrors of Queries40. The LPA oracle unrolls the 4
  * synchronous iterations as generated CTE pairs (m_k = per-node
  * neighbor-majority labels, l_k = apply-with-fallback) — built by a
  * Scala loop so iteration k is textually identical to k−1, which is
  * exactly the synchronous-update semantics the Spark loop executes.
  */
object Oracle40 {

  /** The LPA CTE prefix (edges + l0..l{iters} label tables), shared
    * with q271's modularity oracle so the two labelings cannot drift.
    */
  private[graft] def lpaCtes(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""m$k AS (SELECT node, lbl FROM (
         |    SELECT ed.v AS node, l.lbl, count(*) AS c
         |    FROM ed JOIN l${k - 1} l ON ed.u = l.node
         |    GROUP BY ed.v, l.lbl) t
         |  QUALIFY row_number() OVER (
         |    PARTITION BY node ORDER BY c DESC, lbl) = 1),
         |l$k AS (SELECT n.node, coalesce(m.lbl, n.lbl) AS lbl
         |  FROM l${k - 1} n LEFT JOIN m$k m ON n.node = m.node)"""
        .stripMargin
    }.mkString(",\n")
    s"""e0 AS (
       |  SELECT DISTINCT a.l_orderkey, a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |ew AS (SELECT u, v FROM e0 GROUP BY u, v HAVING count(*) >= 2),
       |ed AS (SELECT u, v FROM ew UNION ALL SELECT v, u FROM ew),
       |l0 AS (SELECT p_partkey AS node, p_partkey AS lbl FROM part),
       |$steps""".stripMargin
  }

  private def lpaSql(iters: Int): String =
    s"""WITH ${lpaCtes(iters)}
       |SELECT lbl AS community, count(*) AS n_members,
       |  min(node) AS min_member
       |FROM l$iters GROUP BY lbl HAVING count(*) >= 2
       |ORDER BY n_members DESC, community""".stripMargin

  val sql: Map[String, String] = Map(
    "q222_label_prop" -> lpaSql(4),

    "q223_interval_union" ->
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_ns(ts) // 1000 AS t0,
        |    epoch_ns(ts) // 1000 + 300000000 AS t1
        |  FROM events WHERE user_id IS NOT NULL),
        |w AS (SELECT *,
        |    max(t1) OVER (PARTITION BY user_id ORDER BY t0, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_end
        |  FROM e),
        |isl AS (SELECT *,
        |    sum(CASE WHEN run_end IS NULL OR t0 > run_end
        |      THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY user_id ORDER BY t0, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM w),
        |m AS (SELECT user_id, island, min(t0) AS s, max(t1) AS e
        |  FROM isl GROUP BY user_id, island)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(e - s) AS BIGINT) AS covered_us,
        |  CAST(max(e - s) AS BIGINT) AS longest_us
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin)
}
