package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys at cluster scale (SURVEY.md
  * §7.6 risk 4). AQE's skew-join splitting handles most cases
  * automatically; these are the explicit forms for when the skew is in
  * an AGGREGATION (AQE does not split hot groupBy keys) or when the
  * join strategy must be pinned.
  */
object Skew {

  /** Bounded registry for chunkedSessionize's stage persist (ADVICE
    * r13): CacheManager dedupes identical plans, but each DISTINCT
    * input/parameterization would otherwise leave a live
    * InMemoryRelation for the rest of the session — unbounded growth
    * for a general-purpose operator invoked over varying inputs.
    * Access-ordered LRU keyed on (application, canonical plan hash);
    * beyond the cap the least-recently-used stage unpersists.
    * Evicting a stage a consumer still holds is SAFE — Spark falls
    * back to recomputing the lineage — so the cap trades re-execution
    * on the >cap-th concurrent input against a bounded cache
    * footprint. Re-invoking over the same input refreshes its slot
    * (same canonical plan → same key, and CacheManager had deduped
    * the persist anyway).
    */
  private val LocalStageCap = 8
  private val localStages =
    new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, DataFrame]): Boolean = {
        val evict = size() > LocalStageCap
        if (evict)
          try e.getValue.unpersist(blocking = false)
          catch { case _: Throwable => () }
        evict
      }
    }
  /** Displacement guard (ADVICE r14): the registry key hashes the
    * canonical plan to an Int, so two DISTINCT plans can collide; a
    * put() that displaces a different DataFrame would otherwise leave
    * the displaced InMemoryRelation untracked and persisted for the
    * session lifetime — the exact unbounded-growth hole the LRU
    * exists to close. When the displaced entry is plan-equal to the
    * new one (the common re-invocation case) it must NOT be
    * unpersisted: CacheManager deduped the two persists onto one
    * shared cache entry, and releasing it would evict the stage the
    * new DataFrame is about to use.
    *
    * `blocking` (default false — the production path must not stall a
    * put() on block cleanup) exists for the pin test (ADVICE r15): a
    * negative assertion ("the plan-equal entry was NOT unpersisted")
    * over an async unpersist is a timing race; the test passes
    * blocking = true so any wrongly-issued unpersist completes before
    * the call returns and the assertion is deterministic.
    */
  private[graft] def releaseDisplaced(displaced: DataFrame, next: DataFrame,
      blocking: Boolean = false): Unit =
    if (displaced.queryExecution.analyzed.canonicalized !=
        next.queryExecution.analyzed.canonicalized)
      try displaced.unpersist(blocking)
      catch { case _: Throwable => () }

  private[operators] def trackStage(df: DataFrame): Unit = localStages.synchronized {
    val key = df.sparkSession.sparkContext.applicationId + "|" +
      df.queryExecution.analyzed.semanticHash()
    val prev = localStages.put(key, df)
    if (prev != null && !(prev eq df)) releaseDisplaced(prev, df)
  }

  /** Two-phase salted aggregation: groupBy (key, salt) partials, then
    * combine per key. A key with 10^9 rows becomes `salts` parallel
    * partials instead of one straggler task. Salt is derived from a
    * row-unique column, so it is deterministic (no rand() — replays
    * and retries stay consistent).
    *
    * Returns per-key count, sum, min, max over `valueCol`.
    */
  def saltedStats(df: DataFrame, key: Column, saltSource: Column,
      valueCol: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts.toLong)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("c"), sum(valueCol).as("s"),
        min(valueCol).as("mn"), max(valueCol).as("mx"))
      .groupBy(col("key"))
      .agg(sum(col("c")).as("n"), sum(col("s")).as("sum"),
        min(col("mn")).as("min"), max(col("mx")).as("max"))

  /** Two-phase skew-safe sessionization (the windowed analogue of
    * saltedStats): gap > `gapSec` sessionization where the per-key
    * window is split into fixed time CHUNKS, sessionized chunk-locally,
    * then stitched at chunk boundaries. A key with 10^9 events becomes
    * many bounded (key, chunk) window partitions instead of one
    * straggler task — the plain `Window.partitionBy(key)` form (q28)
    * funnels every event of a hot key through one task.
    *
    * Phase 1: window over (key, chunk): local gap/is-new/running
    * session count, each chunk's first event provisionally a start.
    * Phase 2: ONE ROW PER (key, chunk) — first/last event time and
    * local start count — stitched by a per-key window over chunk
    * aggregates (rows = chunks per key, bounded by time span, never by
    * event volume): a chunk whose first event is within `gapSec` of
    * the previous chunk's last event merges its first local session
    * into the previous session (`merge = 1`), and each chunk's global
    * offset is the running sum of real starts before it. Global
    * session_id = offset + local_id − merge, which equals the plain
    * form's "count of true session starts so far" — sessions spanning
    * any number of chunks (or empty chunks) stitch transitively
    * because every boundary is tested independently.
    *
    * Gap semantics mirror q28 exactly (double-seconds, strict >).
    * Equality with the plain window is proved in ScaleOpsSpec across
    * chunk sizes and by q101's DuckDB oracle (the UNCHUNKED session
    * SQL).
    */
  def chunkedSessionize(df: DataFrame, keyCol: String, tsCol: String,
      tieBreakCol: String, gapSec: Double, chunkSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(chunkSec > 0, s"chunkSec must be positive, got $chunkSec")
    val base = df
      .withColumn("__ts", col(tsCol).cast("double"))
      .withColumn("__chunk",
        floor(unix_micros(col(tsCol)) / lit(chunkSec * 1000000L)))
    val wc = Window.partitionBy(col(keyCol), col("__chunk"))
      .orderBy(col("__ts"), col(tieBreakCol))
    val local = base
      .withColumn("__gap", col("__ts") - lag(col("__ts"), 1).over(wc))
      .withColumn("__is_new",
        when(col("__gap").isNull || col("__gap") > gapSec, 1).otherwise(0))
      .withColumn("__lsid",
        sum(col("__is_new")).over(wc.rowsBetween(Window.unboundedPreceding, 0)))
    // `local` feeds BOTH the chunk-aggregate stitch and the final
    // join's left side; the formatted plan shows ReusedExchange does
    // NOT fire across the two consumers (column pruning diverges
    // below the exchange — the same class as q125's round-10/11
    // finding), so without this the full scan+shuffle+double-window
    // chain ran twice per execution. persist(), not localCheckpoint:
    // an ExistingRDD forgets its (key, chunk) outputPartitioning and
    // both consumers would re-exchange the full row set, while
    // InMemoryRelation keeps it (the stitch groupBy and the join stay
    // exchange-free), and the cache manager keys on the canonical
    // plan, so repeated executions share ONE entry instead of leaking
    // a copy per run (round 13). The bounded LRU registry above owns
    // the unpersist side (round 14): varying inputs evict the oldest
    // stage instead of accumulating for the session's lifetime.
    val localM = local.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    trackStage(localM)
    val wu = Window.partitionBy(col("__k")).orderBy(col("__c"))
    val stitched = localM
      .groupBy(col(keyCol).as("__k"), col("__chunk").as("__c"))
      .agg(min(col("__ts")).as("__first"), max(col("__ts")).as("__last"),
        max(col("__lsid")).as("__nstarts"))
      .withColumn("__merge",
        when(col("__first") - lag(col("__last"), 1).over(wu) <= gapSec, 1)
          .otherwise(0))
      .withColumn("__offset",
        coalesce(sum(col("__nstarts") - col("__merge"))
          .over(wu.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__k"), col("__c"), col("__merge"), col("__offset"))
    localM
      .join(stitched,
        col(keyCol) === col("__k") && col("__chunk") === col("__c"))
      .withColumn("session_id",
        col("__offset") + col("__lsid") - col("__merge"))
      .drop("__ts", "__chunk", "__gap", "__is_new", "__lsid",
        "__k", "__c", "__merge", "__offset")
  }

  /** Salted equi-join for a skewed fact against a small-ish dim that
    * cannot broadcast: the dim is replicated `salts` times, the fact
    * picks a deterministic salt, and the join key becomes (key, salt)
    * — one hot key spreads over `salts` tasks.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Per-key rate cap (q205/X115): keep at most `k` rows per key,
    * chosen by deterministic priority (`prioCol`, ties broken by
    * `tieCol`) — the hot-key bound applied at ingest, BEFORE any
    * downstream shuffle can melt on a runaway key. Deterministic
    * under restarts and any input partitioning, unlike "first k
    * seen"; downstream joins and windows inherit the bound.
    */
  def rateCap(df: DataFrame, keyCol: Column, prioCol: Column,
      tieCol: Column, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(prioCol, tieCol)
    // collision-safe temp name: withColumn on a caller-owned "__rk"
    // would silently replace it and the trailing drop would eat it
    val rk = Iterator.from(0).map(i => s"__rk$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(rk, row_number().over(w))
      .filter(col(rk) <= k).drop(rk)
  }
}
