package graft

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped once-only DataFrame materialization.
  *
  * `TrieMap.getOrElseUpdate` is NOT atomic for an expensive thunk:
  * two concurrent first callers both evaluate it, and the loser's
  * persisted / localCheckpoint'd copy leaks until GC (ADVICE r8 —
  * `unpersist()` does not free localCheckpoint blocks, only GC of the
  * truncated RDD does). Entries here are lazy cells installed with
  * `putIfAbsent`: whoever loses the install race forces the winner's
  * cell, so the thunk body runs EXACTLY once per key and every caller
  * sees the same materialized table.
  *
  * Keys are "applicationId|sfDir". Entries belonging to dead
  * applications (a restarted SparkContext in the same JVM — test
  * reruns, notebooks) are evicted on access; eviction never forces an
  * uncomputed cell, and unpersist of evicted values is best-effort
  * (their blocks died with the old context anyway).
  */
/** Lineage truncation for iterative stage tables (BFS/HITS/LPA
  * levels, CC contractions, the BM25 arm).
  *
  * Default: `localCheckpoint` — executor-local, non-replicated blocks.
  * Correct and fastest on local[*]; on a real cluster an executor loss
  * destroys the blocks AND their truncated lineage, failing the job.
  * Cluster-grade swap: set `spark.graft.reliableCheckpoint=true` and
  * call `sparkContext.setCheckpointDir(<lake path>)` — stage tables
  * then `checkpoint()` to the reliable store (one extra write+read per
  * stage, survives executor loss). Results are identical either way
  * (both are plain materializations; CheckpointSpec asserts it) — the
  * flag trades stage-table latency for fault tolerance, which is the
  * right default at 100 TB where a 1000-executor job WILL lose
  * executors mid-iteration.
  */
object Materialize {
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.conf
        .getOption("spark.graft.reliableCheckpoint").contains("true"))
      df.checkpoint()
    else df.localCheckpoint()

  /** Lazy twin (round 16): same truncation + block reuse, but the
    * stage table materializes inside its FIRST consumer's job instead
    * of a dedicated construction-time job (the q130 ≤2-round lazy
    * convention, generalized). Right for per-round stage tables whose
    * first consumer runs immediately anyway — the eager job is pure
    * scheduling overhead there; q277 measured 23 → fewer stage-jobs.
    * Results identical either way (both are plain materializations).
    *
    * The RELIABLE branch stays EAGER (ADVICE r16): a non-eager
    * reliable `checkpoint(eager=false)` does not cache the RDD first,
    * so the plan is computed once for the first consumer and a SECOND
    * time when the checkpoint job itself runs — strictly worse than
    * the eager truncate this replaces. Laziness only pays on the
    * localCheckpoint path, where the blocks persist as a side effect
    * of the first consumer's pass.
    */
  def truncateLazy(df: DataFrame): DataFrame =
    if (df.sparkSession.conf
        .getOption("spark.graft.reliableCheckpoint").contains("true"))
      df.checkpoint()
    else df.localCheckpoint(eager = false)
}

final class SessionCache {
  private final class Cell(thunk: () => DataFrame) {
    @volatile private var computed: Option[DataFrame] = None
    lazy val value: DataFrame = { val v = thunk(); computed = Some(v); v }
    def peek: Option[DataFrame] = computed
  }

  private val cells = TrieMap.empty[String, Cell]

  def getOrCompute(s: SparkSession, d: String)(thunk: => DataFrame): DataFrame = {
    val appId = s.sparkContext.applicationId
    cells.keys.filterNot(_.startsWith(appId + "|")).foreach { k =>
      cells.remove(k).flatMap(_.peek).foreach(df =>
        try df.unpersist(blocking = false) catch { case _: Throwable => () })
    }
    val key = appId + "|" + d
    val cell = new Cell(() => thunk)
    cells.putIfAbsent(key, cell).getOrElse(cell).value
  }
}
