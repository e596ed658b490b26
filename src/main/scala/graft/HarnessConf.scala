package graft

import org.apache.spark.sql.SparkSession

/** The ONE definition of the session confs every harness entrypoint
  * (Bench, Verify, tools.AbQ) must carry identically (VERDICT r15 #4:
  * harness-session parity is load-bearing — a refactor silently
  * dropping one conf from one of the three would quietly re-open the
  * ~38 s/pass codegen-recompile tax, or A/B-measure plans the bench
  * never runs). Round16Spec pins both the values here and that all
  * three entrypoints apply this object.
  *
  * - `spark.sql.autoBroadcastJoinThreshold` = 64 MB (round 14):
  *   Spark's 10 MB default is the famously conservative setting for
  *   1 GB-executor clusters; on this 48 GB-heap harness (and on the
  *   100+ GB-executor deployments this library targets) raising it is
  *   standard practice. Measured same-JVM order-alternated A/B
  *   (tools/AbQ, null test passing — PERF.md §1f): join-panel
  *   B/A ≈ 0.92, with the real SMJ→BHJ flips on q235 (0.67×) and
  *   q259 (0.53×), rest ~1.0 (results invariant; every query stays
  *   oracle-gated). AQE stays ON — its runtime-stat conversion uses
  *   this same threshold, so the two compose rather than conflict.
  *
  * - `spark.sql.codegen.cache.maxEntries` = 8192 (round 15, PERF.md
  *   §1g): the static default (100) LRU-thrashes under 307 queries ×
  *   several codegen units each — by the time a pass loops back to
  *   q01 its generated classes are evicted, so EVERY pass re-pays
  *   Janino whole-stage-codegen compilation for the whole surface.
  *   Sized to hold the full surface, warmup compiles once and every
  *   timed pass (and the Verify dump, 5m16s → 3m36s) measures
  *   execution, not compilation.
  */
object HarnessConf {
  val common: Seq[(String, String)] = Seq(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.ui.enabled" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "67108864",
    "spark.sql.codegen.cache.maxEntries" -> "8192")

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    common.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
