package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot retention / VACUUM (X125) — the other half of the q204
  * time-travel story: versioned snapshots accumulate forever unless
  * something expires them, and the expiry must (a) never touch a
  * snapshot inside the retention horizon, (b) NEVER delete the latest
  * snapshot no matter how old, and (c) leave every surviving snapshot
  * bit-identical (proved by q215's content checksums).
  *
  * The manifest is the commit log in portable form: one row per
  * version with its commit day and the logical stats recorded at
  * commit time. After VACUUM those manifest stats are all that
  * remains of an expired snapshot — exactly the Iceberg/Delta
  * metadata-outlives-data contract.
  *
  * Scale: VACUUM is a metadata decision (|versions| rows) plus bulk
  * file deletes — no data is read; the audit reads only SURVIVING
  * versions, one narrow aggregate each. At 100 TB the deletes go to
  * the object-store batch-delete API; the manifest logic is
  * unchanged.
  */
object Snapshots {

  /** Commit-log row recorded when a version lands. */
  case class Manifest(version: Int, commitDay: Int, nDocs: Long, nChars: Long)

  /** Derivation rule for version k over the base corpus — filter +
    * per-version revision, deterministic so the DuckDB oracle can
    * rebuild every version from the raw table: drop doc_id %
    * (13+k) == 0; docs with doc_id % 7 == k are revised (fp over
    * "v<k> "-prefixed text, n_chars+k).
    */
  def versionDf(base: DataFrame, k: Int): DataFrame =
    base.filter(col("doc_id") % (13 + k) =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === k,
          md5(concat(lit(s"v$k "), col("text"))))
          .otherwise(md5(col("text"))).as("fp"),
        (col("n_chars") + when(col("doc_id") % 7 === k, lit(k.toLong))
          .otherwise(lit(0L))).as("n_chars"))

  /** Write version k under `dir/v=k` and record its manifest row
    * (stats from one 1-row aggregate — the commit-time accounting a
    * real table format keeps in metadata).
    */
  def writeVersion(base: DataFrame, dir: String, k: Int): Manifest = {
    // commit-time accounting from the COMMIT JOB ITSELF (round 16,
    // guide §1.4/§2): `observe` rides the write pass, so the stats
    // count exactly the rows the commit landed — the same numbers the
    // post-hoc read-back produced, without its second job per version
    // (q215 paid 2 jobs × 4 versions in the write phase; a real table
    // format likewise records commit stats from the commit, not from
    // re-listing the files). coalesce: an EMPTY commit (the
    // derivation rule can drop every row) sums n_chars to NULL, and
    // the manifest records 0 (r14 — Round14Spec pins it).
    // SINGLE-ATTEMPT ASSUMPTION (ADVICE r16): Observation metrics are
    // accumulator-based — under task retries or speculative execution
    // in a distributed deployment they can count rows from attempts
    // the commit protocol never landed. Valid here because the local
    // harness runs with speculation off (the Spark default) and any
    // retried local task rebuilds the same deterministic partition; a
    // distributed deployment must either disable speculation on the
    // commit job or fall back to the pre-r16 read-back of the
    // committed files for manifest stats.
    val obs = new org.apache.spark.sql.Observation(s"commit|$dir|v=$k")
    versionDf(base, k)
      .observe(obs, count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_chars")), lit(0L)).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/v=$k")
    Manifest(k, commitDay = k, obs.get("n_docs").asInstanceOf[Long],
      obs.get("n_chars").asInstanceOf[Long])
  }

  /** Which versions does the retention policy keep? Commit day
    * strictly inside the horizon (day > latest − keepDays), and the
    * latest version unconditionally.
    */
  def retained(manifests: Seq[Manifest], keepDays: Int): Set[Int] = {
    require(manifests.nonEmpty, "empty manifest log")
    val latest = manifests.maxBy(m => (m.commitDay, m.version))
    val cutoff = manifests.map(_.commitDay).max - keepDays
    manifests.filter(m => m.commitDay > cutoff || m.version == latest.version)
      .map(_.version).toSet
  }

  /** VACUUM: physically delete every expired version directory.
    * Returns (kept, expired) version sets; idempotent — re-running
    * deletes nothing new. Deletion is real (recursive rm of the
    * snapshot dir), which is what q215 then audits.
    */
  def vacuum(dir: String, manifests: Seq[Manifest], keepDays: Int): (Set[Int], Set[Int]) = {
    val keep = retained(manifests, keepDays)
    val expired = manifests.map(_.version).filterNot(keep).toSet
    expired.foreach { v => deleteRecursive(Paths.get(s"$dir/v=$v")) }
    (keep, expired)
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }

  /** Post-VACUUM audit rows: surviving versions are READ BACK from
    * disk (n_docs / n_chars / order-invariant content checksum —
    * proving the files survived intact); expired versions surface
    * only their manifest stats with a NULL checksum (the files are
    * gone, and q215 asserts they are). Every kept version surfaces a
    * row even when its files hold ZERO rows (left-join below, ADVICE
    * r13). Note: the single multi-path read requires the kept
    * versions to be schema-COMPATIBLE (the unified scan takes one
    * merged schema); snapshots that diverged structurally need the
    * per-version read this replaced — acceptable here because
    * versionDf fixes the snapshot schema by construction.
    */
  def audit(spark: SparkSession, dir: String, manifests: Seq[Manifest],
      kept: Set[Int]): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // ONE multi-path read of every surviving snapshot (round 13,
    // VERDICT r12 #1): basePath recovers `v=` as a partition column,
    // so the audit is a single job with one grouped aggregate —
    // the previous read-then-agg loop paid a job-scheduling round
    // trip per survivor for the same scan bytes.
    val keptVs = manifests.filter(m => kept(m.version)).map(_.version).sorted
    val keptAudits =
      if (keptVs.isEmpty) Seq.empty[DataFrame]
      else {
        val grouped = spark.read.option("basePath", dir)
          .parquet(keptVs.map(v => s"$dir/v=$v"): _*)
          .groupBy(col("v").cast("int").as("version"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
            sum(graft.functions.Text.md5Long(concat_ws("|",
              col("doc_id"), col("fp"))).cast(DecimalType(38, 0)))
              .cast("string").as("content_sum"))
        // ADVICE r13: groupBy yields NO group for a kept version whose
        // partition holds zero rows, so an empty-but-surviving
        // snapshot silently vanished from the audit — the opposite of
        // what an audit should do. Left-join the kept-version list
        // (|kept| local rows) so every surviving version always
        // surfaces. ADVICE r14: an empty kept version's counts
        // coalesce to ZERO — n_docs AND n_chars — the same
        // representation writeVersion records in the manifest (one
        // accounting convention across both surfaces). content_sum
        // stays NULL: there is no content to checksum, and the DuckDB
        // oracle's sum-over-no-rows agrees.
        import spark.implicits._
        val keptIdx = keptVs.toDF("version")
        Seq(keptIdx.join(grouped, Seq("version"), "left")
          .select(col("version"), lit("kept").as("status"),
            coalesce(col("n_docs"), lit(0L)).as("n_docs"),
            coalesce(col("n_chars"), lit(0L)).as("n_chars"),
            col("content_sum")))
      }
    val expiredRows = manifests.filterNot(m => kept(m.version)).sortBy(_.version)
      .map { m =>
        require(!Files.exists(Paths.get(s"$dir/v=${m.version}")),
          s"VACUUM left expired snapshot v=${m.version} on disk")
        spark.range(1).select(lit(m.version).as("version"),
          lit("expired").as("status"), lit(m.nDocs).as("n_docs"),
          lit(m.nChars).as("n_chars"),
          lit(null).cast("string").as("content_sum"))
      }
    (keptAudits ++ expiredRows).reduce(_ unionByName _)
      .orderBy(col("version"))
  }
}
