package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.operators.Snapshots
import graft.operators.Snapshots.Manifest

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(tag: String): String =
    s"/root/repo/target/roundtrip/snapspec_${tag}_p" +
      ProcessHandle.current().pid() + "_" + System.nanoTime()

  private def base = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"), col("n_chars"))

  test("retention: horizon + latest-always-kept") {
    val ms = Seq(Manifest(1, 1, 10, 100), Manifest(2, 2, 10, 100),
      Manifest(3, 3, 10, 100), Manifest(4, 4, 10, 100))
    assert(Snapshots.retained(ms, keepDays = 2) == Set(3, 4))
    assert(Snapshots.retained(ms, keepDays = 0) == Set(4))
    assert(Snapshots.retained(ms, keepDays = 10) == Set(1, 2, 3, 4))
    // ancient latest survives a zero-day horizon
    val old = Seq(Manifest(1, 1, 5, 50), Manifest(2, 1, 5, 50))
    assert(Snapshots.retained(old, keepDays = 0) == Set(2))
  }

  test("vacuum deletes exactly the expired dirs and is idempotent") {
    val dir = scratch("vac")
    val ms = (1 to 4).map(k => Snapshots.writeVersion(base, dir, k))
    (1 to 4).foreach(k => assert(Files.exists(Paths.get(s"$dir/v=$k"))))
    val (kept, expired) = Snapshots.vacuum(dir, ms, keepDays = 2)
    assert(kept == Set(3, 4) && expired == Set(1, 2))
    assert(!Files.exists(Paths.get(s"$dir/v=1")))
    assert(!Files.exists(Paths.get(s"$dir/v=2")))
    assert(Files.exists(Paths.get(s"$dir/v=3")))
    assert(Files.exists(Paths.get(s"$dir/v=4")))
    // idempotent: a second vacuum changes nothing and does not throw
    val (kept2, expired2) = Snapshots.vacuum(dir, ms, keepDays = 2)
    assert(kept2 == kept && expired2 == expired)
    assert(Files.exists(Paths.get(s"$dir/v=3")))
  }

  test("kept snapshots survive vacuum bit-identical; expired keep manifest stats") {
    val dir = scratch("audit")
    val ms = (1 to 4).map(k => Snapshots.writeVersion(base, dir, k))
    // checksum BEFORE vacuum, from the version derivation
    val preSum = Snapshots.versionDf(base, 3)
      .agg(sum(graft.functions.Text.md5Long(concat_ws("|",
        col("doc_id"), col("fp")))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .cast("string")).collect()(0).getString(0)
    val (kept, _) = Snapshots.vacuum(dir, ms, keepDays = 2)
    val rows = Snapshots.audit(spark, dir, ms, kept).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    val byV = rows.map(r => r.getInt(0) -> r).toMap
    assert(byV(3).getString(1) == "kept" && byV(3).getString(4) == preSum)
    assert(byV(1).getString(1) == "expired" && byV(1).isNullAt(4))
    // expired manifest stats survive
    assert(byV(1).getLong(2) == ms(0).nDocs && byV(1).getLong(3) == ms(0).nChars)
  }
}
