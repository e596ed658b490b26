package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // harness-session parity (VERDICT r15 #4, via HarnessConf): the
    // dump exercises the SAME physical plans Bench measures — the
    // oracle gate then re-proves every threshold-flipped join — and
    // the surface-sized codegen cache keeps the 307-query dump from
    // re-paying Janino compilation (5m16s → 3m36s, PERF.md §1g)
    val builder = HarnessConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
    // Builder-side experiment overlay (mirrors Bench, round 16):
    // SPARK_GRAFT_CONF="k=v;k=v" adds session confs — used for the
    // reliable-checkpoint differential drive (VERDICT r15 #5). The
    // driver never sets it.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").map(_.trim)
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    // reliable `checkpoint()` needs a checkpoint dir; give the flag a
    // default one so a flag-on drive works out of the box (a real
    // deployment points this at the lake/DFS instead)
    if (spark.conf.getOption("spark.graft.reliableCheckpoint").contains("true")
        && spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(
        Files.createTempDirectory("graft-verify-ckpt").toString)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Builder-side iteration aid: SPARK_GRAFT_ONLY=q163,q164 restricts the
    // dump to those queries. The driver never sets it → full dump.
    // blank prefixes dropped (ADVICE r10, the Bench fix mirrored):
    // SPARK_GRAFT_ONLY='' behaves like unset, not match-everything
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
