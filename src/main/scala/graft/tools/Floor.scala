package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the per-query harness floor, decomposed (VERDICT r10
  * #4). Times, in the Bench session shape (local[32], 32 shuffle
  * partitions, AQE default): a no-op action, a 1-stage parquet scan
  * count, a 2-stage aggregate, a 3-stage aggregate+join, and an eager
  * localCheckpoint of a tiny frame — min of 5 after warmup, so each
  * number is the steady-state cost a bench query of that stage count
  * cannot go below.
  */
object Floor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(spark, sfDir)
    val ev = graft.Tables.events(spark, sfDir)
    def time(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f) // warmup
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-42s ${ts.min}%.3f s (min of 5)")
    }
    time("no-op: spark.range(1).count")(spark.range(1).count())
    val r1 = spark.range(1)
    time("no-op: SAME range(1) frame .count")(r1.count())
    time("no-op: sc.parallelize(1 elem).count")(
      spark.sparkContext.parallelize(Seq(1), 1).count())
    val sql1 = spark.sql("select 1 as x")
    time("no-op: SAME select-1 frame .count")(sql1.count())
    time("no-op: range(1).agg(sum) collect")(
      spark.range(1).agg(sum(col("id"))).collect())
    time("1-stage: lineitem scan+count")(li.count())
    time("1-stage: lineitem 2-col project+count")(
      li.select(col("l_orderkey"), col("l_quantity")).count())
    time("2-stage: groupBy(retflag) agg count")(
      li.groupBy(col("l_returnflag")).count().count())
    time("3-stage: groupBy + broadcast-join + agg")(
      li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
        .join(broadcast(li.groupBy(col("l_linestatus")).count()
          .limit(2).select(col("count").as("c"))))
        .agg(sum(col("s") * col("c"))).count())
    time("events scan+count")(ev.count())
    time("eager localCheckpoint of a 32-part tiny agg")(
      li.groupBy(col("l_returnflag")).count().localCheckpoint().count())
    spark.stop()
  }
}
