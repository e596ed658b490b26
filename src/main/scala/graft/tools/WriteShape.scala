package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (VERDICT r14 #1b / r13 #1d): decompose q17's partitioned
  * lake write and measure pre-partition variants — min of 3 after a
  * warmup write, Bench session shape. Phases: janitor dir setup, the
  * shuffled partitioned write itself, and the read-back audit; write
  * variants: the committed hash repartition(cols), a narrower
  * repartition(n, cols), and repartitionByRange(n, cols).
  */
object WriteShape {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
    ev.count() // warm the scan

    def timeMin(label: String, n: Int = 3)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-46s min=${ts.min}%5.2f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    def out(): String = graft.LakeJanitor.freshLakeDir(sfDir)

    timeMin("janitor freshLakeDir only") { out() }
    timeMin("write: repartition(cols) [committed]") {
      val o = out()
      ev.repartition(col("event_type"), col("day"))
        .write.mode("overwrite").partitionBy("event_type", "day").parquet(o)
    }
    timeMin("write: repartition(8, cols)") {
      val o = out()
      ev.repartition(8, col("event_type"), col("day"))
        .write.mode("overwrite").partitionBy("event_type", "day").parquet(o)
    }
    timeMin("write: repartitionByRange(8, cols)") {
      val o = out()
      ev.repartitionByRange(8, col("event_type"), col("day"))
        .write.mode("overwrite").partitionBy("event_type", "day").parquet(o)
    }
    timeMin("write: rangePart(8) + sortWithin(cols)") {
      val o = out()
      ev.repartitionByRange(8, col("event_type"), col("day"))
        .sortWithinPartitions(col("event_type"), col("day"))
        .write.mode("overwrite").partitionBy("event_type", "day").parquet(o)
    }
    // read-back audit on the last committed-form write
    val o = out()
    ev.repartition(col("event_type"), col("day"))
      .write.mode("overwrite").partitionBy("event_type", "day").parquet(o)
    timeMin("read-back groupBy count") {
      spark.read.parquet(o)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type")).count()
    }
    spark.stop()
  }
}
