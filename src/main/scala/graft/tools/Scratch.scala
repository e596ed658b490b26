package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Dev scratchpad main for quick behavior probes (not part of the
  * library surface).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq(1).toDF("x").select(
      Text.md5Long(lit("0w1 w2 w3")).as("md5long_pre"),
      Text.md5Long(concat(lit("0"), lit("w1 w2 w3"))).as("md5long_concat"),
      md5(concat(lit("0"), lit("w1 w2 w3"))).as("md5hex"),
      substring(md5(concat(lit("0"), lit("w1 w2 w3"))), 1, 15).as("sub15"),
      conv(lit("93e91928140c468"), 16, 10).as("conv_direct")
    ).show(false)
    spark.stop()
  }
}
