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
    val df = Seq("a b c d").toDF("t")
    val sh = df.select(Text.shingles($"t", 3)).head().getSeq[Any](0)
    sh.foreach { e =>
      println(s"elem class=${e.getClass.getName} value='${e}' bytes=${e.toString.getBytes("UTF-8").toList}")
    }
    spark.stop()
  }
}
