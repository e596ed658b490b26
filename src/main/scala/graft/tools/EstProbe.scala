package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EstProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.HarnessConf(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def est(n: String, df: org.apache.spark.sql.DataFrame): Unit =
      println(f"EST $n%-12s ${df.queryExecution.optimizedPlan.stats.sizeInBytes}")
    val rfm = graft.Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("f"))
    est("rfm", rfm)
    val perUser = graft.Tables.events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
    est("perUser", perUser)
    val rev = graft.Tables.lineitem(s, d).groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice")).as("rev"))
    est("partRev", rev)
    val dict = graft.Tables.documents(s, d).filter(col("text").isNotNull)
      .select(posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    est("dict", dict)
    est("snap", graft.Queries36.snapshot(s, d))
    s.stop()
  }
}
