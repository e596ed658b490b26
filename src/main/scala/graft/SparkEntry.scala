package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in Queries.scala; oracle SQL in Oracle.scala.
  */
object SparkEntry {
  /** Flagship query (SURVEY.md §7.2: q22 multi-join revenue rollup) on
    * /root/testdata/sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q22(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ QueriesExt.all ++ Queries2.all ++ Queries3.all ++
      Queries4.all ++ Queries5.all ++ Queries6.all ++ Queries7.all ++
      Queries8.all ++ Queries9.all ++ Queries10.all ++ Queries11.all ++
      Queries12.all ++ Queries13.all ++ Queries14.all ++ Queries15.all ++
      Queries16.all ++ Queries17.all ++ Queries18.all ++ Queries19.all ++
      Queries20.all ++ Queries21.all ++ Queries22.all ++ Queries23.all ++
      Queries24.all ++ Queries25.all ++ Queries26.all ++ Queries27.all ++
      Queries28.all ++ Queries29.all ++ Queries30.all ++ Queries31.all ++
      Queries32.all ++ Queries33.all ++ Queries34.all ++ Queries35.all ++
      Queries36.all ++ Queries37.all ++ Queries38.all ++ Queries39.all ++
      Queries40.all ++ Queries41.all ++ Queries42.all ++ Queries43.all ++
      Queries44.all ++ Queries45.all ++ Queries46.all ++ Queries47.all ++
      Queries48.all ++ Queries49.all ++ Queries50.all ++ Queries51.all ++
      Queries52.all ++ Queries53.all ++ Queries54.all ++ Queries55.all ++
      Queries56.all ++ Queries57.all ++ Queries58.all ++ Queries59.all ++
      Queries60.all ++ Queries61.all ++ Queries62.all ++ Queries63.all ++
      Queries64.all ++ Queries65.all ++ Queries66.all ++ Queries67.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Oracle.sql ++ OracleExt.sql ++ Oracle2.sql ++ Oracle3.sql ++
      Oracle4.sql ++ Oracle5.sql ++ Oracle6.sql ++ Oracle7.sql ++
      Oracle8.sql ++ Oracle9.sql ++ Oracle10.sql ++ Oracle11.sql ++
      Oracle12.sql ++ Oracle13.sql ++ Oracle14.sql ++ Oracle15.sql ++
      Oracle16.sql ++ Oracle17.sql ++ Oracle18.sql ++ Oracle19.sql ++
      Oracle20.sql ++ Oracle21.sql ++ Oracle22.sql ++ Oracle23.sql ++
      Oracle24.sql ++ Oracle25.sql ++ Oracle26.sql ++ Oracle27.sql ++
      Oracle28.sql ++ Oracle29.sql ++ Oracle30.sql ++ Oracle31.sql ++
      Oracle32.sql ++ Oracle33.sql ++ Oracle34.sql ++ Oracle35.sql ++
      Oracle36.sql ++ Oracle37.sql ++ Oracle38.sql ++ Oracle39.sql ++
      Oracle40.sql ++ Oracle41.sql ++ Oracle42.sql ++ Oracle43.sql ++
      Oracle44.sql ++ Oracle45.sql ++ Oracle46.sql ++ Oracle47.sql ++
      Oracle48.sql ++ Oracle49.sql ++ Oracle50.sql ++ Oracle51.sql ++
      Oracle52.sql ++ Oracle53.sql ++ Oracle54.sql ++ Oracle55.sql ++
      Oracle56.sql ++ Oracle57.sql ++ Oracle58.sql ++ Oracle59.sql ++
      Oracle60.sql ++ Oracle61.sql ++ Oracle62.sql ++ Oracle63.sql ++
      Oracle64.sql ++ Oracle65.sql ++ Oracle66.sql ++ Oracle67.sql
}
