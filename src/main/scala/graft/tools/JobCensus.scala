package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev probe (round 16): weather-independent cost census — per query,
  * count the Spark jobs, stages and tasks one steady-state execution
  * submits. Wall time on this host swings ±3× with co-tenant load,
  * but a recomputed stage or a per-step driver job is a COUNT — the
  * same on any window. High task counts flag recompute (the q125
  * pattern: one logical stage executed 3×); high job counts flag
  * driver-stepped loops and multi-action queries.
  */
object JobCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.HarnessConf(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks); ()
      }
    })
    val only = args.toSet
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.exists(n.startsWith))
    // warmup: materialize shared stages + codegen so the census reads
    // steady state, not one-time session costs
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    Thread.sleep(2000) // drain listener queue
    println("query,jobs,stages,tasks,wall_s")
    names.foreach { n =>
      val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
      val w0 = System.nanoTime()
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"$n failed: $e") }
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(120) // let listener events drain before reading
      println(f"$n,${jobs.get - j0},${stages.get - s0},${tasks.get - t0},$wall%.3f")
    }
    spark.stop()
  }
}
