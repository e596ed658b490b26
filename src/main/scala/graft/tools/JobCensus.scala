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
  /** Drain the listener bus before reading the shared counters
    * (ADVICE r16): a fixed sleep let events from query N bleed into
    * query N+1's deltas when the bus lagged under co-tenant load.
    * `LiveListenerBus.waitUntilEmpty` is private[spark], so reach it
    * reflectively; fall back to the old sleep if the API moves.
    */
  private def drainListeners(sc: org.apache.spark.SparkContext): Unit =
    try {
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods.find(m =>
          m.getName == "waitUntilEmpty" && m.getParameterCount == 0) match {
        case Some(mm) => mm.invoke(bus); ()
        case None => Thread.sleep(120)
      }
    } catch { case _: Throwable => Thread.sleep(120) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // dev-probe conf override (round 17): census-level conf A/B —
    // task/job COUNTS are the weather-independent gauge, so an
    // A/B of a session-shape conf (e.g. AQE cached-plan coalescing)
    // is two census runs, not two wall-clock runs. Unset env = the
    // exact bench session shape, unchanged.
    val extra = sys.env.getOrElse("SPARK_GRAFT_CENSUS_CONF", "")
      .split(";").map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val spark = graft.HarnessConf(extra.foldLeft(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")) {
      case (b, (k, v)) => b.config(k, v)
    }).getOrCreate()
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
    drainListeners(spark.sparkContext)
    println("query,jobs,stages,tasks,wall_s")
    names.foreach { n =>
      val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
      val w0 = System.nanoTime()
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"$n failed: $e") }
      val wall = (System.nanoTime() - w0) / 1e9
      drainListeners(spark.sparkContext)
      println(f"$n,${jobs.get - j0},${stages.get - s0},${tasks.get - t0},$wall%.3f")
    }
    spark.stop()
  }
}
