package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev probe: same-JVM interleaved config A/B. Times each named query
  * under conf A then conf B within the SAME pass, alternating, so
  * minutes-scale host-budget drift hits both arms equally — the only
  * trustworthy way to attribute a per-query delta to a session conf
  * on this container (PERF.md §1). Confs must be runtime-settable
  * (spark.sql.* session confs are).
  *
  * Usage: AbQ <k=v[;k=v]> <query...>   (arm B = the given confs,
  * arm A = the session defaults; 4 interleaved passes — the EVEN
  * count is load-bearing, the per-pass order alternation only
  * cancels the codegen-compile-skip bias when each arm takes the
  * favored second slot equally often; min per arm).
  *
  * NOT VALID for persist/cache toggles (round 16, PERF.md §1h):
  * CacheManager substitutes any cached canonical plan into BOTH
  * arms, so the no-persist arm silently reads the persist arm's
  * cache and B/A reads 1.00 regardless of the real effect. Measure
  * persistence changes with a decomposition probe (time the
  * non-persisted subplan before any persist-on execution) plus
  * steady-state TimeQ against record-normalized controls.
  */
object AbQ {
  def main(args: Array[String]): Unit = {
    // Bench session shape via HarnessConf (VERDICT r15 #4): an A/B
    // under a DIFFERENT broadcast threshold or codegen cache would
    // measure plans the bench never runs; the surface-sized codegen
    // cache also shrinks the compile-skip order bias the pass
    // alternation exists to cancel — both arms hit warm classes
    val spark = graft.HarnessConf(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val confs = args(0).split(";").map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }.toSeq
    val names = args.drop(1).toSeq
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // arm A must restore the session's PRIOR value, not unset(): for a
    // builder-set conf (e.g. shuffle.partitions=32) unset falls back to
    // the GLOBAL default (200), silently benchmarking the wrong arm
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    def setB(): Unit = confs.foreach { case (k, v) => spark.conf.set(k, v) }
    def setA(): Unit = prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    // warmup both arms
    names.foreach { n =>
      setA(); graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      setB(); graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      setA(); graft.SparkEntry.queries(n)(spark, sf).count()
      setB(); graft.SparkEntry.queries(n)(spark, sf).count()
    }
    val mins = scala.collection.mutable.Map[(String, String), Double]()
    // ALTERNATE the arm order per pass (round 14): the second
    // consecutive execution of an IDENTICAL query skips whole-stage
    // codegen compilation (CodeGenerator's class cache hits on the
    // same generated source), so a fixed A-then-B order hands arm B a
    // ~2x head start — a null test (B == A's value) read B/A = 0.51.
    // With the order alternating and an even pass count, each arm
    // takes the favored second slot equally and the min cancels the
    // bias.
    (1 to 4).foreach { p =>
      names.foreach { n =>
        val arms = Seq("A" -> setA _, "B" -> setB _)
        (if (p % 2 == 1) arms else arms.reverse).foreach { case (arm, set) =>
          set()
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(n)(spark, sf).count()
          val dt = (System.nanoTime() - t0) / 1e9
          val k = (n, arm)
          mins(k) = math.min(mins.getOrElse(k, Double.MaxValue), dt)
        }
      }
    }
    names.foreach { n =>
      val a = mins((n, "A")); val b = mins((n, "B"))
      println(f"$n%-32s A=$a%6.3f B=$b%6.3f B/A=${b / a}%5.2f")
    }
    val ta = names.map(n => mins((n, "A"))).sum
    val tb = names.map(n => mins((n, "B"))).sum
    println(f"TOTAL A=$ta%7.2f B=$tb%7.2f B/A=${tb / ta}%5.2f")
    spark.stop()
  }
}
