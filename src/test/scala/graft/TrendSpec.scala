package graft

import org.apache.spark.sql.functions._

/** Round-8 batch 5 invariants: the Holt fold against an independent
  * Scala recomputation, Benford bookkeeping, and RRF structure.
  */
class TrendSpec extends SparkSpec {

  test("q224 Holt state matches an independent Scala fold of the daily series") {
    val daily = Tables.events(spark, sf)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(round(sum(col("value").cast("decimal(38,10)")), 4)
        .cast("double").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = daily.groupBy(_._1).map { case (tpe, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      var l = xs.head; var b = 0.0
      xs.tail.foreach { x =>
        val nl = 0.25 * x + 0.75 * (l + b)
        b = 0.125 * (nl - l) + 0.875 * b
        l = nl
      }
      tpe -> ((xs.length, math.rint(l * 1e4) / 1e4, math.rint(b * 1e4) / 1e4))
    }
    val got = Queries41.q224(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (tpe, (n, l, b)) =>
      val (gn, gl, gb) = got(tpe)
      assert(gn == n, s"$tpe n_days")
      // rint is half-even vs round's half-up; allow the grid step
      assert(math.abs(gl - l) <= 1e-4 + 1e-12, s"$tpe level $gl vs $l")
      assert(math.abs(gb - b) <= 1e-4 + 1e-12, s"$tpe trend $gb vs $b")
    }
  }

  test("q225 Benford: digits 1-9, counts sum to |orders|, shares sum to ~1") {
    val rows = Queries41.q225(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf((1 to 9).map(_.toString).toSet))
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 0.001, s"shares sum $shareSum")
    // Benford expectations are fixed constants
    val ben = rows.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(ben.get("1").forall(_ == 0.3010) && ben.get("9").forall(_ == 0.0458))
  }

  test("q226 RRF: every fused doc comes from an arm; both-arm docs counted once per arm") {
    val lex = Queries10.q131(spark, sf).collect().map(_.getLong(0)).toSet
    val vec = Queries.q29(spark, sf).collect().map(_.getLong(0)).toSet
    val rows = Queries41.q226(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (id, rrf, arms) = (r.getLong(0), r.getDouble(1), r.getLong(2))
      val expectArms = (if (lex(id)) 1 else 0) + (if (vec(id)) 1 else 0)
      assert(arms == expectArms, s"doc $id arms $arms != $expectArms")
      assert(rrf > 0.0 && rrf <= 2.0 / 61.0 + 1e-9)
    }
  }

  test("q227 OLS: r2 in [0,1]; slope sign agrees with a direct covariance check") {
    val rows = Queries42.q227(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"r2 out of range: $r2")
    }
    // recompute slope sign independently for one type
    val daily = Tables.events(spark, sf)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .count().collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    rows.foreach { r =>
      val xs = byType(r.getString(0)).sortBy(_._2).map(_._3.toDouble)
      val ts = xs.indices.map(_.toDouble)
      val n = xs.length
      val cov = ts.zip(xs).map { case (a, b) => a * b }.sum / n -
        (ts.sum / n) * (xs.sum / n)
      assert(math.signum(cov) == math.signum(r.getAs[Double]("slope")) ||
        math.abs(r.getAs[Double]("slope")) < 1e-6)
    }
  }

  test("q228 Wilson: bound is below the raw rate and ordering is by the bound") {
    val rows = Queries42.q228(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("wilson_lb") <= r.getAs[Double]("rate") + 1e-9)
      assert(r.getAs[Double]("wilson_lb") >= 0.0)
    }
    val bounds = rows.map(_.getAs[Double]("wilson_lb"))
    assert(bounds.sliding(2).forall(p => p(0) >= p(1)), "not sorted by bound")
  }

  test("q229 CUSUM: alerts exceed 2 sigma and fire on every sf fixture") {
    val rows = Queries42.q229(spark, sf).collect()
    assert(rows.nonEmpty, "vacuous CUSUM: no alerts at sf0.001")
    rows.foreach { r =>
      assert(r.getAs[Double]("cusum") > 2.0 * r.getAs[Double]("sd") - 1e-6)
    }
  }

  test("plans: round-8 analytics keep the declared shapes") {
    // q219: price-group running minima ride a broadcast join-back;
    // the quadratic NOT-EXISTS never appears as a cartesian
    val sky = Queries38.q219(spark, sf); sky.count()
    assert(PlanCheck.hasBroadcastExchange(sky) && !PlanCheck.hasCartesian(sky))
    // q226: the fused ranking ends in a TakeOrdered, not a global sort
    val rrf = Queries41.q226(spark, sf); rrf.count()
    assert(PlanCheck.hasTakeOrdered(rrf))
    // q227/q230: regression moments are aggregates/windows — no join
    val ols = Queries42.q227(spark, sf); ols.count()
    assert(!PlanCheck.hasAnyJoin(ols) && PlanCheck.hasWindow(ols))
    val roll = Queries43.q230(spark, sf); roll.count()
    assert(!PlanCheck.hasAnyJoin(roll) && PlanCheck.hasWindow(roll))
    // q231: the 1-row total rides a broadcast (the accepted
    // scalar-subquery shape); at most that one nested-loop appears
    val alloc = Queries43.q231(spark, sf); alloc.count()
    assert(PlanCheck.hasBroadcastExchange(alloc))
    assert(PlanCheck.collect[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec](alloc).size <= 1)
    assert(!PlanCheck.hasCartesian(alloc))
    // q232: the day-pair sum joins key-local on event_type — equi, never cartesian
    val mk = Queries44.q232(spark, sf); mk.count()
    assert(PlanCheck.hasAnyJoin(mk) && !PlanCheck.hasCartesian(mk) &&
      !PlanCheck.hasNestedLoop(mk))
  }
}
