package graft

import org.apache.spark.sql.functions._

/** Round-8 operators: Jaro-Winkler kernel golden values, skyline
  * equivalence vs brute force, greedy-selection invariants, LPA
  * determinism, interval-union bounds, and plan shapes for the new
  * queries. Value-level correctness is the DuckDB gate's job; these
  * specs pin the kernel semantics and the structural claims the
  * Scaladocs make.
  */
class LinkageSpec extends SparkSpec {
  import graft.functions.Linkage

  test("jaroWinkler matches the published test vectors (DuckDB-verified)") {
    // golden values probed from duckdb jaro_winkler_similarity — the
    // same engine the q217 oracle runs, so these pin cross-engine parity
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dwayne", "duane", 0.8400000000000001),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("cold widget", "cold widgets", 0.9833333333333333),
      ("cold widget", "cold rod", 0.8590909090909091),
      ("small widget", "large widget", 0.7962962962962963), // jaro>0.7 but prefix 0
      ("crate", "trace", 0.7333333333333334), // >0.7, prefix 0 → unboosted
      ("abqqqqqq", "abzzzzzz", 0.5), // jaro ≤ 0.7 → boost suppressed
      ("ab", "ba", 0.0), // window floor: no matches
      ("x", "xy", 0.8500000000000001),
      ("a", "a", 1.0),
      ("abc", "", 0.0),
      ("", "", 0.0)) // duckdb: empty strings score 0, not 1
    for ((a, b, want) <- cases) {
      val got = Linkage.jaroWinkler(a, b)
      assert(math.abs(got - want) < 1e-15, s"jw($a, $b) = $got, want $want")
      assert(math.abs(Linkage.jaroWinkler(b, a) - want) < 1e-15, "symmetry")
    }
  }

  test("jaroWinkler expression evaluates in a DataFrame (both eval paths)") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("ab", "ba")).toDF("a", "b")
      .select(round(Linkage.jaro_winkler(col("a"), col("b")), 4).as("jw"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.9611, 0.0))
  }

  test("q219 skyline ≡ brute-force dominance filter") {
    val rows = Tables.part(spark, sf)
      .select("p_partkey", "p_retailprice", "p_size")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = rows.filterNot { case (_, pr, sz) =>
      rows.exists { case (_, qr, qs) =>
        qr <= pr && qs <= sz && (qr < pr || qs < sz)
      }
    }.map(_._1).toSet
    val got = Queries38.q219(spark, sf).select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    assert(got == brute, s"skyline mismatch: got $got want $brute")
  }

  test("q220 greedy gains are non-increasing and coverage accumulates exactly") {
    val rows = Queries39.q220(spark, sf).collect()
    assert(rows.length == 3)
    val gains = rows.map(_.getAs[Long]("gain"))
    assert(gains.sliding(2).forall(p => p(0) >= p(1)),
      s"greedy gain must be non-increasing: ${gains.toSeq}")
    val covered = rows.map(_.getAs[Long]("covered_total"))
    // covered_total after step k = Σ gains so far (each gain counts
    // exactly the NEW units) — the defining invariant of greedy cover
    assert(covered.toSeq == gains.scanLeft(0L)(_ + _).tail.toSeq)
  }

  test("q221 MMR: the first pick is the relevance argmax, later scores are penalized") {
    val rows = Queries39.q221(spark, sf).collect()
    assert(rows.length == 3)
    val first = rows.find(_.getAs[Int]("step") == 1).get
    assert(first.getAs[Double]("score") <= first.getAs[Double]("rel"))
    // step-1 winner has the max rel of all three (greedy on pure rel)
    assert(rows.forall(r => r.getAs[Double]("rel") <= first.getAs[Double]("rel")))
  }

  test("q222 LPA is deterministic and communities are disjointly counted") {
    val a = Queries40.q222(spark, sf).collect()
    val b = Queries40.q222(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "synchronous LPA must be deterministic")
    val nParts = Tables.part(spark, sf).count()
    val inCommunities = a.map(_.getAs[Long]("n_members")).sum
    assert(inCommunities <= nParts)
    assert(a.forall(_.getAs[Long]("n_members") >= 2))
  }

  test("q223 interval union: coverage bounded by raw interval sum, ≥ longest") {
    val rows = Queries40.q223(spark, sf).collect()
    assert(rows.nonEmpty)
    val perUserEvents = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (u, n, cov, longest) = (r.getLong(0), r.getLong(1),
        r.getAs[Long]("covered_us"), r.getAs[Long]("longest_us"))
      assert(cov <= perUserEvents(u) * 300000000L,
        s"user $u union exceeds sum of raw intervals")
      assert(cov >= longest && longest >= 300000000L && n >= 1)
    }
  }

  test("plans: q217 joins on the block key (no cartesian); q223 shuffles once") {
    val jw = Queries38.q217(spark, sf)
    jw.count()
    assert(PlanCheck.hasAnyJoin(jw) && !PlanCheck.hasCartesian(jw) &&
      !PlanCheck.hasNestedLoop(jw),
      "blocked linkage must be an equi-join on the block key")
    val iu = Queries40.q223(spark, sf)
    iu.count()
    // windows + both aggregates share the user_id hash partitioning:
    // exactly one data shuffle feeds the whole pipeline (plus the
    // final presentation sort's range exchange)
    assert(PlanCheck.hasWindow(iu))
    val hashShuffles = PlanCheck.shufflePartitionings(iu).count {
      case _: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning => true
      case _ => false
    }
    assert(hashShuffles == 1,
      s"interval union should hash-shuffle exactly once, saw $hashShuffles")
  }
}
