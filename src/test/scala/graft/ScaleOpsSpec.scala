package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Skew}

/** As-of join, skew salting, and bucketed co-located joins — the
  * cluster-scale operator family.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before left.ts") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100.0),
      (1L, ts("2024-01-01 10:00:30"), 101.0),
      (2L, ts("2024-01-01 10:00:10"), 55.0)
    ).toDF("sym", "ts", "px")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 99.5),
      (1L, ts("2024-01-01 10:00:20"), 100.5),
      (1L, ts("2024-01-01 10:00:30"), 100.9), // equal ts → matches
      (2L, ts("2024-01-01 10:00:15"), 54.0)   // after the trade → no match
    ).toDF("sym", "qts", "bid")
    val out = AsOf.join(trades, quotes, "sym", "ts", "qts", Seq("bid"))
      .orderBy($"sym", $"ts")
    val rows = out.collect()
    assert(rows(0).getAs[Double]("bid") == 99.5)   // 10:00:05 → 10:00:00 quote
    assert(rows(1).getAs[Double]("bid") == 100.9)  // 10:00:30 → equal-ts quote
    assert(rows(2).isNullAt(rows(2).fieldIndex("bid"))) // no quote ≤ 10:00:10
  }

  test("forward as-of join picks the earliest right row at or after left.ts") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100.0),
      (1L, ts("2024-01-01 10:00:30"), 101.0),
      (2L, ts("2024-01-01 10:00:20"), 55.0)
    ).toDF("sym", "ts", "px")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:10"), 99.5),
      (1L, ts("2024-01-01 10:00:30"), 100.9), // equal ts → matches
      (1L, ts("2024-01-01 10:00:50"), 101.5),
      (2L, ts("2024-01-01 10:00:10"), 54.0)   // before the trade → no match
    ).toDF("sym", "qts", "bid")
    val out = AsOf.join(trades, quotes, "sym", "ts", "qts", Seq("bid"),
      forward = true).orderBy($"sym", $"ts")
    val rows = out.collect()
    assert(rows(0).getAs[Double]("bid") == 99.5)   // 10:00:05 → next at 10:00:10
    assert(rows(1).getAs[Double]("bid") == 100.9)  // 10:00:30 → equal-ts quote
    assert(rows(2).isNullAt(rows(2).fieldIndex("bid"))) // no quote ≥ 10:00:20
  }

  test("forward as-of tolerance nulls out too-distant future matches") {
    val l = Seq((1L, ts("2024-01-01 09:00:00"), "x")).toDF("k", "ts", "v")
    val r = Seq((1L, ts("2024-01-01 12:00:00"), 7.0)).toDF("k", "rts", "m")
    val strict = AsOf.join(l, r, "k", "ts", "rts", Seq("m"),
      toleranceSec = 60, forward = true)
    assert(strict.head().isNullAt(strict.head().fieldIndex("m")))
    val loose = AsOf.join(l, r, "k", "ts", "rts", Seq("m"),
      toleranceSec = 4 * 3600, forward = true)
    assert(loose.head().getAs[Double]("m") == 7.0)
  }

  test("as-of join tolerance nulls out stale matches") {
    val l = Seq((1L, ts("2024-01-01 12:00:00"), "x")).toDF("k", "ts", "v")
    val r = Seq((1L, ts("2024-01-01 09:00:00"), 7.0)).toDF("k", "rts", "m")
    val strict = AsOf.join(l, r, "k", "ts", "rts", Seq("m"), toleranceSec = 60)
    assert(strict.head().isNullAt(strict.head().fieldIndex("m")))
    val loose = AsOf.join(l, r, "k", "ts", "rts", Seq("m"), toleranceSec = 4 * 3600)
    assert(loose.head().getAs[Double]("m") == 7.0)
  }

  test("as-of join carries the matched row atomically (NULL payloads stay NULL)") {
    val l = Seq((1L, ts("2024-01-01 00:30:00"), "ev")).toDF("k", "ts", "v")
    val r = Seq(
      (1L, ts("2024-01-01 00:10:00"), Some(7.0)),
      (1L, ts("2024-01-01 00:20:00"), Option.empty[Double]) // matched row, NULL payload
    ).toDF("k", "rts", "m")
    val out = AsOf.join(l, r, "k", "ts", "rts", Seq("m")).head()
    assert(out.getAs[java.sql.Timestamp]("matched_ts") ==
      ts("2024-01-01 00:20:00"))
    assert(out.isNullAt(out.fieldIndex("m")), "NULL payload must not fall back to older row")
  }

  test("chunkedSessionize == plain window sessionization across chunk sizes") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, sf)
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val plain = e
      .withColumn("gap",
        $"ts".cast("double") - lag($"ts".cast("double"), 1).over(byUser))
      .withColumn("is_new",
        when($"gap".isNull || $"gap" > 1800, 1).otherwise(0))
      .withColumn("session_id",
        sum($"is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .select($"event_id", $"session_id")
      .as[(Long, Long)].collect().toMap
    // chunk smaller than the gap, comparable, and far larger — the
    // stitch logic must be invisible at every granularity
    for (chunkSec <- Seq(600L, 3600L, 6L * 3600L, 7L * 24L * 3600L)) {
      val chunked = Skew.chunkedSessionize(e, "user_id", "ts", "event_id",
          gapSec = 1800.0, chunkSec = chunkSec)
        .select($"event_id", $"session_id").as[(Long, Long)].collect().toMap
      assert(chunked == plain, s"chunkSec=$chunkSec: ${
        chunked.toSet.diff(plain.toSet).take(5)} vs ${
        plain.toSet.diff(chunked.toSet).take(5)}")
    }
  }

  test("chunkedSessionize: transitive stitch, empty chunks, boundary-equal gap") {
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z").toEpochMilli
    def at(min: Long) = new java.sql.Timestamp(base + min * 60000L)
    val df = Seq(
      // user 1: one session of 13 events every 25 min — spans ~10
      // half-hour chunks, every boundary must merge transitively
      (0 until 13).map(i => (1L, 100L + i, at(25L * i))),
      // user 2: burst, then a gap of EXACTLY 1800s (same session —
      // strict >), then a gap of 1801s (new session) after several
      // empty chunks
      Seq((2L, 200L, at(0)), (2L, 201L, at(30)),
        (2L, 202L, at(30 + 300)), // 300 min later: new session
        (2L, 203L, at(30 + 300 + 30))), // exactly 1800s: same session
      // user 3: a single event (singleton session)
      Seq((3L, 300L, at(7)))
    ).flatten.toDF("user_id", "event_id", "ts")
    val out = Skew.chunkedSessionize(df, "user_id", "ts", "event_id",
        gapSec = 1800.0, chunkSec = 1800L)
      .select($"user_id", $"event_id", $"session_id")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    (0 until 13).foreach(i => assert(out((1L, 100L + i)) == 1L,
      s"user 1 event $i should stay in session 1, got ${out((1L, 100L + i))}"))
    assert(out((2L, 200L)) == 1L && out((2L, 201L)) == 1L)
    assert(out((2L, 202L)) == 2L, "gap > 1800s must open a session")
    assert(out((2L, 203L)) == 2L, "gap == 1800s must NOT open a session")
    assert(out((3L, 300L)) == 1L)
  }

  test("q102 df cap: boilerplate shingles stop proposing pairs, sizes stay uncapped") {
    import graft.operators.Dedup
    // 6 docs sharing one boilerplate trigram (df=6 > cap) + 2 docs
    // that are genuine near-dups through low-df shingles
    val boiler = "this document is copyright protected all rights reserved"
    val docs = (
      (0 until 6).map(i => (i.toLong, s"$boiler unique$i wa$i wb$i wc$i wd$i we$i wf$i")) ++
      Seq((10L, "alpha beta gamma delta epsilon zeta"),
          (11L, "alpha beta gamma delta epsilon eta"))
    ).toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardPairs(docs, $"text", $"doc_id",
        n = 3, minJaccard = 0.1, maxDf = 5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val uncapped = Dedup.ngramJaccardPairs(docs, $"text", $"doc_id",
        n = 3, minJaccard = 0.1, maxDf = 0)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(capped.contains((10L, 11L)), "low-df near-dup pair must survive the cap")
    assert(!capped.exists { case (a, b) => a < 6 && b < 6 },
      s"boilerplate-only pairs must be pruned by the cap: $capped")
    assert(uncapped.exists { case (a, b) => a < 6 && b < 6 },
      "without the cap the boilerplate trigram pairs the template docs")
  }

  test("salted stats == direct stats (skewed key)") {
    val e = Tables.events(spark, sf)
    val direct = e.groupBy($"event_type".as("key"))
      .agg(count(lit(1)).as("n"), sum($"value").as("sum"),
        min($"value").as("min"), max($"value").as("max"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.saltedStats(e, $"event_type", $"event_id", $"value", 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, (n, s, mn, mx)) =>
      val (n2, s2, mn2, mx2) = salted(k)
      assert(n == n2 && mn == mn2 && mx == mx2)
      assert(math.abs(s - s2) < 1e-6 * math.abs(s))
    }
  }

  test("salted join == plain join") {
    val e = Tables.events(spark, sf).limit(500)
    val dim = Seq(("click", 1), ("view", 2), ("purchase", 3), ("error", 4),
      ("signup", 5)).toDF("event_type", "weight")
    val plain = e.join(dim, "event_type").agg(sum($"weight" * $"value")).head().getDouble(0)
    val salted = Skew.saltedJoin(e, dim, "event_type", $"event_id", 4)
      .agg(sum($"weight" * $"value")).head().getDouble(0)
    assert(math.abs(plain - salted) < 1e-6 * math.abs(plain))
  }

  test("IVF ANN: bucket-restricted search approximates brute force") {
    import graft.operators.Ann
    val emb = Tables.embeddings(spark, sf)
    val probe = emb.filter($"vec_id" === 0).select($"embedding".as("probe_emb"))
    val scan = emb.filter($"vec_id" =!= 0)
    val exact = Ann.bruteForceTopK(scan, "vec_id", "embedding", probe, 10)
      .collect().map(_.getLong(0)).toSet
    // probing ALL centroids must recover brute force exactly
    val full = Ann.ivfTopK(scan, "vec_id", "embedding", probe,
      k = 10, nCentroids = 8, nProbe = 8)
      .collect().map(_.getLong(0)).toSet
    assert(full == exact)
    // probing 4 of 8 centroids: a valid top-10 with decent overlap
    val approx = Ann.ivfTopK(scan, "vec_id", "embedding", probe,
      k = 10, nCentroids = 8, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(approx.size == 10)
    assert((approx & exact).size >= 3, s"IVF recall collapsed: ${(approx & exact).size}/10")
  }

  test("simhash bit-band bucketed pairs == brute-force pairs (banding invariance)") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val banded = Dedup.simhashPairs(docs, $"text", $"doc_id",
      bits = 48, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sh = Dedup.simhashPacked(docs, $"text", $"doc_id", 48)
    val a = sh.select($"doc_id".as("a_id"), $"sh".as("a_sh"))
    val b = sh.select($"doc_id".as("b_id"), $"sh".as("b_sh"))
    val brute = a.join(b, $"a_id" < $"b_id")
      .withColumn("hamming", bit_count($"a_sh".bitwiseXOR($"b_sh")))
      .filter($"hamming" <= 3)
      .select($"a_id", $"b_id", $"hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute,
      s"banded\\brute=${banded -- brute}, brute\\banded=${brute -- banded}")
    assert(brute.nonEmpty, "expected planted near-dups to pair at 48 bits")
  }

  test("simhash banding invariance holds on adversarial random corpora (multiple parameterizations)") {
    import graft.operators.Dedup
    // seeded corpus with engineered near-dup clones: base docs plus
    // copies with k in-place token substitutions — small Hamming
    // distances by construction, the regime where a banding bug
    // (off-by-one band split, missed pigeonhole case) would hide
    val rng = new scala.util.Random(77L)
    val vocab = Vector.tabulate(200)(i => s"w$i")
    def doc(): Array[String] = Array.fill(30 + rng.nextInt(40))(vocab(rng.nextInt(vocab.size)))
    val bases = Seq.fill(25)(doc())
    val clones = bases.flatMap { b =>
      (1 to 2).map { k =>
        val c = b.clone()
        (0 until k).foreach(_ => c(rng.nextInt(c.length)) = vocab(rng.nextInt(vocab.size)))
        c
      }
    }
    val docs = (bases ++ clones).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    for ((bits, bands, maxH) <- Seq((48, 4, 3), (48, 6, 5), (60, 4, 3), (24, 3, 2))) {
      val banded = Dedup.simhashPairs(docs, $"text", $"doc_id", bits, bands, maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sh = Dedup.simhashPacked(docs, $"text", $"doc_id", bits)
      val a = sh.select($"doc_id".as("a_id"), $"sh".as("a_sh"))
      val b = sh.select($"doc_id".as("b_id"), $"sh".as("b_sh"))
      val brute = a.join(b, $"a_id" < $"b_id")
        .withColumn("h", bit_count($"a_sh".bitwiseXOR($"b_sh")))
        .filter($"h" <= maxH)
        .select($"a_id", $"b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded == brute, s"($bits,$bands,$maxH): banded != brute")
      assert(brute.nonEmpty, s"($bits,$bands,$maxH): clones should pair")
    }
  }

  test("q38/q67: (label × LSH bucket) multi-probe == plain label blocking ∩ Hamming ≤ 1") {
    import graft.operators.Ann
    // driver-side ground truth over the full sf0.001 table (500 rows):
    // the composed block must find exactly the plain label-blocked
    // pairs whose hyperplane buckets are within Hamming distance 1
    // (= the depth-1 probeVariants neighborhood)
    val rows = Tables.embeddings(spark, sf)
      .withColumn("bucket", Ann.lshBucket($"embedding", Queries4.Hps))
      .select($"vec_id", $"label", $"bucket", $"embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getSeq[Float](3).map(_.toDouble).toArray))
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def ham(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    val expected38 = (for {
      i <- rows.indices; j <- (i + 1) until rows.length
      if rows(i)._2 == rows(j)._2 && ham(rows(i)._3, rows(j)._3) <= 1
      if cos(rows(i)._4, rows(j)._4) >= 0.4
    } yield (rows(i)._1, rows(j)._1)).toSet
    val got38 = QueriesExt.q38(spark, sf)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(got38 == expected38,
      s"got\\exp=${got38 -- expected38}, exp\\got=${expected38 -- got38}")
    assert(got38.nonEmpty, "multi-probe should recall threshold pairs at depth 1")

    val expected67 = rows.flatMap { q =>
      rows.filter(n => n._1 != q._1 && n._2 == q._2 && ham(n._3, q._3) <= 1)
        .map(n => (n._1, cos(q._4, n._4)))
        .sortBy { case (nid, c) => (-c, nid) }
        .take(3).zipWithIndex
        .map { case ((nid, _), k) => (q._1, k + 1, nid) }
    }.toSet
    val got67 = Queries2.q67(spark, sf)
      .select($"q_id", $"rk", $"n_id").as[(Long, Int, Long)].collect().toSet
    assert(got67 == expected67,
      s"got\\exp=${got67 -- expected67}, exp\\got=${expected67 -- got67}")
    assert(got67.nonEmpty)
  }

  test("lshLookup finds a planted cross-side duplicate, never within-side pairs") {
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // clone of 1
      (11L, "completely different words nothing shared here at all today friend")
    ).toDF("doc_id", "text")
    val cand = Dedup.lshLookup(corpus, incoming, $"text", $"doc_id",
      n = 3, bands = 4, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((10L, 1L)), s"planted cross-side dup missed: $cand")
    assert(cand.forall { case (in, ex) => in >= 10L && ex < 10L },
      s"pair sides mixed up: $cand")
  }

  test("partition pruning: lake reads touch only the filtered partition") {
    val out = "/root/repo/target/lake/prune_test"
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val q = spark.read.parquet(out).filter($"event_type" === "click")
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.contains("event_type"), s"no partition filter in:\n$planStr")
    val clicks = q.count()
    val all = spark.read.parquet(out).count()
    assert(clicks > 0 && clicks < all)
  }

  test("bucketed tables join without an exchange (co-located join)") {
    // warehouse.dir is static config — bucketed tables land in the
    // default ./spark-warehouse (gitignored), dropped in finally
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val c = Tables.customer(spark, sf)
      val o = Tables.orders(spark, sf)
      c.write.mode("overwrite").bucketBy(4, "c_custkey")
        .sortBy("c_custkey").saveAsTable("cust_b")
      o.write.mode("overwrite").bucketBy(4, "o_custkey")
        .sortBy("o_custkey").saveAsTable("ord_b")
      val joined = spark.table("cust_b")
        .join(spark.table("ord_b"),
          col("c_custkey") === col("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // bucketing on both join keys → no shuffle exchange in the plan
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in bucketed join plan:\n$plan")
      assert(joined.count() == o.count()) // every order has a customer
    } finally {
      spark.sql("DROP TABLE IF EXISTS cust_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("TopKByLen aggregator is partitioning-invariant and == the window form") {
    import graft.functions.TypedAggs
    import spark.implicits._
    // the bounded insert-and-trim fold must produce the same top-3
    // whatever the partitioning (merge associativity/commutativity),
    // and q151 must equal q129's row_number() window semantics
    def run(np: Int): Seq[(String, Long, Long, Int)] =
      Tables.documents(spark, sf)
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .repartition(np)
        .as[TypedAggs.DocRow]
        .groupByKey(_.lang)
        .agg(new TypedAggs.TopKByLen(3).toColumn.name("top"))
        .toDF("lang", "top")
        .select(col("lang"), posexplode(col("top.items")).as(Seq("pos", "p")))
        .collect()
        .map(r => (r.getString(0), r.getStruct(2).getLong(0),
          r.getStruct(2).getLong(1), r.getInt(1) + 1))
        .sortBy(t => (t._1, t._4)).toSeq
    val variants = Seq(1, 7, 32).map(run)
    assert(variants.forall(_ == variants.head),
      "partitioning changed the bounded top-k fold")
    val window = Queries9.q129(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    assert(variants.head == window,
      s"aggregator top-k != window top-k")
  }

  test("rateCap: planted hot key bounded to k, cold keys untouched, partition-invariant") {
    // one runaway key with 5000 rows, 50 cold keys with ≤ 20 each
    val rows = (1 to 5000).map(i => (999L, i.toLong)) ++
      (1 to 50).flatMap(k => (1 to (k % 20) + 1).map(i =>
        (k.toLong, (100000 + k * 100 + i).toLong)))
    val df = rows.toDF("key", "id")
      .withColumn("prio",
        graft.functions.Text.md5Long($"id".cast("string")))
    def kept(parts: Int): Set[(Long, Long)] =
      Skew.rateCap(df.repartition(parts), $"key", $"prio", $"id", 30)
        .select($"key", $"id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val k1 = kept(1)
    // (a) the hot key is bounded to exactly k
    assert(k1.count(_._1 == 999L) == 30)
    // (b) cold keys (all under the cap) pass through complete
    val cold = rows.filter(_._1 != 999L).toSet
    assert(cold.subsetOf(k1))
    // (c) the kept SET is invariant under input partitioning — the
    // md5 priority, not arrival order, decides survival
    assert(kept(8) == k1 && kept(32) == k1)
  }
}
