package graft

import org.apache.spark.sql.functions._

/** Round-10 batch 4 invariants + naive-recomputation differentials:
  * the zone-map layout audit (q300), EB shrinkage (q301), the
  * jackknife ratio (q302), Simpson diversity (q303), and RBO (q304).
  */
class LayoutRankSpec extends SparkSpec {

  test("q300 layout audit: date-sorted never skips fewer files, scan covers selection") {
    val rows = Queries67.q300(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 6)
    rows.foreach { case (_, pred, nf, nsk, scanned, selected) =>
      assert(nsk >= 0 && nsk <= nf, s"$pred: skipped out of range")
      assert(scanned >= selected, s"$pred: scan must cover the selection")
    }
    val byPred = rows.groupBy(_._2)
    byPred.foreach { case (pred, ps) =>
      val ins = ps.find(_._1 == "insert_order").get
      val dt = ps.find(_._1 == "date_sorted").get
      assert(dt._4 >= ins._4,
        s"$pred: date-sorted must skip at least as many files " +
          s"(dt=${dt._4} ins=${ins._4})")
    }
  }

  test("q300 date-sorted arm == brute-force sorted-file simulation") {
    val us = Tables.orders(spark, sf)
      .select(unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val fr = Queries67.fileRows
    val want = Queries67.predGrid.map { case (pred, lo, hi) =>
      val files = us.map(_._1).grouped(fr.toInt).toArray
      val scanned = files.count(f => f.last >= lo && f.head < hi)
      pred -> ((files.length.toLong, files.length - scanned.toLong))
    }.toMap
    val got = Queries67.q300(spark, sf).collect()
      .filter(_.getString(0) == "date_sorted")
      .map(r => (r.getString(1), (r.getLong(2), r.getLong(3)))).toMap
    Queries67.predGrid.foreach { case (pred, _, _) =>
      val (nf, nsk) = got(pred)
      val (wf, wsk) = want(pred)
      assert(nf == wf && nsk == wsk,
        s"$pred: got ($nf,$nsk) want ($wf,$wsk)")
    }
  }

  test("q301 shrinkage: weights in [0,1], shrunk mean between raw and grand") {
    val rows = Queries67.q301(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val grand = rows.map(t => t._2 * t._1).sum / rows.map(_._1).sum
    rows.foreach { case (_, raw, b, shrunk) =>
      assert(b >= 0.0 && b <= 1.0, s"weight $b out of [0,1]")
      val lo = math.min(raw, grand) - 0.02
      val hi = math.max(raw, grand) + 0.02
      assert(shrunk >= lo && shrunk <= hi,
        s"shrunk $shrunk outside [$lo,$hi] (raw=$raw grand=$grand)")
    }
    // larger groups shrink less (weights non-decreasing in n)
    val byN = rows.sortBy(_._1)
    byN.sliding(2).foreach {
      case Array((n1, _, b1, _), (n2, _, b2, _)) =>
        if (n2 > n1) assert(b2 >= b1 - 1e-9,
          s"B must be monotone in n: n=$n1→$n2 B=$b1→$b2")
      case _ => ()
    }
  }

  test("q302 jackknife == scala LOO replay from the cohort cells") {
    val cells = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(pmod(col("user_id"), lit(10L)).as("cohort"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("cg"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("pg"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val cAll = cells.map(_._1).sum
    val pAll = cells.map(_._2).sum
    val rgs = cells.filter(t => cAll - t._1 > 0).map { case (cg, pg) =>
      BigDecimal((pAll - pg).toDouble / (cAll - cg).toDouble)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rbar = rgs.sum / rgs.length
    val se = math.sqrt((rgs.length - 1).toDouble / rgs.length *
      rgs.map(r => math.pow(r - rbar, 2)).sum)
    val row = Queries67.q302(spark, sf).collect().head
    assert(row.getLong(0) == rgs.length)
    assert(math.abs(row.getDouble(4) - rbar) < 1e-5, "jk_mean drift")
    assert(math.abs(row.getDouble(5) - se) < 1e-5, "jk_se drift")
    assert(row.getDouble(7) <= row.getDouble(3) &&
      row.getDouble(3) <= row.getDouble(8), "CI must bracket the ratio")
  }

  test("q303 simpson: bounds and scala recomputation on one source") {
    val rows = Queries67.q303(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val simpson = r.getDouble(3)
      assert(simpson >= 0.0 && simpson <= 1.0)
      if (!r.isNullAt(4))
        assert(r.getDouble(4) >= 1.0 - 1e-9, "effective vocab >= 1")
    }
    val src = rows.head.getString(0)
    val toks = Tables.documents(spark, sf)
      .filter(col("source") === src)
      .select(explode(expr("filter(split(text, ' '), w -> length(w) > 0)")))
      .collect().map(_.getString(0))
    val counts = toks.groupBy(identity).map(_._2.size.toLong)
    val n = counts.sum
    val pair2 = counts.map(c => c * (c - 1)).sum
    val want = pair2.toDouble / (n.toDouble * (n - 1).toDouble)
    assert(math.abs(rows.head.getDouble(3) - want) < 1e-7,
      s"simpson drift: got ${rows.head.getDouble(3)} want $want")
    assert(rows.head.getLong(1) == n && rows.head.getLong(2) == counts.size)
  }

  test("q304 RBO: overlap/agreement bounds, cumulative monotone, grid sane") {
    val rows = Queries67.q304(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == Queries67.rboDepth)
    rows.foreach { case (d, ov, ag, _) =>
      assert(ov >= 0 && ov <= d, s"overlap $ov out of [0,$d]")
      assert(ag >= 0.0 && ag <= 1.0)
    }
    rows.sliding(2).foreach {
      case Array((_, o1, _, r1), (_, o2, _, r2)) =>
        assert(o2 >= o1, "top-d overlap is monotone in d")
        assert(r2 >= r1 - 1e-9, "cumulative RBO is monotone")
      case _ => ()
    }
    assert(rows.last._4 <= 1.0 + 1e-9)
    // the literal grid is the Webber weights: positive, decreasing
    val w = Queries67.rboWeightE8
    assert(w.forall(_ > 0L) && w.sliding(2).forall(p => p(1) <= p(0)))
  }
}
