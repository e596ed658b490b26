package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Recall measurement for the approximate similarity-search paths —
  * an ANN engine without a recall number is an unquantified
  * approximation. Ground truth is bruteForceTopK; recall@10 is
  * measured over several probe vectors at sf0.01 (500 × 64-dim), for
  * the multi-probe depth ladder and for IVF probe counts.
  *
  * The sf embeddings are only weakly clustered (top-10 cosines ≈ 0.3,
  * i.e. neighbors are not angularly tight), which is the HARD case
  * for sign-pattern LSH: single-bucket recall is low and multi-probe
  * is what buys it back. The asserted bounds are the measured curve
  * with headroom; the structural invariants (monotone in depth,
  * exact equality at full depth) hold for any data.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val sf001 = "/root/testdata/sf0.01"
  private val hps = Ann.codebook(4, 64)
  private val probeIds = Seq(0L, 1L, 2L, 3L, 4L, 100L, 250L)
  private val k = 10

  private def topIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("LSH multi-probe: recall@10 is monotone in flip depth, >=0.9 at depth 3, exact at full depth") {
    val emb = Tables.embeddings(spark, sf001)
    val recallsAtDepth = (0 to 4).map { depth =>
      val rs = probeIds.map { pid =>
        val probe = emb.filter($"vec_id" === pid).select($"embedding".as("probe_emb"))
        val scan = emb.filter($"vec_id" =!= pid)
        val exact = topIds(Ann.bruteForceTopK(scan, "vec_id", "embedding", probe, k))
        val approx = topIds(Ann.lshTopK(scan, "vec_id", "embedding", probe, hps, k,
          multiProbeDepth = depth))
        if (depth == 4) // full depth probes all 2^4 buckets → must equal brute force
          assert(approx == exact, s"probe $pid: full-depth LSH != brute force")
        (approx & exact).size.toDouble / k
      }
      rs.sum / rs.size
    }
    // fan-out trade-off, recorded: depth d probes Σ C(4,i) of 16 buckets
    val fanout = (0 to 4).map(d => (0 to d).map(i =>
      (0 until 4).combinations(i).size).sum)
    info(s"mean recall@10 by flip depth: " +
      recallsAtDepth.zipWithIndex.map { case (r, d) =>
        f"d$d=${r}%.2f (${fanout(d)}/16 buckets)" }.mkString(", "))
    recallsAtDepth.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"recall not monotone in probe depth: $recallsAtDepth")
    }
    assert(recallsAtDepth(3) >= 0.9,
      s"depth-3 multi-probe mean recall@10 ${recallsAtDepth(3)} < 0.9")
    assert(recallsAtDepth(0) < 1.0, "single-bucket recall unexpectedly perfect — " +
      "the trade-off measurement is vacuous")
  }

  test("int8 quantization (q104's scheme) preserves brute-force recall@10 >= 0.9") {
    // the 4x-compression lever must not silently rot neighbor quality:
    // quantize per-vector max-abs int8 (EXACTLY q104's scheme), run the
    // same bruteForceTopK on the dequantized vectors, and MEASURE
    // recall against float ground truth. Weakly-clustered sf
    // embeddings (top-10 cosines ~0.3) are the adversarial case —
    // neighbor gaps are thin, so quantization noise shows up here
    // first if it ever does.
    val emb = Tables.embeddings(spark, sf001)
    val quant = emb.select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("mx", aggregate($"v", lit(0.0),
        (acc, x) => greatest(acc, abs(x))))
      .filter($"mx" > 0)
      .withColumn("qscale", $"mx" / lit(127.0))
      .select($"vec_id",
        transform($"v", x =>
          (floor(x / $"qscale" + lit(0.5)) * $"qscale").cast("float"))
          .as("embedding"))
    val recalls = probeIds.map { pid =>
      val probeF = emb.filter($"vec_id" === pid).select($"embedding".as("probe_emb"))
      val probeQ = quant.filter($"vec_id" === pid).select($"embedding".as("probe_emb"))
      val exact = topIds(Ann.bruteForceTopK(
        emb.filter($"vec_id" =!= pid), "vec_id", "embedding", probeF, k))
      val q = topIds(Ann.bruteForceTopK(
        quant.filter($"vec_id" =!= pid), "vec_id", "embedding", probeQ, k))
      (q & exact).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    info(f"int8-vs-float mean recall@10 = $mean%.2f over ${probeIds.size} probes")
    assert(mean >= 0.9, s"int8 quantization recall@10 $mean < 0.9: $recalls")
  }

  test("PQ-ADC: recall@10 is monotone in shortlist size; full shortlist is exact") {
    // recall here is STRUCTURALLY monotone (a larger shortlist is a
    // superset of a smaller one under the same ADC order), so the
    // ladder also cross-checks the implementation: non-monotonicity
    // would mean the shortlist ordering is unstable
    val emb = Tables.embeddings(spark, sf001)
    val ladder = Seq(20, 100, 499)
    val pqProbes = Seq(0L, 100L, 250L)
    val recalls = ladder.map { l =>
      val rs = pqProbes.map { pid =>
        val probe = emb.filter($"vec_id" === pid).select($"embedding".as("probe_emb"))
        val scan = emb.filter($"vec_id" =!= pid)
        val exact = topIds(Ann.bruteForceTopK(scan, "vec_id", "embedding", probe, k))
        val approx = topIds(Ann.pqTopK(scan, "vec_id", "embedding", probe,
          k = k, m = 4, ksub = 16, shortlist = l))
        if (l >= 499) // shortlist covers the corpus → exact by construction
          assert(approx == exact, s"probe $pid: full-shortlist PQ != brute force")
        (approx & exact).size.toDouble / k
      }
      rs.sum / rs.size
    }
    info(s"PQ mean recall@10 by shortlist (m=4, ksub=16): " +
      ladder.zip(recalls).map { case (l, r) => f"L$l=$r%.2f" }.mkString(", "))
    recalls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"PQ recall not monotone in shortlist: $recalls")
    }
    assert(recalls.head > 0.0, "ADC shortlist at L=20 found nothing — vacuous ladder")
  }

  test("IVF: recall@10 grows with nProbe; full probing is exact") {
    val emb = Tables.embeddings(spark, sf001)
    val probe = emb.filter($"vec_id" === 0).select($"embedding".as("probe_emb"))
    val scan = emb.filter($"vec_id" =!= 0)
    val exact = topIds(Ann.bruteForceTopK(scan, "vec_id", "embedding", probe, k))
    val recalls = Seq(2, 4, 8).map { np =>
      val ids = topIds(Ann.ivfTopK(scan, "vec_id", "embedding", probe,
        k = k, nCentroids = 8, nProbe = np))
      np -> (ids & exact).size.toDouble / k
    }
    info(s"IVF recall@10 by nProbe (8 centroids): " +
      recalls.map { case (np, r) => f"p$np=$r%.2f" }.mkString(", "))
    assert(recalls.last._2 == 1.0, s"nProbe=8/8 must be exact: ${recalls.last._2}")
    assert(recalls.map(_._2) == recalls.map(_._2).sorted,
      s"IVF recall not monotone in nProbe: $recalls")
  }

  test("IVF: sample-based centroid fit (fitFraction=0.25) keeps bounded recall@10") {
    // the 100 TB mode: KMeans fits on a 25% sample, assignment still
    // covers every vector. Partition quality degrades at most mildly —
    // mean recall@10 at nProbe=4 must stay within 0.2 of the full fit
    // (and full probing stays exact regardless of where centroids sit)
    val emb = Tables.embeddings(spark, sf001)
    def meanRecall(fitFrac: Double): Double = {
      val rs = probeIds.map { pid =>
        val probe = emb.filter($"vec_id" === pid).select($"embedding".as("probe_emb"))
        val scan = emb.filter($"vec_id" =!= pid)
        val exact = topIds(Ann.bruteForceTopK(scan, "vec_id", "embedding", probe, k))
        val ids = topIds(Ann.ivfTopK(scan, "vec_id", "embedding", probe,
          k = k, nCentroids = 8, nProbe = 4, fitFraction = fitFrac))
        (ids & exact).size.toDouble / k
      }
      rs.sum / rs.size
    }
    val full = meanRecall(1.0)
    val sampled = meanRecall(0.25)
    info(f"IVF recall@10 at nProbe=4/8: full-fit=$full%.2f, 0.25-sample fit=$sampled%.2f")
    assert(sampled >= full - 0.2,
      f"sample fit lost too much recall: $sampled%.2f vs full $full%.2f")
    // full probing is exact even with sampled centroids (the q146
    // soundness argument is independent of clustering quality)
    val probe = emb.filter($"vec_id" === 0).select($"embedding".as("probe_emb"))
    val scan = emb.filter($"vec_id" =!= 0)
    val exact = topIds(Ann.bruteForceTopK(scan, "vec_id", "embedding", probe, k))
    val fullProbe = topIds(Ann.ivfTopK(scan, "vec_id", "embedding", probe,
      k = k, nCentroids = 8, nProbe = 8, fitFraction = 0.25))
    assert(fullProbe == exact, "full probing with sampled fit must equal brute force")
  }
}
