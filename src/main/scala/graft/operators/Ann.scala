package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star X2).
  *
  *  - bruteForceTopK: exact baseline — scan side is embarrassingly
  *    parallel, probe is a 1-row broadcast, result via
  *    TakeOrderedAndProject (no global sort).
  *  - Random-hyperplane LSH (Charikar 2002): bucket every vector by
  *    the sign pattern of dot products with a small fixed codebook of
  *    hyperplanes; search only the probe's bucket. At 100 TB the
  *    bucket id becomes the partition key, so a query touches one
  *    partition instead of the full corpus. Multi-probe (flipping one
  *    bit) trades recall for fan-out.
  */
object Ann {

  /** Shared output contract: rounded cosine, ordered desc with id
    * tie-break, top k (TakeOrderedAndProject — no global sort). The
    * oracle hash-compare depends on this exact shape, so every ANN
    * variant ends here.
    */
  private def cosineTopK(candidates: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame =
    candidates
      .select(col(idCol),
        round(Vectors.cosine(col(vecCol), col("probe_emb")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Exact cosine top-k against a single probe vector. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      probe: DataFrame, k: Int): DataFrame =
    cosineTopK(emb.crossJoin(broadcast(probe)), idCol, vecCol, k)

  /** Sign-pattern bucket id for a vector against a fixed codebook of
    * hyperplanes (deterministic literal vectors → broadcast in plan).
    */
  def lshBucket(vec: Column, hyperplanes: Seq[Seq[Double]]): Column =
    concat(hyperplanes.map { hp =>
      val dot = Vectors.dot(vec, typedLit(hp))
      when(dot > 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Deterministic pseudo-random hyperplane codebook (Knuth
    * multiplicative hash over the component index, mapped to [-1, 1)).
    * Literal doubles, so the SAME values can be spliced into an oracle
    * SQL — no RNG seed to coordinate across engines or executors. At
    * corpus scale the codebook GROWS (more planes → 2^n buckets):
    * bucket cardinality tracks the corpus, unlike a fixed label/
    * category blocking key whose per-block population grows linearly.
    */
  def codebook(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(i => (0 until dim).map { j =>
      ((i.toLong * dim + j) * 2654435761L % 1000003L).toDouble / 1000003.0 * 2 - 1
    })

  /** IVF-style ANN: a KMeans coarse quantizer assigns every vector to
    * a centroid (narrow transform after a one-off fit); a query
    * searches only the `nProbe` centroids nearest the probe. At
    * 100 TB the cluster id is the partition/bucketing key, so a query
    * touches nProbe partitions instead of the corpus; recall is tuned
    * by nProbe exactly as in FAISS-style IVF indexes.
    *
    * Contract: `probe` must hold exactly ONE row (same 1-row contract
    * as the AsOf probe); centroid ranking reads it on the driver.
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
      probe: DataFrame, k: Int, nCentroids: Int, nProbe: Int,
      seed: Long = 42L, maxIter: Int = 4,
      fitFraction: Double = 1.0): DataFrame = {
    require(fitFraction > 0.0 && fitFraction <= 1.0,
      s"fitFraction must be in (0, 1], got $fitFraction")
    // few Lloyd rounds: the index only needs a REASONABLE partition
    // (recall is bought with nProbe, and the full-probe correctness
    // anchor is invariant to clustering quality). The fit runs
    // DRIVER-SIDE on a deterministic hash-ordered sample, capped so k
    // centroids see k·O(100) points whatever the corpus size —
    // fitFraction < 1 additionally restricts WHICH rows are eligible
    // (the 100 TB sample-fit mode; assignment below still covers
    // every vector, so it touches recall only through partition
    // quality — AnnRecallSpec bounds the loss at 0.25). Same
    // training shape as pqTopK: no distributed KMeans job whose
    // quality the rerank cannot see anyway.
    val eligible =
      if (fitFraction < 1.0)
        emb.filter(pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L))
          < (fitFraction * 1000000L).toLong)
      else emb
    val trainN = math.max(nCentroids * 256, 2048)
    val sample = eligible.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(trainN)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(sample.nonEmpty, "ivfTopK: empty training sample")
    val centroids = lloyd(sample, nCentroids, seed, maxIter)
    // assignment = PqCodes with ONE subspace spanning the full dim:
    // a single narrow argmin pass, no vector-UDT conversion
    val assigned = emb.withColumn("__cluster",
      element_at(graft.functions.VectorExpressions.pq_codes(
        col(vecCol), IndexedSeq(centroids)), 1))
    val probeRows = probe.limit(2).collect()
    require(probeRows.length == 1,
      s"ivfTopK expects exactly one probe row, got ${if (probeRows.isEmpty) 0 else "2+"}")
    val pv = probeRows(0).getSeq[Float](probeRows(0).fieldIndex("probe_emb"))
      .map(_.toDouble)
    // centroid list is tiny (nCentroids × dim) → rank on the driver
    val near = centroids.zipWithIndex.map { case (c, i) =>
      var s = 0.0; var j = 0
      while (j < c.length) { val d = c(j) - pv(j); s += d * d; j += 1 }
      (i, s)
    }.sortBy(_._2).take(nProbe).map(_._1)
    cosineTopK(assigned.filter(col("__cluster").isInCollection(near))
      .crossJoin(broadcast(probe)), idCol, vecCol, k)
  }

  /** Product-quantization ANN (Jégou et al. 2011): split the d-dim
    * vector into `m` subvectors, learn a `ksub`-centroid codebook per
    * subspace (seeded KMeans — the PQ "training"), encode every
    * vector as m small codes, then answer a query by ADC (asymmetric
    * distance computation): the probe's distance to each centroid of
    * each subspace is a tiny m×ksub table, and a vector's
    * approximate distance is m table lookups — no float math against
    * the original vectors at scan time. The top-`shortlist` by ADC
    * are then reranked EXACTLY on the original vectors.
    *
    * Correctness anchor (the q146 trick): with shortlist ≥ corpus
    * size the rerank sees every vector, so the result PROVABLY equals
    * bruteForceTopK whatever the codebooks learned — a brute-force
    * SQL oracle is sound. The at-scale mode (shortlist ≪ corpus) is
    * the same code path; its recall-vs-shortlist curve is measured in
    * AnnRecallSpec and is structurally monotone (a larger shortlist
    * is a superset).
    *
    * Scale: codes are m bytes instead of d floats (16× compression at
    * m=4, d=64, float32) — the scan reads the code column only; the
    * ADC table rides the broadcast probe; rerank touches `shortlist`
    * rows. Storage-bound corpora scan 16× less; the original vectors
    * are fetched only for the shortlist (FAISS IVFADC's layout).
    *
    * Contract: `probe` must hold exactly ONE row with `probe_emb`.
    */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String,
      probe: DataFrame, k: Int, m: Int, ksub: Int, shortlist: Int,
      seed: Long = 42L, trainN: Int = 512, trainIters: Int = 10): DataFrame = {
    val probeRows = probe.limit(2).collect()
    require(probeRows.length == 1,
      s"pqTopK expects exactly one probe row, got ${if (probeRows.isEmpty) 0 else "2+"}")
    val dim = probeRows(0).getSeq[Float](
      probeRows(0).fieldIndex("probe_emb")).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    // Codebook training is SAMPLE-BASED and driver-side (FAISS trains
    // PQ codebooks on a bounded sample for exactly this reason): a
    // deterministic hash-ordered TakeOrdered fetches ≤ trainN vectors
    // (trainN·dim doubles — KBs), then seeded Lloyd iterations per
    // subspace cost m·trainN·ksub·dsub flops on the driver. This
    // replaces m distributed KMeans jobs whose result quality is
    // answer-INVISIBLE for the rerank anyway (the shortlist only
    // selects candidates; rerank is exact) — training cost must not
    // scale with the corpus, and now it cannot.
    val sample = emb.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(trainN)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(sample.nonEmpty, "pqTopK: empty training sample")
    val codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
      (0 until m).map { i =>
        lloyd(sample.map(v => v.slice(i * dsub, (i + 1) * dsub)),
          ksub, seed + i, trainIters)
      }
    // one narrow pass: m argmins inlined into a single expression
    val encoded = emb.withColumn("__codes",
      graft.functions.VectorExpressions.pq_codes(col(vecCol), codebooks))
    // ADC table: probe subvector → squared L2 to each centroid of each
    // subspace (m×ksub doubles, literal → broadcast in plan)
    val pv = probeRows(0).getSeq[Float](probeRows(0).fieldIndex("probe_emb"))
      .map(_.toDouble)
    val table: Seq[Seq[Double]] = (0 until m).map { i =>
      codebooks(i).map { c =>
        var s = 0.0; var j = 0
        while (j < dsub) {
          val d = c(j) - pv(i * dsub + j); s += d * d; j += 1
        }
        s
      }.toSeq
    }
    val adc = (0 until m).map(i =>
      element_at(element_at(typedLit(table), i + 1),
        element_at(col("__codes"), i + 1) + 1)).reduce(_ + _)
    val short = encoded.withColumn("__adc", adc)
      .orderBy(col("__adc").asc, col(idCol))
      .limit(shortlist)
      .drop("__adc", "__codes")
    // exact rerank on the original vectors — the approximation only
    // ever selects CANDIDATES, never scores the answer
    cosineTopK(short.crossJoin(broadcast(probe)), idCol, vecCol, k)
  }

  /** Seeded Lloyd's k-means on a driver-resident sample: k-means++
    * D²-weighted init (Arthur/Vassilvitskii 2007 — a random init
    * measurably halved IVF partition recall on the test corpus),
    * `iters` assign/update rounds, empty clusters keep their previous
    * center. Deterministic for a fixed (points, k, seed, iters).
    */
  private def lloyd(points: Array[Array[Double]], k: Int, seed: Long,
      iters: Int): IndexedSeq[IndexedSeq[Double]] = {
    val rnd = new scala.util.Random(seed)
    val kk = math.min(k, points.length)
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { val d = a(j) - b(j); s += d * d; j += 1 }
      s
    }
    val centers = new Array[Array[Double]](kk)
    centers(0) = points(rnd.nextInt(points.length)).clone
    val d2 = points.map(p => sq(p, centers(0)))
    var ci = 1
    while (ci < kk) {
      val total = d2.sum
      // D² sampling; degenerate all-zero case falls back to round-robin
      val next =
        if (total <= 0) ci % points.length
        else {
          val target = rnd.nextDouble() * total
          var acc = 0.0; var i = 0
          while (i < points.length - 1 && acc + d2(i) < target) {
            acc += d2(i); i += 1
          }
          i
        }
      centers(ci) = points(next).clone
      var i = 0
      while (i < points.length) {
        val nd = sq(points(i), centers(ci))
        if (nd < d2(i)) d2(i) = nd
        i += 1
      }
      ci += 1
    }
    val d = points(0).length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](d))
      val counts = new Array[Int](kk)
      points.foreach { p =>
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < kk) {
          var dist = 0.0; var j = 0
          while (j < d) { val dd = p(j) - centers(c)(j); dist += dd * dd; j += 1 }
          if (dist < bd) { bd = dist; best = c }
          c += 1
        }
        val s = sums(best)
        var j = 0
        while (j < d) { s(j) += p(j); j += 1 }
        counts(best) += 1
      }
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          var j = 0
          while (j < d) { centers(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      it += 1
    }
    centers.map(_.toIndexedSeq).toIndexedSeq
  }

  /** All bucket ids within Hamming distance ≤ `depth` of `bucket`
    * (the identity variant included), as an array column — the
    * pair-join form of lshTopK's bit-flip multi-probe. The variants
    * of one bucket are DISTINCT strings, so an equi-join of a row's
    * exact bucket against another row's exploded variants matches
    * each qualifying pair exactly once — no dedup pass needed.
    */
  def probeVariants(bucket: Column, nPlanes: Int, depth: Int): Column = {
    require(depth >= 0 && depth <= nPlanes,
      s"depth must be in [0, $nPlanes], got $depth")
    val flipSets = (0 to depth)
      .flatMap(sz => (0 until nPlanes).combinations(sz).map(_.toSet))
    array(flipSets.map { s =>
      concat((0 until nPlanes).map { i =>
        if (s.contains(i))
          when(substring(bucket, i + 1, 1) === "1", lit("0"))
            .otherwise(lit("1"))
        else substring(bucket, i + 1, 1)
      }: _*)
    }: _*)
  }

  /** LSH-bucketed ANN: restrict the scan to vectors in the probe's
    * bucket, then exact cosine top-k inside it.
    *
    * `multiProbeDepth` is bit-flip multi-probing: additionally search
    * every bucket within Hamming distance ≤ depth of the probe's
    * bucket (depth 0 = the single exact bucket). Each extra flip
    * trades fan-out for recall — the curve is measured by
    * AnnRecallSpec; at depth = |hyperplanes| all buckets are probed
    * and the result equals bruteForceTopK exactly. The probe-side
    * bucket variants are a tiny exploded broadcast; candidates still
    * match at most one variant (bucket ids are distinct), so no
    * dedup pass is needed.
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
      probe: DataFrame, hyperplanes: Seq[Seq[Double]], k: Int,
      multiProbeDepth: Int = 0): DataFrame = {
    val n = hyperplanes.length
    require(multiProbeDepth >= 0 && multiProbeDepth <= n,
      s"multiProbeDepth must be in [0, $n], got $multiProbeDepth")
    val bucketed = emb.withColumn("bucket", lshBucket(col(vecCol), hyperplanes))
    val pb = probe.withColumn("pb0", lshBucket(col("probe_emb"), hyperplanes))
    val probeB =
      if (multiProbeDepth == 0) pb.withColumn("probe_bucket", col("pb0"))
      else pb.withColumn("probe_bucket",
        explode(probeVariants(col("pb0"), n, multiProbeDepth)))
    cosineTopK(
      bucketed.join(broadcast(probeB), col("bucket") === col("probe_bucket")),
      idCol, vecCol, k)
  }
}
