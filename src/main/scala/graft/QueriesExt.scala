package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}
import graft.operators.{Ann, Dedup}

/** North-star extension queries (SURVEY.md §2.8 expanded): the
  * operators a large-scale training-data pipeline needs — dedup
  * families, similarity search, text analysis — each oracle-checked
  * like the core set. Matching DuckDB SQL in OracleExt (generated to
  * guarantee formula parity with the Column expressions).
  */
object QueriesExt {
  import Tables._

  /** Language-ID heuristic per document. */
  def q32(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), Text.langId(col("text")).as("pred_lang"))
      .orderBy(col("doc_id"))

  /** Quality scoring: token count, mean token length, stopword ratio,
    * blended score — all four from the single-pass QualityStats
    * kernel (value-identical to the Column forms, TextVectorsSpec).
    */
  def q33(s: SparkSession, d: String): DataFrame = {
    val st = graft.functions.TextExpressions.quality_stats(col("text"))
    documents(s, d).select(
      col("doc_id"),
      st.getField("n_tok").as("n_tok"),
      round(st.getField("mean_tok_len"), 4).as("mean_tok_len"),
      round(st.getField("stop_ratio"), 4).as("stop_ratio"),
      round(st.getField("quality"), 4).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprinting: 128-bit md5 + 60-bit integer projection
    * (the key family every dedup/bucketing operator here shuffles on).
    */
  def q34(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      Text.fingerprint(col("text")).as("fp"),
      Text.md5Long(col("text")).as("fp_long"))
      .orderBy(col("doc_id"))

  /** MinHash signatures (8 hash families over 3-gram shingles). */
  def q35(s: SparkSession, d: String): DataFrame =
    Dedup.minhashSignature(documents(s, d), col("text"), col("doc_id"), 3, 8)
      .orderBy(col("doc_id"))

  /** SimHash 16-bit fingerprints. */
  def q36(s: SparkSession, d: String): DataFrame =
    Dedup.simhash(documents(s, d), col("text"), col("doc_id"), 16)
      .orderBy(col("doc_id"))

  /** n-gram Jaccard near-dup pairs via inverted shingle index (pair
    * stats materialized once per run, shared with q90's containment).
    */
  def q37(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardFrom(LshStages.ngramStats(s, d), 0.12)
      .orderBy(col("a_id"), col("b_id"))

  /** Embedding-cosine near-dup pairs WITHIN a label, sub-blocked on
    * the random-hyperplane LSH bucket (Ann.codebook — the same literal
    * codebook q82/q84 use, so the oracle reproduces the bucketing
    * bit-for-bit) with depth-1 bit-flip multi-probe for recall
    * (Ann.probeVariants — the pair-join form of lshTopK's probe
    * ladder; a pair qualifies iff its buckets are within Hamming 1,
    * and matches exactly once because one bucket's variants are
    * distinct). The composed (label × bucket-variant) key GROWS with
    * the corpus: at 100× you add hyperplanes (2^n buckets), keeping
    * per-block population bounded where a bare `label` key's blocks
    * grow linearly, and tune recall with the probe depth. q82 is the
    * corpus-wide depth-0 twin; ScaleOpsSpec proves this form ≡ the
    * plain label-blocked join restricted to Hamming ≤ 1 collisions.
    */
  def q38(s: SparkSession, d: String): DataFrame = {
    // norms and bucket computed ONCE per vector (narrow) before the
    // pair join — the join then evaluates only the dot product per pair
    val e = embeddings(s, d)
      .withColumn("bucket", Ann.lshBucket(col("embedding"), Queries4.Hps))
      .withColumn("nrm", Vectors.norm(col("embedding")))
    val a = e.select(col("vec_id").as("a_id"), col("label"), col("bucket"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = e.select(col("vec_id").as("b_id"), col("label").as("label_b"),
      explode(Ann.probeVariants(col("bucket"), Queries4.Hps.length, 1))
        .as("bucket_b"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    a.join(b, col("label") === col("label_b") &&
        col("bucket") === col("bucket_b") && col("a_id") < col("b_id"))
      .withColumn("cos",
        Vectors.dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos") >= 0.4)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cosine"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** LSH-bucketed ANN: 4 hyperplanes (vectors 1..4 as a deterministic
    * codebook), search only the probe's bucket.
    */
  def q39(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val hps: Seq[Seq[Double]] = e.filter(col("vec_id").between(1, 4))
      .orderBy(col("vec_id")).select(col("embedding"))
      .collect().toSeq.map(_.getSeq[Float](0).map(_.toDouble))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe_emb"))
    Ann.lshTopK(e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      probe, hps, 5)
  }

  /** Token counting: whitespace + BPE-ish regex tokenizations. */
  def q40(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      size(Text.tokens(col("text"))).as("n_ws_tokens"),
      Text.regexTokenCount(col("text")).as("n_regex_tokens"),
      col("n_chars"),
      length(col("text")).as("len_text"))
      .orderBy(col("doc_id"))

  /** Exact interpolated percentiles (A-family sketch twin: the exact
    * form is oracle-checkable; percentile_approx is the 100 TB path,
    * property-tested in PropertySpec).
    */
  def q41(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy(col("event_type"))
      .agg(round(percentile(col("value"), lit(0.5)), 4).as("p50"),
        round(percentile(col("value"), lit(0.95)), 4).as("p95"))
      .orderBy(col("event_type"))

  /** U2: intersect — users who both click and purchase. */
  def q42(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    e.filter(col("event_type") === "click").select(col("user_id"))
      .intersect(
        e.filter(col("event_type") === "purchase").select(col("user_id")))
      .orderBy(col("user_id"))
  }

  /** Margin-vs-data disambiguation for cube/rollup/grouping-sets:
    * grouping() == 1 marks a margin row ('ALL'); a genuine NULL data
    * value surfaces as 'NULL' instead of being conflated with margins.
    * Shared by q20 (cube), q43 (rollup), q44 (grouping sets).
    */
  private[graft] def marginLabel(g: Column, v: Column): Column =
    when(g === 1, lit("ALL")).otherwise(coalesce(v, lit("NULL")))

  /** A5: rollup (lang → lang×source hierarchy margins). */
  def q43(s: SparkSession, d: String): DataFrame =
    documents(s, d).rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"),
        grouping(col("lang")).as("g_lang"), grouping(col("source")).as("g_source"))
      .select(marginLabel(col("g_lang"), col("lang")).as("lang"),
        marginLabel(col("g_source"), col("source")).as("source"), col("n"))
      .orderBy(col("lang"), col("source"))

  /** A5: explicit GROUPING SETS ((lang), (source)). */
  def q44(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupingSets(Seq(Seq(col("lang")), Seq(col("source"))),
        col("lang"), col("source"))
      .agg(count(lit(1)).as("n"),
        grouping(col("lang")).as("g_lang"), grouping(col("source")).as("g_source"))
      .select(marginLabel(col("g_lang"), col("lang")).as("lang"),
        marginLabel(col("g_source"), col("source")).as("source"), col("n"))
      .orderBy(col("lang"), col("source"))

  /** W4 range frame: trailing-hour event count per user at each event
    * (RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW over epoch
    * seconds).
    */
  def q45(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").cast("double"))
      .rangeBetween(-3600, 0)
    events(s, d)
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("n_last_hour"))
      .orderBy(col("event_id"))
  }

  /** MinHash LSH banding candidate pairs (shingle → minhash → band →
    * bucket-join): 8 hash families in 4 bands of 2; docs sharing any
    * band bucket are candidates (26 pairs at sf0.01). The oracle
    * reproduces the banding in SQL; the scalatest additionally plants
    * duplicates to prove recall (TextVectorsSpec).
    */
  def q46(s: SparkSession, d: String): DataFrame =
    LshStages.candidatePairs(s, d)
      .orderBy(col("a_id"), col("b_id"))

  /** SimHash near-dup pairs: 48-bit packed fingerprints, pairs with
    * Hamming distance ≤ 3, generated by bit-band bucketing
    * (Dedup.simhashPairs) — one shuffle on (band, 12-bit band value),
    * never an all-pairs join. Pigeonhole over 4 bands covers every
    * ≤3-flip pair; the exact in-bucket Hamming filter makes banding
    * result-invariant, which the oracle proves by BEING the
    * brute-force form (and ScaleOpsSpec re-proves in-engine). The
    * earlier 16-bit/Hamming≤1 declaration could only pair via a
    * measured-slower dense-half band or a BNLJ that dies at 100×;
    * widening the fingerprint is what makes band buckets sparse enough
    * to bucket on — width and banding move together.
    */
  def q47(s: SparkSession, d: String): DataFrame =
    Dedup.simhashPairs(documents(s, d), col("text"), col("doc_id"),
      bits = 48, bands = 4, maxHamming = 3)
      .orderBy(col("a_id"), col("b_id"))

  /** Multimodal feature extraction surfaced in the driver harness:
    * deterministic synthetic media (REAL PNG payloads since round 8,
    * decoded through javax.imageio per partition) → batched
    * decode/features → joined with the sf embeddings table. Oracled
    * because PNG is lossless: the decoded samples equal the
    * generation formula, which IS DuckDB-expressible (Oracle13).
    * The projection reports `n_px` (decoded sample count) rather
    * than the PNG container size, which no SQL engine can recompute.
    */
  def q48(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Multimodal
    val feats = Multimodal.extractFeatures(Multimodal.synthMedia(s, 200)).toDF()
    Multimodal.joinWithEmbeddings(feats, embeddings(s, d))
      .select(col("media_id"), col("kind"), col("n_px"),
        round(col("byte_mean"), 4).as("byte_mean"),
        round(col("byte_entropy"), 4).as("byte_entropy"), col("label"))
      .orderBy(col("media_id"))
  }

  /** FFT features per user over the time-ordered event-value signal
    * (F6/F7). Oracled since round 8: the radix-2 FFT equals the DFT
    * of the zero-padded signal, and a brute-force O(n·k) DFT IS
    * DuckDB-expressible at fixture array sizes — see the
    * q49_fft_features entry in OracleExt. NumPy cross-check
    * (tools/check_ml.py) and EnrichMlSpec goldens stay as
    * belt-and-braces.
    */
  def q49(s: SparkSession, d: String): DataFrame = {
    import graft.ml.Fft
    events(s, d)
      .filter(col("value").isNotNull) // a NULL element would NPE the UDF unboxing
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("value")))).as("evs"))
      .select(col("user_id"),
        transform(col("evs"), e => e.getField("value")).as("signal"))
      .select(col("user_id"),
        round(Fft.dominant_freq(col("signal"), lit(1.0)), 6).as("dom_freq"),
        round(Fft.spectral_energy(col("signal")), 4).as("spec_energy"))
      .orderBy(col("user_id"))
  }

  /** PCA(3) components per embedding (F8; no oracle — MLlib SVD is
    * not DuckDB-expressible; EnrichMlSpec checks variance ordering).
    */
  def q50(s: SparkSession, d: String): DataFrame = {
    import graft.ml.Reduce
    Reduce.pca(embeddings(s, d), "embedding", 3)
      .select(col("vec_id"),
        round(element_at(col("principal_components"), 1), 4).as("pc1"),
        round(element_at(col("principal_components"), 2), 4).as("pc2"),
        round(element_at(col("principal_components"), 3), 4).as("pc3"))
      .orderBy(col("vec_id"))
  }

  /** q50b — PCA INVARIANT GATE (VERDICT r8 #4). q50's projection is
    * [no-oracle] (near-degenerate spectrum makes eigenvector parity
    * SQL-infeasible), but the properties that make a PCA a PCA are
    * hash-checkable: (1) the fitted d×k component matrix is
    * orthonormal (3×3 Gram vs I at 1e-6 — constant-size driver math
    * on the MODEL, not data); (2) PC variances come out in
    * non-increasing order (MLlib sorts eigenvalues); (3) explained
    * variance ≤ total variance (trace); (4) every projection is
    * norm-contractive: |Pᵀx|² ≤ |x|² per vector (MLlib's transform
    * is uncentered, so the raw-norm bound is the right one). The
    * booleans are computed Spark-side with wide margins; the oracle
    * states their REQUIRED values as literals and independently
    * recomputes n_vecs/n_dims/total_var from the raw parquet — a
    * broken PCA flips a boolean and fails the driver hash gate, so
    * "trust NumPy" becomes a partial hash gate (q50 itself stays 🔬).
    *
    * Scale: fit is q50's distributed covariance; the audit adds one
    * 1-row aggregate over the projected table, one over the exploded
    * raw table, and 9 driver multiplications on the 64×3 model.
    */
  def q50b(s: SparkSession, d: String): DataFrame = {
    import graft.ml.Reduce
    import graft.functions.VectorExpressions
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val (pcdf, pcm) = Reduce.pcaWithModel(embeddings(s, d), "embedding", 3)
    val k = pcm.numCols
    val nd = pcm.numRows
    var maxDev = 0.0
    for (i <- 0 until k; j <- 0 until k) {
      var g = 0.0
      for (r <- 0 until nd) g += pcm(r, i) * pcm(r, j)
      maxDev = math.max(maxDev, math.abs(g - (if (i == j) 1.0 else 0.0)))
    }
    val proj = pcdf.select(col("vec_id"),
      VectorExpressions.sumsq(col("embedding")).as("xsq"),
      element_at(col("principal_components"), 1).as("p1"),
      element_at(col("principal_components"), 2).as("p2"),
      element_at(col("principal_components"), 3).as("p3"))
      .withColumn("pcsq",
        col("p1") * col("p1") + col("p2") * col("p2") + col("p3") * col("p3"))
    // projected variances via the same decimal-moment form as the
    // trace (ADVICE r9): avg(p²)−avg(p)² over raw double avgs is both
    // partition-order-dependent and cancellation-prone — the decimal
    // sums pin each moment to one exact value before the float math
    def dvar(c: Column): Column = {
      val n = count(lit(1))
      (sum((c * c).cast(dec)).cast("double") / n) -
        (sum(c.cast(dec)).cast("double") / n) *
          (sum(c.cast(dec)).cast("double") / n)
    }
    val pstats = proj.agg(
      count(lit(1)).as("n_vecs"),
      min(col("xsq") - col("pcsq")).as("min_resid"),
      dvar(col("p1")).as("v1"),
      dvar(col("p2")).as("v2"),
      dvar(col("p3")).as("v3"))
    // trace via the q246 moment convention so the oracle replays it
    // exactly: decimal sums → double var → 6dp decimal per dim →
    // exact sum → 4dp double
    val trace = embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("dim"), col("xf").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"))
      .select(round(col("sxx") / col("n") -
        (col("sx") / col("n")) * (col("sx") / col("n")), 6)
        .cast("decimal(18,6)").as("var"))
      .agg(round(sum(col("var")).cast("double"), 4).as("total_var"),
        sum(col("var")).cast("double").as("trace_raw"))
    pstats.crossJoin(broadcast(trace))
      .select(col("n_vecs"), lit(nd).as("n_dims"), lit(k).as("k"),
        lit(maxDev < 1e-6).as("orthonormal_ok"),
        (col("v1") >= col("v2") - lit(1e-9) &&
          col("v2") >= col("v3") - lit(1e-9)).as("variance_ordered_ok"),
        // tolerance covers the trace's aggregate 6dp-rounding bound:
        // nd per-dim variances each rounded by ≤5e-7 (ADVICE r9 — a
        // bare 1e-6 could flip on a correct PCA)
        (col("v1") + col("v2") + col("v3") <=
          col("trace_raw") + lit(nd * 5e-7 + 1e-6)).as("explained_le_total_ok"),
        (col("min_resid") >= lit(-1e-6)).as("projection_contractive_ok"),
        col("total_var"))
  }

  /** q50c — PCA RECONSTRUCTION-QUALITY GATE (VERDICT r11 #7, the
    * stretch after q50b's invariants): an APPROXIMATION-QUALITY bound
    * the DuckDB oracle can check without ever seeing an eigenvector.
    * Eckart-Young: the rank-k PCA minimizes centered reconstruction
    * error over ALL rank-k orthonormal projections — in particular it
    * must beat the best k COORDINATE AXES, whose residual the oracle
    * recomputes exactly from the raw parquet (per-dim variances via
    * the q246/q50b decimal-moment convention, top-k by (var desc, dim
    * asc)). A PCA that fit garbage loses to the axes baseline and
    * flips the boolean → driver hash mismatch. Spark-side centered
    * residual uses the identities Σ‖x−μ‖² = Σ‖x‖² − n‖μ‖² and
    * Σ‖Vᵀ(x−μ)‖² = Σ‖Vᵀx‖² − n‖Vᵀμ‖² — exact decimal data sums, the
    * μ/Vᵀμ corrections are 64-row model-side driver math (the q50b
    * Gram convention; both collects are bounded: 64 dim rows + 1 sums
    * row, documented here per the bounded-collect rule).
    *
    * Scale: one PCA fit (q50's distributed covariance), one exploded
    * per-dim aggregate, one 1-row data aggregate. Tolerances are
    * relative (1e-4 of the centered total) so a correct PCA can never
    * flip on decimal-rounding noise.
    */
  def q50c(s: SparkSession, d: String): DataFrame = {
    import graft.ml.Reduce
    import graft.functions.VectorExpressions
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val emb = embeddings(s, d)
    val (pcdf, pcm) = Reduce.pcaWithModel(emb, "embedding", 3)
    val k = pcm.numCols
    val dimRows = emb
      .select(posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("dim"), col("xf").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"))
      .select(col("dim"), col("n"), (col("sx") / col("n")).as("mu"),
        round(col("sxx") / col("n") - (col("sx") / col("n")) *
          (col("sx") / col("n")), 6).cast("decimal(18,6)").as("var6"),
        col("sxx"))
      .collect() // bounded: one row per embedding dim (64)
    val nVecs = dimRows.head.getLong(1)
    val mu = dimRows.sortBy(_.getInt(0)).map(_.getDouble(2))
    val muNormSq = mu.map(m => m * m).sum
    // Vᵀμ on the driver from the fitted 64×k model
    var vmuSq = 0.0
    for (j <- 0 until k) {
      var vj = 0.0
      var r = 0
      while (r < pcm.numRows) { vj += pcm(r, j) * mu(r); r += 1 }
      vmuSq += vj * vj
    }
    val vars = dimRows.map(r => BigDecimal(r.getDecimal(3)))
    val dimsSorted = dimRows.map(_.getInt(0)).zip(vars)
      .sortBy { case (dim, v) => (-v, dim) }
    val topk = dimsSorted.take(k).map(_._2).sum
    val traceRaw = vars.sum
    def r4(v: BigDecimal): Double =
      v.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // Σ‖x‖² = Σ_d sxx_d — the same exact-decimal addends the dim
    // stats already summed (decimal addition is order-free), so the
    // data pays only ONE more pass: the projected-norm aggregate
    val sumXsq = dimRows.map(_.getDouble(4)).sum
    // pcsq built from the SAME k the fitted model reports, so a k
    // change upstream cannot silently under/over-count (ADVICE r12)
    val sums = pcdf.select(
        (1 to k).map(i => element_at(col("principal_components"), i) *
            element_at(col("principal_components"), i))
          .reduce(_ + _).as("pcsq"))
      .agg(sum(col("pcsq").cast(dec)).cast("double"))
      .collect()(0) // bounded: the 1-row moment aggregate
    val centeredTotal = sumXsq - nVecs * muNormSq
    val centeredCaptured = sums.getDouble(0) - nVecs * vmuSq
    val residPca = centeredTotal - centeredCaptured
    val axesResid = (traceRaw - topk).toDouble * nVecs
    val tol = 1e-4 * math.max(centeredTotal, 1.0)
    import s.implicits._
    Seq((nVecs, k, r4(traceRaw), r4(topk),
      residPca >= -tol,
      residPca <= axesResid + tol,
      centeredCaptured >= -tol && centeredCaptured <= centeredTotal + tol))
      .toDF("n_vecs", "k", "total_var", "axes_var_topk",
        "resid_nonneg_ok", "pca_beats_axes_ok", "capture_in_unit_ok")
  }

  /** q50d — PCA KERNEL vs SQL POWER METHOD on a WELL-CONDITIONED
    * synthetic matrix (VERDICT r12 #3, closing the q50 oracle gap).
    *
    * The driver corpus's covariance spectrum is near-degenerate
    * (λ₂/λ₁ = 0.987, round-8 probe), so no fixed-iteration SQL power
    * method can converge there — that is why q50's component VALUES
    * carry a NumPy check instead of a DuckDB oracle. This query
    * oracles the SAME PCA kernel (Reduce.pcaWithModel → MLlib
    * covariance + eigSym) on a deterministic synthetic matrix whose
    * spectrum IS well-separated, so the kernel's component values get
    * a hard in-harness DuckDB gate after all: both engines rebuild
    * the 240×6 data EXACTLY (integer arithmetic from a row index —
    * scores s₁,s₂,s₃ are modular-arithmetic pseudo-noise, loadings
    * 4·u₁+2·u₂+1·u₃ over fixed integer basis vectors → rank-3
    * covariance with λ₂/λ₁ = 0.167, λ₃/λ₂ = 0.0037), the oracle runs
    * 60 power-method iterations with deflation in recursive SQL
    * (convergence (λ₂/λ₁)⁶⁰ ≈ 1e-47, far past double precision), and
    * both sides sign-normalize each component (largest-|loading|
    * coordinate positive) before rounding to 4 dp.
    *
    * Scale: the fit is q50's distributed covariance path on 240 rows;
    * the 6×3 model transfer is the same bounded driver-side matrix
    * every PCA serves from. The sf dir is unused by construction —
    * the gate pins the KERNEL, not the corpus.
    */
  def q50d(s: SparkSession, d: String): DataFrame = {
    val u = Seq(Seq(3, 1, 4, 1, 5, 9), Seq(-2, 7, 1, -8, 2, 8),
      Seq(1, -6, 1, 8, 0, -3))
    val w = Seq(4, 2, 1)
    val base = s.range(240).select(
      ((col("id") * 53 + 7) % 101 - 50).as("s1"),
      ((col("id") * 29 + 3) % 89 - 44).as("s2"),
      ((col("id") * 17 + 5) % 61 - 30).as("s3"))
    val withX = base.select(array((0 until 6).map(j =>
      (col("s1") * (w(0) * u(0)(j)) + col("s2") * (w(1) * u(1)(j)) +
        col("s3") * (w(2) * u(2)(j))).cast("double")): _*).as("x"))
    val pcm = graft.ml.Reduce.pcaWithModel(withX, "x", 3)._2 // 6×3
    val rows = for {
      c <- 0 until 3
      colv = (0 until 6).map(j => pcm(j, c))
      mx = colv.indices.maxBy(j => math.abs(colv(j)))
      sgn = if (colv(mx) < 0) -1.0 else 1.0
      j <- 0 until 6
    } yield (c + 1, j,
      BigDecimal(colv(j) * sgn)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    import s.implicits._
    rows.toDF("component", "dim", "loading")
      .orderBy(col("component"), col("dim"))
  }

  /** Balanced (stratified-cap) sampling: at most 20 docs per language,
    * chosen by deterministic md5 order — the quota/balance pass of a
    * training-data pipeline, reproducible across runs and engines
    * (unlike RNG-based sampleBy).
    */
  def q51(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(col("text")), col("doc_id"))
    documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select(col("doc_id"), col("lang"), col("rn"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Deterministic ~10% subsample by hash threshold — reproducible
    * downsampling (the keep-if-hash-bucket<k pattern; at 100 TB the
    * predicate pushes into the scan and no shuffle occurs).
    */
  def q52(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(pmod(Text.md5Long(col("text")), lit(100L)) < 10)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** PII/number redaction pass: digit runs → <NUM> sentinel, with a
    * redaction count per doc (the content-scrubbing stage of a
    * training-data pipeline; pattern is RE2/Java-portable).
    */
  def q53(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("n_redacted"),
      md5(regexp_replace(col("text"), "[0-9]+", "<NUM>")).as("redacted_md5"))
      .orderBy(col("doc_id"))

  /** Gopher-style repetition filter: fraction of duplicate trigram
    * shingles per doc; docs above 60% repetition are flagged for drop.
    */
  def q54(s: SparkSession, d: String): DataFrame = {
    val sh = Text.shingles(col("text"), 3)
    documents(s, d).select(
      col("doc_id"),
      round(lit(1.0) -
        size(array_distinct(sh)).cast("double") /
          greatest(size(sh), lit(1)).cast("double"), 4).as("dup_ratio"))
      .withColumn("keep", col("dup_ratio") <= 0.6)
      .orderBy(col("doc_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_langid" -> (q32 _),
    "q33_quality_score" -> (q33 _),
    "q34_fingerprint" -> (q34 _),
    "q35_minhash_signature" -> (q35 _),
    "q36_simhash" -> (q36 _),
    "q37_ngram_jaccard" -> (q37 _),
    "q38_embed_neardup" -> (q38 _),
    "q39_ann_lsh" -> (q39 _),
    "q40_token_stats" -> (q40 _),
    "q41_percentiles" -> (q41 _),
    "q42_intersect" -> (q42 _),
    "q43_rollup" -> (q43 _),
    "q44_grouping_sets" -> (q44 _),
    "q45_range_window" -> (q45 _),
    "q46_minhash_lsh_pairs" -> (q46 _),
    "q47_simhash_pairs" -> (q47 _),
    "q48_multimodal_features" -> (q48 _),
    "q49_fft_features" -> (q49 _),
    "q50_pca_components" -> (q50 _),
    "q50b_pca_invariants" -> (q50b _),
    "q50c_pca_reconstruction" -> (q50c _),
    "q50d_pca_power_oracle" -> (q50d _),
    "q51_balanced_sample" -> (q51 _),
    "q52_hash_sample" -> (q52 _),
    "q53_redact" -> (q53 _),
    "q54_repetition_filter" -> (q54 _)
  )
}

/** Generated DuckDB SQL mirroring QueriesExt formulas exactly. */
object OracleExt {

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(", ")

  /** Full stopword list as a SQL IN-list — shared with Oracle3's q77
    * quality CTE so it cannot drift from the q33 oracle's formula.
    */
  private[graft] def allStopwordsIn: String =
    inList(Text.stopwords.values.flatten.toSeq)

  /** The repo's shared 60-bit md5 projection in DuckDB SQL —
    * private[graft] (like lshBandCtes) so later oracles splice the ONE
    * formula instead of re-inlining it (Text.md5Long is the Spark
    * twin; the two must change together or every hash oracle breaks).
    */
  private[graft] def md5long(e: String): String =
    s"CAST('0x' || substring(md5($e), 1, 15) AS BIGINT)"

  /** DuckDB mirror of Text.shingles(text, 3): Spark emits
    * sequence(0, greatest(size-3, 0)) windows with clamped slice.
    */
  private val shingles3 =
    "list_transform(range(1, greatest(len(toks)-2, 1) + 1), " +
      "i -> array_to_string(toks[i:i+2], ' '))"

  private[graft] def dot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private[graft] def sumsq(a: String): String =
    s"list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

  private[graft] def cosine(a: String, b: String): String =
    s"${dot(a, b)} / (sqrt(${sumsq(a)}) * sqrt(${sumsq(b)}))"

  /** Hamming distance between two n-char '0'/'1' bucket strings —
    * the oracle mirror of Ann.probeVariants' depth-≤ match (shared
    * with Oracle2's q67).
    */
  private[graft] def hammingSql(a: String, b: String, n: Int): String =
    (1 to n).map(i =>
      s"CASE WHEN substring($a, $i, 1) <> substring($b, $i, 1) " +
        "THEN 1 ELSE 0 END").mkString(" + ")

  private val langs = Seq("en", "fr", "es", "de", "zh")

  /** The q32 langid predictor as shareable CTEs ending in
    * `pred(doc_id, pred_lang)` — private[graft] (the md5long
    * convention) so the q187 confusion-matrix oracle splices the ONE
    * formula instead of re-deriving the stopword-argmax.
    */
  private[graft] val langidPredCtes: String = {
    val cnts = langs.map(l =>
      s"len(list_filter(string_split(text, ' '), w -> w IN (${inList(Text.stopwords(l))}))) AS c_$l")
      .mkString(",\n    ")
    val best = s"greatest(${langs.map(l => s"c_$l").mkString(", ")})"
    val cases = langs.map(l =>
      s"WHEN c_$l = best AND best > 0 THEN '$l'").mkString(" ")
    s"""lc AS (SELECT doc_id,
       |    $cnts
       |  FROM documents),
       |lb AS (SELECT doc_id, c_en, c_fr, c_es, c_de, c_zh, $best AS best FROM lc),
       |pred AS (SELECT doc_id, CASE $cases ELSE 'und' END AS pred_lang FROM lb)""".stripMargin
  }

  /** DuckDB mirror of Text.minhashMix(h, i): the SAME A/B/C literals
    * the Spark side uses, over a 60-bit base hash `h`.
    */
  private def mixSql(h: String, i: Int): String =
    s"((($h & ${(1L << 30) - 1}) * ${Text.minhashA(i)} + " +
      s"($h >> 30) * ${Text.minhashB(i)} + ${Text.minhashC(i)}) % ${1L << 60})"

  /** The trigram inverted-index pair chain ending in
    * `jac(a_id, b_id, jaccard)` (UNROUNDED jaccard) — the single
    * source of the q37 pair formula, shared with the q211 threshold
    * sweep so the two cannot drift.
    */
  private[graft] val ngramJacCtes: String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |sh AS (SELECT doc_id, unnest(list_distinct($shingles3)) AS shingle FROM t),
       |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_int
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |jac AS (SELECT a_id, b_id,
       |    CAST(n_int AS DOUBLE) /
       |      CAST(sa.n_sh + sb.n_sh - n_int AS DOUBLE) AS jaccard
       |  FROM inter
       |  JOIN sz sa ON a_id = sa.doc_id
       |  JOIN sz sb ON b_id = sb.doc_id)""".stripMargin

  /** The minhash-LSH banding CTE prefix ending in
    * `bands(doc_id, band, bucket)` — the single source of the banding
    * formula, shared by the pair form below and the incremental-lookup
    * oracle (Oracle4 q93) so the two cannot drift.
    */
  private[graft] val lshBandCtes: String = {
    val sigs = (0 until 8).map(i =>
      s"list_min(list_transform(hl, h -> ${mixSql("h", i)})) AS s$i")
      .mkString(",\n  ")
    val bandRows = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, CAST(s${2 * b} AS VARCHAR) || '_' || " +
        s"CAST(s${2 * b + 1} AS VARCHAR) AS bucket FROM sig")
      .mkString("\n  UNION ALL\n  ")
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id, $shingles3 AS sh FROM t),
       |hs AS (SELECT doc_id, list_transform(sh, s -> ${md5long("s")}) AS hl FROM g),
       |sig AS (SELECT doc_id,
       |  $sigs
       |FROM hs),
       |bands AS (
       |  $bandRows
       |)""".stripMargin
  }

  /** The q46 minhash-LSH banding candidate-pair pipeline as a reusable
    * CTE chain ending in `pairs(a_id, b_id)` — shared by the q46
    * oracle and the q62 connected-components oracle (Oracle2).
    */
  private[graft] val lshPairCtes: String =
    s"""$lshBandCtes,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |)""".stripMargin

  /** The q47 simhash Hamming≤3 pair pipeline (brute-force form) as a
    * reusable CTE chain ending in `shpairs(a_id, b_id, hamming)` —
    * shared by the q47 oracle and the q291 dedup-family agreement
    * audit so the two cannot drift.
    */
  private[graft] val simhashPairCtes: String = {
    val shBits = (0 until 48).map { b =>
      val mask = 1L << b
      s"(CASE WHEN list_sum(list_transform(hl, h -> CASE WHEN (h & ${mask}::BIGINT) <> 0 THEN 1 ELSE -1 END)) > 0 THEN ${mask}::BIGINT ELSE 0::BIGINT END)"
    }.mkString("\n  + ")
    s"""t47 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |hv47 AS (SELECT doc_id, list_transform(toks, t -> ${md5long("t")}) AS hl FROM t47),
       |s47 AS (SELECT doc_id,
       |  $shBits AS sh FROM hv47),
       |shpairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
       |  FROM s47 a JOIN s47 b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.sh, b.sh)) <= 3
       |)""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "q32_langid" ->
      s"""WITH $langidPredCtes
         |SELECT doc_id, pred_lang FROM pred ORDER BY doc_id""".stripMargin,

    "q33_quality_score" -> {
      val allStop = allStopwordsIn
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  len(toks) AS n_tok,
         |  CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
         |    / CAST(greatest(len(toks), 1) AS DOUBLE) AS mtl,
         |  CAST(len(list_filter(toks, x -> x IN ($allStop))) AS DOUBLE)
         |    / CAST(greatest(len(toks), 1) AS DOUBLE) AS sr
         |  FROM t)
         |SELECT doc_id, n_tok, round(mtl, 4) AS mean_tok_len, round(sr, 4) AS stop_ratio,
         |  round((least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) + least(mtl / 5.0, 1.0)
         |    + least(sr * 5.0, 1.0)) / 3.0, 4) AS quality
         |FROM m ORDER BY doc_id""".stripMargin
    },

    "q34_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS fp, ${md5long("text")} AS fp_long
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q35_minhash_signature" -> {
      val sigs = (0 until 8).map(i =>
        s"list_min(list_transform(hl, h -> ${mixSql("h", i)})) AS s$i")
        .mkString(",\n  ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS (SELECT doc_id, $shingles3 AS sh FROM t),
         |hs AS (SELECT doc_id, list_transform(sh, s -> ${md5long("s")}) AS hl FROM g)
         |SELECT doc_id,
         |  $sigs
         |FROM hs ORDER BY doc_id""".stripMargin
    },

    "q36_simhash" -> {
      val bits = (0 until 16).map { b =>
        val mask = 1L << b
        s"CASE WHEN list_sum(list_transform(toks, t -> CASE WHEN (${md5long("t")} & $mask) <> 0 THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END"
      }.mkString(" || ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
         |SELECT doc_id, $bits AS simhash FROM t ORDER BY doc_id""".stripMargin
    },

    "q37_ngram_jaccard" ->
      s"""WITH $ngramJacCtes
         |SELECT a_id, b_id, round(jaccard, 4) AS jaccard
         |FROM jac WHERE jaccard >= 0.12
         |ORDER BY a_id, b_id""".stripMargin,

    "q38_embed_neardup" ->
      s"""WITH bk AS (SELECT vec_id, label, embedding,
         |    ${Oracle4.bucketSql("embedding")} AS bucket
         |  FROM embeddings)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  round(${cosine("a.embedding", "b.embedding")}, 4) AS cosine
         |FROM bk a JOIN bk b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE (${hammingSql("a.bucket", "b.bucket", 4)}) <= 1
         |  AND ${cosine("a.embedding", "b.embedding")} >= 0.4
         |ORDER BY a_id, b_id""".stripMargin,

    "q39_ann_lsh" -> {
      val bucketE = (1 to 4).map(i =>
        s"CASE WHEN ${dot("e.embedding", s"h$i.he")} > 0 THEN '1' ELSE '0' END")
        .mkString(" || ")
      val bucketP = (1 to 4).map(i =>
        s"CASE WHEN ${dot("p.pe", s"h$i.he")} > 0 THEN '1' ELSE '0' END")
        .mkString(" || ")
      val hCtes = (1 to 4).map(i =>
        s"h$i AS (SELECT embedding AS he FROM embeddings WHERE vec_id = $i)")
        .mkString(",\n")
      s"""WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
         |$hCtes,
         |b AS (SELECT e.vec_id, e.embedding, $bucketE AS bucket
         |      FROM embeddings e, h1, h2, h3, h4 WHERE e.vec_id <> 0),
         |pb AS (SELECT $bucketP AS probe_bucket FROM p, h1, h2, h3, h4)
         |SELECT b.vec_id, round(${cosine("b.embedding", "p.pe")}, 4) AS cosine
         |FROM b, pb, p WHERE b.bucket = pb.probe_bucket
         |ORDER BY cosine DESC, vec_id LIMIT 5""".stripMargin
    },

    "q40_token_stats" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_regex_tokens,
        |  n_chars, length(text) AS len_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q41_percentiles" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.95), 4) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q42_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,

    "q43_rollup" ->
      """SELECT
        |  CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE coalesce(lang, 'NULL') END AS lang,
        |  CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE coalesce(source, 'NULL') END AS source,
        |  count(*) AS n
        |FROM documents GROUP BY ROLLUP(lang, source)
        |ORDER BY lang, source""".stripMargin,

    "q44_grouping_sets" ->
      """SELECT
        |  CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE coalesce(lang, 'NULL') END AS lang,
        |  CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE coalesce(source, 'NULL') END AS source,
        |  count(*) AS n
        |FROM documents GROUP BY GROUPING SETS ((lang), (source))
        |ORDER BY lang, source""".stripMargin,

    "q45_range_window" ->
      """SELECT event_id, user_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM events ORDER BY event_id""".stripMargin,

    "q46_minhash_lsh_pairs" ->
      s"""WITH $lshPairCtes
         |SELECT a_id, b_id FROM pairs
         |ORDER BY a_id, b_id""".stripMargin,

    // the oracle is deliberately the BRUTE-FORCE all-pairs form: its
    // agreement with the Spark side's bit-band bucketed generator is
    // the result-invariance proof for the banding
    "q47_simhash_pairs" ->
      s"""WITH $simhashPairCtes
         |SELECT a_id, b_id, hamming FROM shpairs
         |ORDER BY a_id, b_id""".stripMargin,

    // Brute-force O(n·k) DFT over the zero-padded per-user signal —
    // closes the FFT oracle gap: the radix-2 FFT equals the DFT of the
    // padded signal in exact math, and the rounded features (freq is a
    // bin-index ratio k/n, energy is Σx² by Parseval) are fp-robust.
    // Signal order mirrors sort_array(struct(ts, event_id, value)):
    // (user_id, ts, event_id) is unique in the fixture, so ORDER BY
    // ts, event_id reproduces it; padding to the next power of two via
    // an exact integer powers table (no float log2).
    "q49_fft_features" ->
      """WITH sig AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS j
        |  FROM events WHERE value IS NOT NULL
        |),
        |cnt AS (SELECT user_id, count(*) AS m FROM sig GROUP BY user_id),
        |pows AS (SELECT CAST(power(2, g) AS BIGINT) AS n FROM generate_series(0, 20) t(g)),
        |dims AS (SELECT c.user_id, c.m, (SELECT min(n) FROM pows WHERE n >= c.m) AS n FROM cnt c),
        |bins AS (
        |  SELECT d.user_id, d.n, t.k
        |  FROM dims d, LATERAL (SELECT unnest(generate_series(1, CAST(d.n // 2 AS BIGINT))) AS k) t
        |),
        |spec AS (
        |  SELECT b.user_id, b.n, b.k,
        |    sum(s.value * cos(2 * pi() * b.k * s.j / b.n)) AS re,
        |    sum(0.0 - s.value * sin(2 * pi() * b.k * s.j / b.n)) AS im
        |  FROM bins b JOIN sig s ON s.user_id = b.user_id
        |  GROUP BY b.user_id, b.n, b.k
        |),
        |ranked AS (
        |  SELECT user_id, n, k, re * re + im * im AS mag2,
        |    row_number() OVER (PARTITION BY user_id ORDER BY re * re + im * im DESC, k) AS rk
        |  FROM spec
        |),
        |dom AS (
        |  SELECT user_id,
        |    CASE WHEN mag2 = 0.0 THEN 0.0 ELSE k * 1.0 / n END AS df
        |  FROM ranked WHERE rk = 1
        |),
        |energy AS (SELECT user_id, sum(value * value) AS e FROM sig GROUP BY user_id)
        |SELECT c.user_id,
        |  round(coalesce(CASE WHEN c.m < 2 THEN 0.0 ELSE d.df END, 0.0), 6) AS dom_freq,
        |  round(en.e, 4) AS spec_energy
        |FROM cnt c LEFT JOIN dom d USING (user_id) JOIN energy en USING (user_id)
        |ORDER BY c.user_id""".stripMargin,

    // q50b: the oracle pins the invariant booleans as REQUIRED
    // literals (a broken PCA flips one Spark-side → hash fail) and
    // independently recomputes n_vecs/n_dims/total_var from raw
    // parquet via the q246 moment convention
    "q50b_pca_invariants" ->
      """WITH x AS (SELECT vec_id, r.i AS dim,
        |    CAST(embedding[CAST(r.i AS INT) + 1] AS DOUBLE) AS x
        |  FROM embeddings,
        |    LATERAL unnest(range(0, len(embedding))) AS r(i)),
        |m AS (SELECT dim, count(*) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
        |  FROM x GROUP BY dim),
        |v AS (SELECT dim,
        |    CAST(round(sxx / n - (sx / n) * (sx / n), 6)
        |      AS DECIMAL(18,6)) AS var
        |  FROM m),
        |t AS (SELECT round(CAST(sum(var) AS DOUBLE), 4) AS total_var,
        |    count(*) AS n_dims
        |  FROM v),
        |c AS (SELECT count(*) AS n_vecs FROM embeddings)
        |SELECT c.n_vecs, CAST(t.n_dims AS INT) AS n_dims, 3 AS k,
        |  true AS orthonormal_ok, true AS variance_ordered_ok,
        |  true AS explained_le_total_ok, true AS projection_contractive_ok,
        |  t.total_var
        |FROM c, t""".stripMargin,

    // q50c: the axes-baseline numbers are recomputed EXACTLY from the
    // raw parquet (decimal-moment per-dim variances, top-3 by
    // (var desc, dim asc)); the quality booleans are REQUIRED literals
    // — a PCA losing to the coordinate-axes baseline hash-fails here
    "q50c_pca_reconstruction" ->
      """WITH x AS (SELECT vec_id, r.i AS dim,
        |    CAST(embedding[CAST(r.i AS INT) + 1] AS DOUBLE) AS x
        |  FROM embeddings,
        |    LATERAL unnest(range(0, len(embedding))) AS r(i)),
        |m AS (SELECT dim, count(*) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
        |  FROM x GROUP BY dim),
        |v AS (SELECT dim,
        |    CAST(round(sxx / n - (sx / n) * (sx / n), 6)
        |      AS DECIMAL(18,6)) AS var
        |  FROM m),
        |t AS (SELECT round(CAST(sum(var) AS DOUBLE), 4) AS total_var FROM v),
        |tk AS (SELECT round(CAST(sum(var) AS DOUBLE), 4) AS axes_var_topk
        |  FROM (SELECT var FROM v ORDER BY var DESC, dim ASC LIMIT 3)),
        |c AS (SELECT count(*) AS n_vecs FROM embeddings)
        |SELECT c.n_vecs, 3 AS k, t.total_var, tk.axes_var_topk,
        |  true AS resid_nonneg_ok, true AS pca_beats_axes_ok,
        |  true AS capture_in_unit_ok
        |FROM c, t, tk""".stripMargin,

    // q50d: fixed-60-iteration power method with deflation in
    // recursive SQL over the synthetic rank-3 covariance — the
    // MATERIALIZED CTEs are load-bearing (without them each recursive
    // step re-evaluates the upstream chain and the plan goes
    // exponential). Sign rule mirrors the Spark side: largest-|v|
    // coordinate positive.
    "q50d_pca_power_oracle" -> Q50dOracle.sql,

    "q51_balanced_sample" ->
      """SELECT doc_id, lang, rn FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,

    "q52_hash_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${md5long("text")} % 100 < 10
         |ORDER BY doc_id""".stripMargin,

    "q53_redact" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[0-9]+')) AS n_redacted,
        |  md5(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS redacted_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q54_repetition_filter" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS (SELECT doc_id, $shingles3 AS sh FROM t)
         |SELECT doc_id,
         |  round(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE)
         |    / CAST(greatest(len(sh), 1) AS DOUBLE), 4) AS dup_ratio,
         |  round(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE)
         |    / CAST(greatest(len(sh), 1) AS DOUBLE), 4) <= 0.6 AS keep
         |FROM g ORDER BY doc_id""".stripMargin
  )
}
