package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import graft.functions.TextExpressions.{Md5ShingleHashes, ShingleHashes, ShingleStrings, SimhashPacked}
import graft.functions.VectorExpressions.{DotProduct, SumSq}
import graft.ml.Fft

/** SQL surface: registers the library's custom kernels so
  * `spark.sql(...)` users get the same operators as the Column API
  * (the reference's COLUMNS-clause extensibility point,
  * FeatureEngineeringApproaches.md:229-238).
  *
  * Built-in-composable kernels (rms/peak/kurtosis/...) need no
  * registration — they are plain SQL (`sqrt(avg(v*v))` etc., see
  * Oracle.scala for the exact forms).
  *
  * The single source of truth for the SQL kernel set is [[builders]];
  * [[GraftExtensions]] installs the same list via
  * SparkSessionExtensions.
  */
object Register {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def dblLit(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** (name, usage, expression builder) for every custom SQL kernel. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", "graft_dot(a, b) - dot product of two numeric arrays",
      es => DotProduct(es(0), es(1))),
    ("graft_sumsq", "graft_sumsq(a) - sum of squared elements",
      es => SumSq(es.head)),
    ("graft_shingle_hashes",
      "graft_shingle_hashes(text, n) - distinct XXH64 hashes of word n-grams",
      es => ShingleHashes(es(0), intLit(es(1), "n"))),
    ("graft_md5_shingle_hashes",
      "graft_md5_shingle_hashes(text, n) - md5-derived 60-bit n-gram hashes (minhash base)",
      es => Md5ShingleHashes(es(0), intLit(es(1), "n"))),
    ("graft_shingle_strings",
      "graft_shingle_strings(text, n) - distinct word n-gram shingle strings",
      es => ShingleStrings(es(0), intLit(es(1), "n"))),
    ("graft_simhash",
      "graft_simhash(text, bits) - packed simhash fingerprint over whitespace tokens",
      es => SimhashPacked(es(0), intLit(es(1), "bits"))),
    ("graft_hll",
      "graft_hll(s, p) - HyperLogLog distinct estimate with 2^p byte registers",
      es => graft.functions.SketchAggregates.HllEstimate(
        es(0), intLit(es(1), "p"))),
    ("graft_hll_regs",
      "graft_hll_regs(s, p) - raw HyperLogLog register file (array<int>, length 2^p); merge register files with zip_with(a, b, greatest)",
      es => graft.functions.SketchAggregates.HllRegisters(
        es(0), intLit(es(1), "p"))),
    ("graft_qsketch",
      "graft_qsketch(v, q, s) - quantile-q estimate of non-negative bigints from a log2-linear integer sketch (relative error 2^-s)",
      es => graft.functions.SketchAggregates.QuantileSketch(
        es(0), dblLit(es(1), "q"), intLit(es(2), "s"))),
    ("graft_qsketch_counts",
      "graft_qsketch_counts(v, s) - raw sparse quantile-sketch state (array<struct<i,cnt>>); merge states by explode + sum(cnt) per i",
      es => graft.functions.SketchAggregates.QsketchCounts(
        es(0), intLit(es(1), "s"))))

  def all(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    spark.udf.register("graft_dominant_freq",
      (xs: Seq[Double], sr: Double) => Fft.dominantFreq(xs, sr))
    spark.udf.register("graft_spectral_energy",
      (xs: Seq[Double]) => Fft.spectralEnergy(xs))
  }
}
