package graft

import org.apache.spark.sql.functions._
import graft.functions.Signal

/** Golden tests from the reference's worked examples
  * (FIXTURES.md §B3 ← FeatureEngineeringApproaches.md:69-87) plus the
  * differential invariant (array form ≡ group form,
  * FeatureEngineeringApproaches.md:263-276).
  */
class SignalSpec extends SparkSpec {
  import spark.implicits._

  val X = Seq(9, 19, -68, -29, 27, 74, -35, -11, 23, 3)
  val Y = Seq(130, 0, -11, 134, 122, -35, -95, 107, 66, 5)
  val Z = Seq(-991, -1032, -1065, -1046, -1136, -1116, -917, -864, -985, -1057)

  private def arr(xs: Seq[Int]) = Seq(xs.map(_.toDouble)).toDF("a")

  private def one(df: org.apache.spark.sql.DataFrame): Double =
    df.head().getDouble(0)

  test("array RMS matches reference golden values") {
    assert(math.abs(one(arr(X).select(Signal.arrayRms($"a"))) - 37.41122826104484) < 1e-9)
    assert(math.abs(one(arr(Y).select(Signal.arrayRms($"a"))) - 87.14413348011443) < 1e-9)
    assert(math.abs(one(arr(Z).select(Signal.arrayRms($"a"))) - 1024.0242672905754) < 1e-9)
  }

  test("array peak matches reference golden values") {
    assert(one(arr(X).select(Signal.arrayPeak($"a"))) == 74.0)
    assert(one(arr(Y).select(Signal.arrayPeak($"a"))) == 134.0)
    assert(one(arr(Z).select(Signal.arrayPeak($"a"))) == 1136.0)
  }

  test("array population excess kurtosis matches explicit-moment formula") {
    assert(math.abs(one(arr(X).select(Signal.arrayKurtosis($"a"))) - (-0.21903)) < 1e-4)
    assert(math.abs(one(arr(Y).select(Signal.arrayKurtosis($"a"))) - (-1.24211)) < 1e-4)
    assert(math.abs(one(arr(Z).select(Signal.arrayKurtosis($"a"))) - (-0.57900)) < 1e-4)
  }

  test("Spark built-in kurtosis IS population excess (matches array form)") {
    val flat = X.map(_.toDouble).toDF("v")
    val builtin = one(flat.agg(kurtosis($"v")))
    val explicitK = one(arr(X).select(Signal.arrayKurtosis($"a")))
    assert(math.abs(builtin - explicitK) < 1e-9)
  }

  test("differential: group-form features == array-form features") {
    // Approach 1 (per-row array exprs) vs Approach 2 (explode + group agg),
    // mirroring FeatureEngineeringApproaches.md:263-276.
    val asArray = arr(Y).select(
      Signal.arrayRms($"a").as("rms"), Signal.arrayPeak($"a").as("peak"))
    val exploded = arr(Y).select(explode($"a").as("v"))
      .agg(Signal.rms($"v").as("rms"), Signal.peak($"v").as("peak"))
    val a = asArray.head(); val g = exploded.head()
    assert(math.abs(a.getDouble(0) - g.getDouble(0)) < 1e-9)
    assert(a.getDouble(1) == g.getDouble(1))
  }

  test("crest factor and peak-to-peak basics") {
    val flat = X.map(_.toDouble).toDF("v")
    val row = flat.agg(
      Signal.crest($"v").as("c"), Signal.peakToPeak($"v").as("p")).head()
    assert(math.abs(row.getDouble(0) - 74.0 / 37.41122826104484) < 1e-9)
    assert(row.getDouble(1) == 74.0 - (-68.0))
  }

  test("property: rms <= peak, crest >= 1, ptp >= 0 on random signals") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val xs = Seq.fill(32)(rnd.nextDouble() * 200 - 100)
      val row = xs.toDF("v").agg(
        Signal.rms($"v"), Signal.peak($"v"), Signal.crest($"v"),
        Signal.peakToPeak($"v")).head()
      val (r, p, c, ptp) =
        (row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
      assert(r <= p + 1e-12); assert(c >= 1.0 - 1e-12); assert(ptp >= 0)
    }
  }

  test("property: kurtosis is shift- and scale-invariant") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(64)(rnd.nextDouble() * 10)
    val k0 = one(xs.toDF("v").agg(kurtosis($"v")))
    val k1 = one(xs.map(_ + 1000.0).toDF("v").agg(kurtosis($"v")))
    val k2 = one(xs.map(_ * 37.5).toDF("v").agg(kurtosis($"v")))
    assert(math.abs(k0 - k1) < 1e-6); assert(math.abs(k0 - k2) < 1e-6)
  }

  test("completeness counts null fraction") {
    val df = Seq(Some(1.0), None, Some(3.0), None).toDF("v")
    assert(one(df.agg(Signal.completeness($"v"))) == 0.5)
  }
}
