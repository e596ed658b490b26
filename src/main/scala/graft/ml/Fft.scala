package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Frequency-domain features (reference F6/F7: dominant frequency =
  * argmax of the FFT magnitude spectrum, spectral energy = sum of
  * squared magnitudes; README.md:464-465).
  *
  * Radix-2 iterative Cooley–Tukey on the executor (pure Scala, no
  * deps). Inputs are zero-padded to the next power of two. Exposed as
  * Scala UDFs — the one place the library leaves whole-stage codegen
  * (SURVEY.md §7.5 allows it; a custom Expression is the upgrade path
  * if the bench ever shows this hot).
  */
object Fft {

  /** In-place iterative FFT; re/im are modified. Length must be a
    * power of two.
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"FFT length must be a power of 2, got $n")
    // bit reversal
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blk + k; val b = blk + k + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  private def pow2ceil(n: Int): Int = {
    var p = 1; while (p < n) p <<= 1; p
  }

  /** Magnitude spectrum of the first n/2+1 bins (real input). */
  def magnitudeSpectrum(signal: Seq[Double]): Array[Double] = {
    val n = pow2ceil(math.max(signal.length, 1))
    val re = new Array[Double](n); val im = new Array[Double](n)
    signal.copyToArray(re)
    fft(re, im)
    (0 to n / 2).map(k => math.hypot(re(k), im(k))).toArray
  }

  /** Dominant frequency in Hz given a sample rate: argmax over bins
    * 1..n/2 (DC excluded), ties → lowest bin.
    */
  def dominantFreq(signal: Seq[Double], sampleRateHz: Double): Double = {
    if (signal.length < 2) return 0.0 // no non-DC bin exists
    val mag = magnitudeSpectrum(signal)
    val n = (mag.length - 1) * 2
    var best = 1; var k = 2
    while (k < mag.length) { if (mag(k) > mag(best)) best = k; k += 1 }
    if (mag(best) == 0.0) 0.0 // constant/DC-only signal: no dominant frequency
    else best.toDouble * sampleRateHz / n
  }

  /** Spectral energy = Σ|X(k)|² over the full spectrum / n — equals
    * Σx² by Parseval (tested).
    */
  def spectralEnergy(signal: Seq[Double]): Double = {
    val n = pow2ceil(math.max(signal.length, 1))
    val re = new Array[Double](n); val im = new Array[Double](n)
    signal.copyToArray(re)
    fft(re, im)
    var s = 0.0; var k = 0
    while (k < n) { s += re(k) * re(k) + im(k) * im(k); k += 1 }
    s / n
  }

  // ---- Column API ------------------------------------------------------

  private val dominantFreqUdf =
    udf((xs: Seq[Double], sr: Double) => dominantFreq(xs, sr))
  private val spectralEnergyUdf =
    udf((xs: Seq[Double]) => spectralEnergy(xs))

  def dominant_freq(signal: Column, sampleRateHz: Column): Column =
    dominantFreqUdf(signal, sampleRateHz)

  def spectral_energy(signal: Column): Column = spectralEnergyUdf(signal)
}
