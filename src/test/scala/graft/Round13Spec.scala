package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** Round-13 hardening gates (VERDICT r12 #4 + ADVICE r12). */
class Round13Spec extends SparkSpec {

  test("docToks fails loudly on a corpus missing `source` (no silent null substitute)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r13_nosource").toString
    Seq(("d1", "hello world"), ("d2", "tok tok tok"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val ex = intercept[AnalysisException] {
      TokenStages.docToks(spark, dir).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("source"))
  }

  test("q17 snapshot sequence is per-dataset: interleaved sf dirs keep each lineage's previous snapshot") {
    // two datasets interleaved A,B,A,B — after the second A invocation
    // the FIRST A snapshot (seq 1, i.e. seq-1 of A's own counter) must
    // still exist; with a shared counter A's first snapshot would have
    // been swept by the global seq-2 rule.
    val pid = ProcessHandle.current().pid()
    def snaps(d: String): Seq[String] = {
      val base = s"q17_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      Option(new java.io.File("/root/repo/target/lake").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(base + "_i") &&
          f.getName.endsWith(s"_p$pid"))
        .map(_.getName).toSeq.sorted
    }
    val a = sf
    val b = "/root/testdata/sf0.01"
    Queries.q17(spark, a).collect()
    Queries.q17(spark, b).collect()
    val aAfterFirst = snaps(a)
    Queries.q17(spark, a).collect()
    Queries.q17(spark, b).collect()
    // each dataset retains its own previous snapshot
    assert(snaps(a).intersect(aAfterFirst).nonEmpty,
      s"A's previous snapshot swept: before=${aAfterFirst} after=${snaps(a)}")
    assert(snaps(a).size == 2 && snaps(b).size == 2,
      s"expected 2 retained snapshots per dataset, got A=${snaps(a)} B=${snaps(b)}")
  }

  test("prefixJaccardPairs == brute-force ngram Jaccard at t=0.8, incl. n % 5 == 0 set sizes") {
    // recall-1.0 pin for the round-13 PPJoin pipeline (shared posting
    // stage + Combos candidate expansion + array_intersect verify),
    // on a corpus with genuine above-threshold pairs AND docs whose
    // distinct-shingle count is a multiple of 5 — the sizes where the
    // old double-arithmetic ceil(0.8·n) under-sized the prefix by one
    // token (theorem violation; see Dedup.prefixJaccardPairs).
    import spark.implicits._
    import graft.operators.Dedup
    import org.apache.spark.sql.functions._
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val pool = (0 until 24).map(i => s"w$i")
    val rows = (0 until 120).flatMap { i =>
      val len = 6 + (mix(i).abs % 40).toInt
      val toks = (0 until len).map(k =>
        pool((mix(i.toLong * 131 + k).abs % 24).toInt))
      val twin = if (toks.length > 2)
        toks.updated(toks.length / 2, s"zz$i") else toks
      Seq((2L * i, toks.mkString(" ")), (2L * i + 1, twin.mkString(" ")))
    }
    val c = rows.toDF("doc_id", "text").repartition(4).cache()
    val posted = Dedup.dfAnnotatedPostings(c, $"text", $"doc_id", 3)
    // the boundary sizes are actually present in this corpus
    assert(posted.select($"doc_id", $"n").distinct()
      .filter($"n" % 5 === 0).count() > 0, "no n % 5 == 0 docs drawn")
    val sets = c.select($"doc_id",
      graft.functions.TextExpressions.shingle_hashes($"text", 3).as("shs"))
    val fast = Dedup.prefixJaccardPairs(posted, sets, 4, 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val brute = Dedup.ngramJaccardPairs(c, $"text", $"doc_id",
        n = 3, minJaccard = 0.8).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    c.unpersist()
    assert(brute.nonEmpty, "corpus drew no above-threshold pairs")
    assert(fast == brute,
      s"fast\\brute=${(fast.toSet -- brute.toSet).take(3)}, " +
        s"brute\\fast=${(brute.toSet -- fast.toSet).take(3)}")
  }

  test("Combos errors descriptively instead of overflowing on huge inputs (bound documented)") {
    // n=3000 at k=3 → 4.5e9 tuples: Int math would go negative and
    // throw NegativeArraySizeException; the kernel must raise a clear
    // IllegalArgumentException instead. Evaluate the expression
    // directly (driver-side) so the test is cheap.
    val big = org.apache.spark.sql.catalyst.expressions.Literal(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.tabulate[Any](3000)(i =>
          org.apache.spark.unsafe.types.UTF8String.fromString(s"t$i"))),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    val combos = graft.functions.TextExpressions.Combos(big, 3)
    val ex = intercept[IllegalArgumentException] { combos.eval(null) }
    assert(ex.getMessage.contains("cap the input list"))
  }
}
