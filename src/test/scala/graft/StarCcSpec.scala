package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Large-star/small-star connected components: equality against the
  * min-label implementation (same contract, same values) plus the
  * structural properties the contraction guarantees — this is the
  * proof that the documented billion-edge upgrade path is a drop-in.
  */
class StarCcSpec extends SparkSpec {
  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star CC == min-label CC on the LSH candidate pairs") {
    val edges = Dedup.lshCandidates(Tables.documents(spark, sf),
      $"text", $"doc_id", n = 3, bands = 4, rowsPerBand = 2)
      .localCheckpoint()
    val byLabel = labels(Dedup.connectedComponents(edges, "a_id", "b_id"))
    val byStar = labels(Dedup.connectedComponentsStar(edges, "a_id", "b_id"))
    assert(byLabel.nonEmpty, "expected planted near-dups to produce edges")
    assert(byStar == byLabel)
  }

  test("star CC contracts a 1000-node chain to one component in few rounds") {
    // worst case for plain neighbor propagation (diameter = n);
    // star contraction must close it within the O(log n) round budget
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("a", "b")
    val out = labels(Dedup.connectedComponentsStar(chain, "a", "b", maxIter = 15))
    assert(out.size == 1000)
    assert(out.values.toSet == Set(0L))
  }

  test("star CC == min-label CC on seeded random graphs (incl. singleton edges + multi-components)") {
    val rng = new scala.util.Random(421L)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 40
      val edges = (1 to n).map { _ =>
        val a = rng.nextInt(n).toLong; val b = rng.nextInt(n).toLong
        (a, b)
      }.filter { case (a, b) => a != b }.toDF("a", "b")
      val byLabel = labels(Dedup.connectedComponents(edges, "a", "b"))
      val byStar = labels(Dedup.connectedComponentsStar(edges, "a", "b"))
      assert(byStar == byLabel, s"trial $trial: star != min-label")
      // every cluster id is the minimum of its member set
      byStar.groupBy(_._2).foreach { case (c, members) =>
        assert(members.keys.min == c, s"cluster $c min is ${members.keys.min}")
      }
    }
  }

  test("star CC on an empty edge list is empty") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponentsStar(empty, "a", "b").count() == 0)
  }

  test("star CC keeps self-loop-only nodes as singleton clusters (contract parity)") {
    val pairs = Seq((5L, 5L), (1L, 2L)).toDF("a", "b")
    val byStar = labels(Dedup.connectedComponentsStar(pairs, "a", "b"))
    val byLabel = labels(Dedup.connectedComponents(pairs, "a", "b"))
    assert(byStar == Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
    assert(byStar == byLabel)
  }
}
