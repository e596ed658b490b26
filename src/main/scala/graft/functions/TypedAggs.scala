package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY §2.9's Dataset-API
  * aggregation path, complementing the untyped TypedImperativeAggregate
  * in [[SketchAggregates]]).
  *
  * [[TopKByLen]] is the demonstrator: per-group top-k through a
  * BOUNDED buffer. The window form (row_number ≤ k, q129) sorts every
  * group member inside its partition; this aggregator carries at most
  * k (id, len) pairs per group through a normal partial+final
  * aggregate — at 100 TB the shuffle holds k rows per group instead
  * of the group's full population, the same reason TakeOrdered beats
  * global sort for ungrouped top-k. The (len desc, id asc) order is
  * TOTAL, so insert-and-trim is associative and commutative — any
  * partitioning folds to the same buffer (the q145 merge-invariance
  * argument, proved for both in PropertySpec/ScaleOpsSpec).
  */
object TypedAggs {

  case class DocRow(lang: String, doc_id: Long, n_chars: Long)

  /** Buffer/output wrapper: product encoding covers `Seq[(Long, Long)]`
    * only when nested inside a case class.
    */
  case class TopBuf(items: Seq[(Long, Long)])

  /** Top-k (doc_id, n_chars) per group by n_chars desc, doc_id asc. */
  class TopKByLen(k: Int)
      extends Aggregator[DocRow, TopBuf, TopBuf] with Serializable {
    private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
      s.sortBy(t => (-t._2, t._1)).take(k)
    override def zero: TopBuf = TopBuf(Seq.empty)
    override def reduce(b: TopBuf, a: DocRow): TopBuf =
      TopBuf(trim(b.items :+ ((a.doc_id, a.n_chars))))
    override def merge(b1: TopBuf, b2: TopBuf): TopBuf =
      TopBuf(trim(b1.items ++ b2.items))
    override def finish(r: TopBuf): TopBuf = r
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  }
}
