package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator form of the sequential scan family (SURVEY.md §2.6
  * W2/W7, §2.10 "scan(a, init, step)" long-form row): recurrences are
  * order-dependent but Spark aggregation input order is NOT defined, so
  * the buffer accumulates (ord, value) pairs and the FINISH step sorts
  * then folds. Buffer size is bounded by series length (reference: 200),
  * so partial-aggregate merging stays cheap at any row count — this is
  * the same contract as collect_list-then-sort, expressed as a reusable
  * typed operator that also slots into Dataset.groupByKey(...).agg(...).
  */
object ScanAggregator {

  /** one long-form observation: total order (ord1, ord2) + value. */
  final case class ScanIn(ord1: Long, ord2: Double, v: Double)
  final case class ScanBuf(items: List[ScanIn])

  /** EMA recurrence: ema₀ = x₀; emaᵢ = (1−α)·emaᵢ₋₁ + α·xᵢ — identical
    * semantics to ArrayOps.emaLast over the (ord1, ord2)-sorted series.
    * (A group always has ≥1 row under groupBy, so finish never sees an
    * empty buffer; NaN is the defensive empty value.) */
  final class EmaAgg(alpha: Double) extends Aggregator[ScanIn, ScanBuf, Double] {
    override def zero: ScanBuf = ScanBuf(Nil)
    override def reduce(b: ScanBuf, a: ScanIn): ScanBuf = ScanBuf(a :: b.items)
    override def merge(a: ScanBuf, b: ScanBuf): ScanBuf =
      ScanBuf(a.items ::: b.items)
    override def finish(b: ScanBuf): Double =
      b.items.sortBy(i => (i.ord1, i.ord2)) match {
        case Nil => Double.NaN
        case head :: tail =>
          tail.foldLeft(head.v)((s, i) => s * (1 - alpha) + i.v * alpha)
      }
    override def bufferEncoder: Encoder[ScanBuf] = Encoders.product[ScanBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** column-API form: emaUdaf(alpha)(ord1, ord2, value). */
  def emaUdaf(alpha: Double): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new EmaAgg(alpha),
      Encoders.product[ScanIn])
}
