package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (the `Aggregator[IN, BUF, OUT]` third of the
  * UDF/Expression/Aggregator extension triangle; the other two are
  * [[graft.cdc.MatchAnyRegex]] and the codegen'd column functions).
  *
  * `IndexRangeAgg` audits event-stream integrity per group: min/max
  * `event_index` and count, so `max - min + 1 == n` certifies dense,
  * gap-free numbering for a topic — the invariant the reference's atomic
  * counter provides implicitly and [[graft.cdc.EventIndexer]] must uphold
  * distributed. Partial-merge friendly (associative buffer), so Spark runs it
  * with map-side combine like any built-in aggregate. */
object Aggregators {

  final case class IdxRange(min: Long, max: Long, n: Long)

  val indexRange: Aggregator[Long, IdxRange, IdxRange] =
    new Aggregator[Long, IdxRange, IdxRange] {
      override def zero: IdxRange = IdxRange(Long.MaxValue, Long.MinValue, 0L)
      override def reduce(b: IdxRange, a: Long): IdxRange =
        IdxRange(math.min(b.min, a), math.max(b.max, a), b.n + 1)
      override def merge(x: IdxRange, y: IdxRange): IdxRange =
        IdxRange(math.min(x.min, y.min), math.max(x.max, y.max), x.n + y.n)
      override def finish(r: IdxRange): IdxRange = r
      override def bufferEncoder: Encoder[IdxRange] = Encoders.product[IdxRange]
      override def outputEncoder: Encoder[IdxRange] = Encoders.product[IdxRange]
    }

  /** `dense(range) == true` iff the observed indices are gap-free. */
  def isDense(r: IdxRange): Boolean = r.n > 0 && r.max - r.min + 1 == r.n
}
