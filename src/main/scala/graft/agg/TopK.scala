package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One retained item: the scored payload of the top-k aggregation. */
case class TopItem(value: Double, id: Long)

/** Exact per-group top-k as a typed [[Aggregator]] — the scale-right
  * alternative to `row_number().over(Window.partitionBy(g))` for top-N
  * per group: a window sorts EVERY row of every group after the
  * shuffle, while this aggregator keeps at most k items of state per
  * group and combines map-side, so only |groups|·k rows ever move.
  * (The same idea as sim1's two-phase top-k, packaged as a reusable
  * typed aggregation.)
  *
  * Ordering is total and deterministic: higher value first, ties break
  * on lower id — identical to `ORDER BY value DESC, id` row_number
  * semantics, so a SQL oracle can reproduce the exact kept set.
  *
  * The buffer stays a sorted List (insertion into a ≤k list): for the
  * small k this targets (top-N dashboards, per-key exemplars) that is
  * cheaper than heap bookkeeping and keeps merge trivially correct.
  */
class TopK(k: Int)
    extends Aggregator[TopItem, List[TopItem], List[TopItem]] {
  require(k > 0, s"k must be positive: $k")

  // Total order even for NaN (sorts largest, like Spark/DuckDB ORDER BY
  // DESC) and for -0.0 == 0.0 (the == fast path keeps SQL equality);
  // a non-total `>` made the kept set depend on arrival order when a
  // NaN raced a full buffer.
  private def cmpValue(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  private def better(a: TopItem, b: TopItem): Boolean = {
    val c = cmpValue(a.value, b.value)
    c > 0 || (c == 0 && a.id < b.id)
  }

  private def insert(buf: List[TopItem], x: TopItem): List[TopItem] = {
    // skip the common no-op: full buffer and x worse than the floor
    if (buf.lengthCompare(k) >= 0 && !better(x, buf.last)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      (pre ::: x :: post).take(k)
    }
  }

  override def zero: List[TopItem] = Nil
  override def reduce(buf: List[TopItem], x: TopItem): List[TopItem] =
    insert(buf, x)
  override def merge(a: List[TopItem], b: List[TopItem]): List[TopItem] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[TopItem]): List[TopItem] = buf

  override def bufferEncoder: Encoder[List[TopItem]] = TopK.listEncoder
  override def outputEncoder: Encoder[List[TopItem]] = TopK.listEncoder
}

object TopK {
  /** Product-based (non-kryo) encoder: the aggregation output stays a
    * real `array<struct<value:double,id:bigint>>` column that SQL can
    * explode, and shuffles stay Tungsten-encoded. */
  private[agg] val listEncoder: Encoder[List[TopItem]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[TopItem]]()
}
