package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded top-k aggregate over (score, id) pairs, best-first by
  * (score DESC, id ASC) — the per-partition-heap half of a distributed
  * top-k (SURVEY.md §2.12).
  *
  * Registered through `functions.udaf`, which plants it as a
  * `ScalaAggregator` — a `TypedImperativeAggregate` — under
  * ObjectHashAggregate with partial aggregation: every map partition
  * reduces its rows to at most k pairs per group BEFORE the exchange,
  * so shuffle volume is k·partitions·groups instead of the full scored
  * row count. This replaces the window `row_number` top-k in
  * `q_sim_topk`, whose exchange carried every (query × candidate)
  * scored row — the plan that stops scaling at 100×.
  *
  * The buffer is a sorted array of ≤ k pairs (k is small — single-digit
  * neighbors-per-query): O(k) insertion beats heap constant factors and
  * serializes as a plain array between partial and final aggregation.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  // strict weak order: rank (score DESC, id ASC) — ties on score are
  // broken by the smaller id, matching the oracle's ORDER BY ... DESC, id
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(
      b: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] = {
    if (b.length >= k && !better(x, b(b.length - 1))) return b // common case: not in top-k
    val out = new Array[(Double, Long)](math.min(k, b.length + 1))
    var i = 0; var j = 0; var placed = false
    while (j < out.length) {
      if (!placed && (i >= b.length || better(x, b(i)))) { out(j) = x; placed = true }
      else { out(j) = b(i); i += 1 }
      j += 1
    }
    out
  }

  override def merge(
      a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[(Double, Long)](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var t = 0
    while (t < out.length) {
      out(t) =
        if (j >= b.length || (i < a.length && better(a(i), b(j)))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      t += 1
    }
    out
  }

  override def finish(r: Array[(Double, Long)]): Seq[(Double, Long)] = r.toSeq

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {
  /** Untyped-DataFrame handle: `topk(5)(col("cosine"), col("id"))` →
    * `array<struct<_1 double, _2 long>>` sorted best-first.
    */
  def topk(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
}
