package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Hard-capped id collection for LSH candidate generation: collects a
  * bucket's member ids like `collect_list`, but with aggregation state
  * bounded at `cap + 1` elements — a bucket that exceeds the cap
  * finishes as EMPTY (the degenerate-bucket drop), never as an
  * unbounded buffer.
  *
  * Why not `collect_list` + a count prefilter: the prefilter needs a
  * second aggregation pass over the bucketed rows, and in a DAG that
  * means the bucket column's lineage — for MinHash bands, the full
  * 8-hash signature computation over every shingle of the corpus — is
  * COMPUTED TWICE (Spark shares no common subexpressions across plan
  * branches without an explicit persist, and persisting corpus-scale
  * intermediates is its own scale problem). This aggregator enforces
  * the same skew ceiling in ONE pass with O(cap) state:
  * per-partition partials stop growing at cap+1 ids, merges re-cap, and
  * `finish` maps overflow to empty. Worst-case shuffle for a degenerate
  * bucket is (cap+1)·partitions ids — bounded and tunable — versus the
  * prefilter's constant-state count rows; the trade buys back an entire
  * corpus-wide recompute, which at 100 TB is the dominant term.
  *
  * A surviving bucket finishes as its SORTED id array (inputs are
  * unique per bucket by construction: one row per (bucket, id)), so
  * downstream pair explosion can use `x > id` to emit each unordered
  * pair once.
  */
final class BoundedCollectAggregator(cap: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(cap > 0, s"cap must be positive, got $cap")

  // state: unsorted id array, length ≤ cap+1; length == cap+1 is the
  // saturated "overflowed" marker and stops absorbing input
  override def zero: Array[Long] = Array.empty

  override def reduce(b: Array[Long], x: Long): Array[Long] = {
    if (b.length > cap) b
    else {
      val out = java.util.Arrays.copyOf(b, b.length + 1)
      out(b.length) = x
      out
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.length > cap) a
    else if (b.length > cap) b
    else {
      val n = math.min(cap + 1, a.length + b.length)
      val out = java.util.Arrays.copyOf(a, n)
      var i = a.length; var j = 0
      while (i < n) { out(i) = b(j); i += 1; j += 1 }
      out
    }
  }

  override def finish(r: Array[Long]): Array[Long] =
    if (r.length > cap) Array.empty
    else { java.util.Arrays.sort(r); r }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BoundedCollectAggregator {
  /** Untyped handle: `bounded(10000)(col("doc_id"))` → sorted
    * `array<long>`, or empty if the group exceeded the cap.
    */
  def bounded(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new BoundedCollectAggregator(cap), Encoders.scalaLong)
}
