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
    extends Aggregator[Long, scala.collection.mutable.ArrayBuffer[Long], Array[Long]] {
  require(cap > 0, s"cap must be positive, got $cap")

  import scala.collection.mutable.ArrayBuffer

  // state: unsorted id buffer, length ≤ cap+1; length == cap+1 is the
  // saturated "overflowed" marker and stops absorbing input. A
  // growable buffer keeps appends amortized O(1) — an immutable array
  // copied per element would do O(cap²) copying inside every
  // degenerate bucket before it saturates. Objects live unserialized
  // under ObjectHashAggregate; the encoder only runs at the exchange.
  override def zero: ArrayBuffer[Long] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[Long], x: Long): ArrayBuffer[Long] = {
    if (b.length <= cap) b += x
    b
  }

  override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    if (a.length > cap) a
    else if (b.length > cap) b
    else {
      // append until saturation; once over the cap the bucket finishes
      // empty regardless, so dropped tail elements are immaterial
      var i = 0
      while (i < b.length && a.length <= cap) { a += b(i); i += 1 }
      a
    }
  }

  override def finish(r: ArrayBuffer[Long]): Array[Long] =
    if (r.length > cap) Array.empty
    else { val out = r.toArray; java.util.Arrays.sort(out); out }

  override def bufferEncoder: Encoder[scala.collection.mutable.ArrayBuffer[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[scala.collection.mutable.ArrayBuffer[Long]]()
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
