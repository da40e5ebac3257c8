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

/** Tagged variant of [[BoundedCollectAggregator]]: collects
  * (id, payload) pairs with the same cap/overflow-to-empty semantics,
  * sorted by id in `finish`. Lets a small fixed-width payload (e.g. a
  * 63-bit simhash) ride the bucket collection so the confirm step
  * needs NO join back to the signature lineage — at corpus scale that
  * join's other side is a full recompute of the signature aggregation,
  * the dominant term. Shuffle rows grow by 8 bytes; a second
  * corpus-wide pass disappears.
  */
final class BoundedCollectPairsAggregator(cap: Int)
    extends Aggregator[(Long, Long),
      scala.collection.mutable.ArrayBuffer[(Long, Long)], Array[(Long, Long)]] {
  require(cap > 0, s"cap must be positive, got $cap")

  import scala.collection.mutable.ArrayBuffer

  override def zero: ArrayBuffer[(Long, Long)] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[(Long, Long)], x: (Long, Long)): ArrayBuffer[(Long, Long)] = {
    if (b.length <= cap) b += x
    b
  }

  override def merge(
      a: ArrayBuffer[(Long, Long)], b: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    if (a.length > cap) a
    else if (b.length > cap) b
    else {
      var i = 0
      while (i < b.length && a.length <= cap) { a += b(i); i += 1 }
      a
    }
  }

  override def finish(r: ArrayBuffer[(Long, Long)]): Array[(Long, Long)] =
    if (r.length > cap) Array.empty
    else r.toArray.sortBy(_._1)

  override def bufferEncoder: Encoder[scala.collection.mutable.ArrayBuffer[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[scala.collection.mutable.ArrayBuffer[(Long, Long)]]()
  override def outputEncoder: Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()
}

object BoundedCollectAggregator {
  /** Untyped handle: `bounded(10000)(col("doc_id"))` → sorted
    * `array<long>`, or empty if the group exceeded the cap.
    */
  def bounded(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new BoundedCollectAggregator(cap), Encoders.scalaLong)

  /** Tagged handle: `boundedPairs(10000)(col("doc_id"), col("simhash"))`
    * → `array<struct<_1,_2>>` sorted by `_1`, or empty past the cap.
    */
  def boundedPairs(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new BoundedCollectPairsAggregator(cap),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
}
