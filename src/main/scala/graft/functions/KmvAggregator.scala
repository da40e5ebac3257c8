package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** K-Minimum-Values distinct sketch: keeps the k smallest DISTINCT
  * hash values seen, as a sorted array. The classic mergeable
  * distinct-count sketch (Bar-Yossef et al. 2002): with values hashed
  * uniformly into [0, 2^60), the k-th smallest kept hash h_(k)
  * estimates the distinct count as (k-1) · 2^60 / h_(k).
  *
  * Why it exists next to the built-in HLL family (SketchOps
  * .q_sketch_merge): an HLL binary is engine-specific, so its estimate
  * can only ever get a rows-only check. A KMV sketch is DETERMINISTIC
  * given the hash function — DuckDB reproduces the identical k minima
  * with a rank window over the same md5-derived 60-bit values — so the
  * whole sketch pipeline (per-group build, cross-group merge, estimate)
  * sits under the exact hash-match oracle like any relational query.
  *
  * Scale shape is the partial-merge pattern: O(k) state per group
  * (k·8 bytes, amortized-O(1) inserts away from the sorted form),
  * kilobyte partials across the shuffle, and a union level that
  * re-aggregates the per-group ARRAYS ([[KmvMergeAggregator]]) without
  * ever rescanning the fact table — the same two-level stance as
  * q_sketch_merge's hll_union_agg.
  */
final class KmvAggregator(k: Int)
    extends Aggregator[Long, scala.collection.mutable.ArrayBuffer[Long], Array[Long]] {
  require(k > 0, s"k must be positive, got $k")

  import scala.collection.mutable.ArrayBuffer

  // state: UNSORTED distinct values while small (append + linear
  // contains — k is small, and hash values repeat rarely), compacted
  // to the sorted top-k form only when the buffer doubles past k.
  // Keeping strictly-sorted state would cost an O(k) memmove per
  // insert on adversarial descending input.
  override def zero: ArrayBuffer[Long] = ArrayBuffer.empty

  private def compact(b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    val arr = b.toArray
    java.util.Arrays.sort(arr)
    b.clear()
    // sorted dedup, stop once k survivors are kept
    var i = 0
    var last = Long.MinValue
    while (i < arr.length && b.length < k) {
      if (i == 0 || arr(i) != last) { b += arr(i); last = arr(i) }
      i += 1
    }
    b
  }

  override def reduce(b: ArrayBuffer[Long], x: Long): ArrayBuffer[Long] = {
    if (!b.contains(x)) {
      b += x
      if (b.length >= 2 * k) compact(b)
    }
    b
  }

  override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (i < b.length) {
      if (!a.contains(b(i))) {
        a += b(i)
        if (a.length >= 2 * k) compact(a)
      }
      i += 1
    }
    a
  }

  override def finish(r: ArrayBuffer[Long]): Array[Long] = compact(r).toArray

  override def bufferEncoder: Encoder[scala.collection.mutable.ArrayBuffer[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[scala.collection.mutable.ArrayBuffer[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Union level for [[KmvAggregator]]: merges finished per-group
  * sketches (sorted distinct arrays) into one — input is the ARRAY
  * column, so a global estimate aggregates G kilobyte rows, not the
  * corpus. Merging KMV sketches is exact: the k smallest of a union
  * are a subset of the per-part k smallest.
  */
final class KmvMergeAggregator(k: Int)
    extends Aggregator[Array[Long], scala.collection.mutable.ArrayBuffer[Long], Array[Long]] {
  require(k > 0, s"k must be positive, got $k")

  import scala.collection.mutable.ArrayBuffer

  private val one = new KmvAggregator(k)

  override def zero: ArrayBuffer[Long] = ArrayBuffer.empty
  override def reduce(b: ArrayBuffer[Long], xs: Array[Long]): ArrayBuffer[Long] = {
    var i = 0
    var acc = b
    while (i < xs.length) { acc = one.reduce(acc, xs(i)); i += 1 }
    acc
  }
  override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] =
    one.merge(a, b)
  override def finish(r: ArrayBuffer[Long]): Array[Long] = one.finish(r)

  override def bufferEncoder: Encoder[scala.collection.mutable.ArrayBuffer[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[scala.collection.mutable.ArrayBuffer[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvAggregator {
  /** The engine-portable 60-bit hash the column pipelines compute as
    * `conv(substring(md5(concat('kmv:', v)), 1, 15), 16, 10)` —
    * executor-side Scala form, so streaming state (StatefulOps
    * .streamingDistinct) and batch sketches agree bit-for-bit.
    */
  // per-thread digest (same pattern as MinHashAggregator): hash60 runs
  // once per streamed row, so per-call getInstance would be hot-path
  // allocation for nothing
  private val md5: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def hash60(value: String): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(("kmv:" + value).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = the high 60 bits of the first 8 bytes
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }

  /** Build handle: `kmv(64)(col("hv"))` → sorted `array<long>` of the
    * ≤ 64 smallest distinct inputs.
    */
  def kmv(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvAggregator(k), Encoders.scalaLong)

  /** Merge handle: `kmvMerge(64)(col("sk"))` over finished sketch
    * arrays — the union/rollup level.
    */
  def kmvMerge(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new KmvMergeAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
}
