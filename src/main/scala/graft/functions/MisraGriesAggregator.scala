package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

import scala.collection.mutable.ArrayBuffer

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982) with the
  * MERGEABLE truncation of Agarwal et al. 2012 ("Mergeable
  * Summaries" §3): k counters track candidate frequent items; when a
  * non-tracked item arrives at a full summary every counter decrements
  * by one (zeros evict), and two summaries merge by pointwise count
  * sum followed by subtracting the (k+1)-th largest count from all
  * survivors. Both operations discharge total weight in (k+1)-sized
  * blocks, which yields the guarantee this repo's oracle band-checks:
  * for every item x over a stream of total length N,
  *
  *   true(x) − ⌊N/(k+1)⌋  ≤  ĉ(x)  ≤  true(x)
  *
  * under ANY partitioning and ANY merge tree — so an item with
  * true(x) > N/(k+1) is GUARANTEED present in the final summary, and
  * both facts are deterministic booleans even though the estimates
  * themselves depend on partition order (why q_heavyhitters outputs
  * the booleans, not ĉ — the q_agg_approx band-check stance).
  *
  * Why Misra–Gries and not SpaceSaving: the two are isomorphic
  * (ĉ_SS = ĉ_MG + residual offset), but MG's merge is a pure
  * pointwise sum + rank-(k+1) subtraction — no per-summary offset to
  * carry — and its one-sided UNDERestimate makes the band above exact
  * integer arithmetic on both engines.
  *
  * Scale shape: O(k) state per group (k strings + k longs), kilobyte
  * partials across the shuffle, map-side combined like any typed
  * Aggregator; reduce is an O(k) linear probe (k is 16–64 — a hash
  * index would cost more in encoder churn than it saves).
  */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, ArrayBuffer[(String, Long)], Map[String, Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: ArrayBuffer[(String, Long)] = ArrayBuffer.empty

  override def reduce(
      b: ArrayBuffer[(String, Long)], x: String): ArrayBuffer[(String, Long)] = {
    var i = 0
    while (i < b.length) {
      if (b(i)._1 == x) { b(i) = (x, b(i)._2 + 1); return b }
      i += 1
    }
    if (b.length < k) { b += ((x, 1L)); return b }
    // full and untracked: decrement-all, evict zeros (in place)
    var w = 0
    i = 0
    while (i < b.length) {
      val c = b(i)._2 - 1
      if (c > 0) { b(w) = (b(i)._1, c); w += 1 }
      i += 1
    }
    b.takeInPlace(w)
  }

  override def merge(
      a: ArrayBuffer[(String, Long)],
      b: ArrayBuffer[(String, Long)]): ArrayBuffer[(String, Long)] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    // pointwise sum (linear probes — both sides are <= k entries)
    var i = 0
    while (i < b.length) {
      val (key, c) = b(i)
      var j = 0
      var found = false
      while (j < a.length && !found) {
        if (a(j)._1 == key) { a(j) = (key, a(j)._2 + c); found = true }
        j += 1
      }
      if (!found) a += ((key, c))
      i += 1
    }
    if (a.length <= k) return a
    // subtract the (k+1)-th largest count from all, keep positive
    val counts = a.map(_._2).toArray
    java.util.Arrays.sort(counts)
    val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
    var w = 0
    i = 0
    while (i < a.length) {
      val c = a(i)._2 - cut
      if (c > 0) { a(w) = (a(i)._1, c); w += 1 }
      i += 1
    }
    a.takeInPlace(w)
  }

  override def finish(r: ArrayBuffer[(String, Long)]): Map[String, Long] =
    r.iterator.map(t => t._1 -> t._2).toMap

  override def bufferEncoder: Encoder[ArrayBuffer[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[ArrayBuffer[(String, Long)]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object MisraGriesAggregator {
  /** Untyped-DataFrame handle: `mg(16)(col("c"))` →
    * `map<string, long>` of surviving counters.
    */
  def mg(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new MisraGriesAggregator(k), Encoders.STRING)
}
