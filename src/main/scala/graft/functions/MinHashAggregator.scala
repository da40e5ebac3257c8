package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF (SURVEY.md §2.12 — the one custom-aggregate candidate):
  * an 8-function MinHash signature computed in a single aggregation
  * buffer, registered via `functions.udaf` as `minhash8(shingle)`.
  *
  * Semantically identical to the expression pipeline in
  * DedupOps.q_minhash (min over the 60-bit value of
  * `substr(md5(seed || ':' || shingle), 1, 15)` per seed — asserted
  * equal in tests); the aggregate form computes all 8 minima in one
  * pass over the exploded shingles with a 64-byte buffer, merging
  * partial buffers element-wise — map-side combine keeps shuffle
  * volume at one signature per doc per partition.
  */
object MinHashAggregator extends Aggregator[String, Array[Long], Array[Long]] {

  private val NumHashes = 8

  // MessageDigest is not thread-safe and not serializable — one per
  // executor thread, lazily.
  @transient private lazy val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** A 60-bit window of the digest starting at byte `off` — 7 full
    * bytes plus the next byte's high nibble, matching
    * `conv(substring(hex, 2*off+1, 15), 16, 10)`.
    */
  private def window60(bytes: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = off
    while (i < off + 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    (v << 4) | ((bytes(off + 7) & 0xffL) >>> 4)
  }

  override def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)

  override def reduce(b: Array[Long], x: String): Array[Long] = {
    if (x == null) return b // match the expression pipeline: min() skips nulls
    // digest reuse, as in DedupOps.signatures: 4 seeded md5s, two
    // 60-bit draws each (hex chars 1-15 and 17-31 = byte offsets 0, 8)
    var seed = 1
    while (seed <= NumHashes / 2) {
      val d = md5.get()
      d.reset()
      val bytes = d.digest(s"$seed:$x".getBytes("UTF-8"))
      val i1 = 2 * (seed - 1)
      val h1 = window60(bytes, 0)
      val h2 = window60(bytes, 8)
      if (h1 < b(i1)) b(i1) = h1
      if (h2 < b(i1 + 1)) b(i1 + 1) = h2
      seed += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
}

private object ExpressionEncoderHelper {
  val arrayLong: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
