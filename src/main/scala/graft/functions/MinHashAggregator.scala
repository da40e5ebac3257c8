package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF (SURVEY.md §2.12 — the one custom-aggregate candidate):
  * an 8-function MinHash signature computed in a single aggregation
  * buffer, registered via `functions.udaf` as `minhash8(shingle)`.
  *
  * Semantically identical to the expression pipeline in
  * DedupOps.q_minhash (min over `substr(md5(seed || ':' || shingle),
  * 1, 16)` per seed — asserted equal in tests); the aggregate form
  * computes all 8 minima in one pass over the exploded shingles with a
  * 128-byte buffer, merging partial buffers element-wise — map-side
  * combine keeps shuffle volume at one signature per doc per
  * partition.
  */
object MinHashAggregator extends Aggregator[String, Array[String], Array[String]] {

  private val NumHashes = 8
  // lexicographic top: above every 16-char lowercase-hex string
  private val Top = "\uffff"

  // MessageDigest is not thread-safe and not serializable — one per
  // executor thread, lazily.
  @transient private lazy val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def hash16(seed: Int, x: String): String = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s"$seed:$x".getBytes("UTF-8"))
    // first 8 bytes -> 16 hex chars, matching substr(md5(...), 1, 16)
    val sb = new StringBuilder(16)
    var i = 0
    while (i < 8) { sb.append(f"${bytes(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }

  override def zero: Array[String] = Array.fill(NumHashes)(Top)

  override def reduce(b: Array[String], x: String): Array[String] = {
    if (x == null) return b // match the expression pipeline: min() skips nulls
    var i = 0
    while (i < NumHashes) {
      val h = hash16(i + 1, x)
      if (h < b(i)) b(i) = h
      i += 1
    }
    b
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < NumHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[String]): Array[String] = r

  override def bufferEncoder: Encoder[Array[String]] = ExpressionEncoderHelper.arrayString
  override def outputEncoder: Encoder[Array[String]] = ExpressionEncoderHelper.arrayString
}

private object ExpressionEncoderHelper {
  val arrayString: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
