package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-callable wrappers over Spark's own bloom-filter sketch pair —
  * the machinery behind `spark.sql.optimizer.runtimeFilter.*` (see
  * `InjectRuntimeFilter`), surfaced as explicit functions so a
  * pipeline can build a filter over one dataset and probe it from
  * another across a *materialization boundary* (something the
  * optimizer's automatic runtime filters, which live inside a single
  * plan, cannot do):
  *
  *  - `bloom_agg(xxhash64(key), estItems, numBits)` → one BINARY value
  *    (a serialized `org.apache.spark.util.sketch.BloomFilter`) built
  *    with map-side partial aggregation — each task inserts locally,
  *    merge is bitwise OR, so the build is one tiny all-to-one
  *    exchange of fixed-size bitsets regardless of input row count.
  *  - `bloom_contains(lit(bytes), xxhash64(key))` → BOOLEAN; false is
  *    definitive absence (no false negatives), true means "probe the
  *    exact structure". The filter deserializes once per task (the
  *    expression caches it), probes are two hash mixes + bit reads.
  *
  * Used by [[graft.queries.TextOps.q_dedup_bloom]]: prefilter a daily
  * batch against a corpus fingerprint index so only might-contain rows
  * pay the exact anti-join shuffle.
  */
object BloomFunctions {

  private def arg(exprs: Seq[Expression], n: Int, name: String): Seq[Expression] = {
    require(exprs.length == n, s"$name requires exactly $n arguments, got ${exprs.length}")
    exprs
  }

  /** Register `bloom_agg` / `bloom_contains`. Idempotent per session —
    * same stance as [[VectorFunctions.register]].
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "bloom_agg", exprs => {
        val a = arg(exprs, 3, "bloom_agg")
        new BloomFilterAggregate(a(0), a(1), a(2))
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "bloom_contains", exprs => {
        val a = arg(exprs, 2, "bloom_contains")
        BloomFilterMightContain(a(0), a(1))
      }, "built-in")
  }
}
