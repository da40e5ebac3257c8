package graft.plans

import org.apache.spark.sql.SparkSession

/** Once-per-(app, dir) memoization of materialized shared artifacts —
  * the single funnel for the cross-key persist-once pattern the r12
  * VERDICT prescribed for the graph family (GraphOps.SharedGraph was
  * its first instance; the covariance cells and the trained unigram
  * model repeat the identical shape): several query keys consume the
  * same expensive enumeration, a production pipeline would write the
  * artifact to storage once and rebase consumers on it (the
  * q_dedup_incr_idx write→read pattern), and in-process a memoized
  * [[Ckpt.maybe]] is the same contract with the session lifetime as
  * the retention policy.
  *
  * Builders MUST return checkpointed (model- or corpus-bounded)
  * DataFrames — an unmaterialized plan in the cache would re-run per
  * consumer and defeat the point.
  *
  * Bypassed (rebuild per call) under the audit axes:
  * `spark.graft.ckptCapture` needs every key to capture its OWN full
  * pre-checkpoint segment chain (a cache hit would leave PlanAudit
  * blind to the subtree for consumers 2..n), and
  * `spark.graft.checkpoint=false` must not pin state at all.
  */
object SharedState {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, Any]

  private def bypass(s: SparkSession): Boolean =
    s.conf.get("spark.graft.ckptCapture", "false").toBoolean ||
      !s.conf.get("spark.graft.checkpoint", "true").toBoolean

  /** Memoize `build` under (applicationId, name, dir). */
  def cached[T](s: SparkSession, name: String, d: String)(build: => T): T =
    if (bypass(s)) build
    else cache.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + name + "|" + d, build)
      .asInstanceOf[T]

  /** Test hook: drop every cached artifact so specs pinning the
    * FRESH-build plan shape are independent of suite order. */
  private[graft] def reset(): Unit = cache.clear()
}
