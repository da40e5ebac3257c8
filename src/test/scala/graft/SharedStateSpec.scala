package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SharedState artifact cache's contract is audit-critical: a
  * cache hit under `spark.graft.ckptCapture` would leave PlanAudit
  * blind to the shared subtree for every consumer after the first,
  * and a hit under `spark.graft.checkpoint=false` would pin state on
  * an axis that promises not to. Pin both bypasses, the hit path,
  * and the test-reset hook.
  */
class SharedStateSpec extends AnyFunSuite {
  import TestSpark._

  private def build(tag: String): (String, Long) =
    (tag, System.nanoTime())

  test("same (name, dir) returns the cached instance; different keys build fresh") {
    graft.plans.SharedState.reset()
    val a = graft.plans.SharedState.cached(spark, "spec.a", "/d1")(build("a"))
    val a2 = graft.plans.SharedState.cached(spark, "spec.a", "/d1")(build("a2"))
    assert(a2 eq a, "second call must return the cached instance")
    val b = graft.plans.SharedState.cached(spark, "spec.a", "/d2")(build("b"))
    assert(!(b eq a), "different dir must build its own artifact")
    val c = graft.plans.SharedState.cached(spark, "spec.c", "/d1")(build("c"))
    assert(!(c eq a), "different name must build its own artifact")
  }

  test("ckptCapture and checkpoint=false both bypass the cache (audit axes)") {
    graft.plans.SharedState.reset()
    val warm = graft.plans.SharedState.cached(spark, "spec.x", "/d")(build("warm"))
    for (conf <- Seq("spark.graft.ckptCapture" -> "true",
        "spark.graft.checkpoint" -> "false")) {
      spark.conf.set(conf._1, conf._2)
      try {
        val fresh = graft.plans.SharedState.cached(spark, "spec.x", "/d")(build("f"))
        assert(!(fresh eq warm), s"cache hit under audit axis ${conf._1}")
        val fresh2 = graft.plans.SharedState.cached(spark, "spec.x", "/d")(build("f2"))
        assert(!(fresh2 eq fresh), s"memoized under audit axis ${conf._1}")
      } finally spark.conf.unset(conf._1)
    }
    // the warm entry is untouched by the bypassed calls
    val again = graft.plans.SharedState.cached(spark, "spec.x", "/d")(build("z"))
    assert(again eq warm, "bypass must not evict or replace cached entries")
  }

  test("reset clears every entry") {
    graft.plans.SharedState.reset()
    val a = graft.plans.SharedState.cached(spark, "spec.r", "/d")(build("a"))
    graft.plans.SharedState.reset()
    val b = graft.plans.SharedState.cached(spark, "spec.r", "/d")(build("b"))
    assert(!(b eq a))
  }
}
