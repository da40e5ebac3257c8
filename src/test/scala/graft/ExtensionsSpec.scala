package graft

import graft.functions.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions makes cosine_sim/dot_product visible to SQL-only sessions") {
    val base = TestSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val cos = s2.sql(
        """SELECT cosine_sim(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |                  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))""".stripMargin)
        .head.getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val dot = s2.sql(
        """SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                   array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))""".stripMargin)
        .head.getDouble(0)
      assert(dot == 11.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("RewriteRangeJoinRule: conf-gated binned rewrite kills the nested loop, rows identical") {
    import org.apache.spark.sql.functions.col
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val points = (0 until 300).map(i => (i.toLong, i * 1.0)).toDF("pid", "p")
      val ranges = (0 until 40).map(i => (i.toLong, i * 7.0, i * 7.0 + 10.0))
        .toDF("rid", "lo", "hi")
      def q = points.join(ranges,
        col("p") >= col("lo") && col("p") < col("hi"))
      def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
        df.collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("rid")))
          .toSeq.sorted
      // without the conf: no equi keys -> nested loop / cartesian
      s2.conf.unset(graft.plans.RewriteRangeJoinRule.BinWidthKey)
      val naive = pairs(q)
      assert(naive.nonEmpty)
      val naivePlan = q.queryExecution.executedPlan.toString
      assert(naivePlan.contains("NestedLoop") || naivePlan.contains("Cartesian"),
        naivePlan)
      // with the conf: hash-joinable plan, identical multiset of rows
      s2.conf.set(graft.plans.RewriteRangeJoinRule.BinWidthKey, "8")
      val rq = q
      val plan = rq.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
      assert(pairs(rq) == naive)
      // mirrored orientation (point side on the right) rewrites too
      val mirrored = ranges.join(points,
        col("p") >= col("lo") && col("p") < col("hi"))
      val mPlan = mirrored.queryExecution.executedPlan.toString
      assert(!mPlan.contains("NestedLoop") && !mPlan.contains("Cartesian"), mPlan)
      assert(pairs(mirrored) == naive)
      // non-positive width disables the rule
      s2.conf.set(graft.plans.RewriteRangeJoinRule.BinWidthKey, "0")
      assert(q.queryExecution.executedPlan.toString.contains("NestedLoop") ||
        q.queryExecution.executedPlan.toString.contains("Cartesian"))
    } finally {
      s2.conf.unset(graft.plans.RewriteRangeJoinRule.BinWidthKey)
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("injected planner strategy plans a raw TopKPerGroupNode without ensureStrategy") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Descending, SortOrder}
    import org.apache.spark.sql.types.LongType
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // hand-built node, deliberately NOT via TopKPerGroup.topKPerGroup
      // (which registers the experimental strategy itself) — only the
      // session-extension injection can plan this
      val df = s2.range(10).selectExpr("id % 3 AS g", "id AS v")
      val child = df.queryExecution.analyzed
      val node = graft.plans.TopKPerGroupNode(
        Seq(child.output.find(_.name == "g").get),
        Seq(SortOrder(child.output.find(_.name == "v").get, Descending)),
        1,
        AttributeReference("rank", LongType, nullable = false)(),
        child)
      val got = org.apache.spark.sql.GraftSqlBridge.ofRows(s2, node)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((0L, 9L, 1L), (1L, 7L, 1L), (2L, 8L, 1L)))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("analysis rejects non-float-array inputs with a clear message") {
    val spark = TestSpark.spark
    graft.functions.VectorFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1, 2), array(3, 4))").collect()
    }
    assert(e.getMessage.contains("array<float>"), e.getMessage)
  }
}
