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

  test("analysis rejects non-float-array inputs with a clear message") {
    val spark = TestSpark.spark
    graft.functions.VectorFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1, 2), array(3, 4))").collect()
    }
    assert(e.getMessage.contains("array<float>"), e.getMessage)
  }
}
