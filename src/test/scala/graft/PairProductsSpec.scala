package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** The codegen'd [[graft.functions.PairProducts]] kernel must emit
  * exactly the (i, j, p) triples of the nested-transform HOF form it
  * replaced in covCells — same upper-triangle coverage, same row-major
  * order, same exact long products, same null-element propagation —
  * or the shared covariance artifact (q_embed_cov / q_pca_power /
  * q_pca_project) silently drifts.
  */
class PairProductsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def compare(vecs: Seq[Seq[java.lang.Long]]): Unit = {
    VectorFunctions.register(spark)
    val df = vecs.zipWithIndex.map { case (v, r) => (r, v) }.toDF("r", "q")
    val kernel = df
      .select(col("r"), posexplode(
        call_function("pair_products", col("q"))).as(Seq("k", "c")))
      .select(col("r"), col("k"), col("c.i"), col("c.j"), col("c.p"))
      .collect().map(_.toSeq)
    val hof = df
      .select(col("r"), posexplode_outer(flatten(transform(
        sequence(lit(0), size(col("q")) - 1), i => transform(
          sequence(i, size(col("q")) - 1), j => struct(
            i.cast("long").as("i"), j.cast("long").as("j"),
            (element_at(col("q"), i + 1) * element_at(col("q"), j + 1))
              .as("p")))))).as(Seq("k", "c")))
      .select(col("r"), col("k"), col("c.i"), col("c.j"), col("c.p"))
      .collect().map(_.toSeq)
    assert(kernel.toSeq == hof.toSeq)
  }

  test("matches the HOF form on dense vectors (order, values)") {
    val rnd = new scala.util.Random(42)
    compare((1 to 20).map(_ =>
      Seq.fill(8)(java.lang.Long.valueOf(rnd.nextInt(2000000) - 1000000L))))
  }

  test("matches on 64-dim vectors at the real q_max scale") {
    val rnd = new scala.util.Random(7)
    compare((1 to 5).map(_ =>
      Seq.fill(64)(java.lang.Long.valueOf(rnd.nextInt(1160000) - 580000L))))
  }

  test("matches on singleton and two-element vectors") {
    compare(Seq(Seq(java.lang.Long.valueOf(5L)),
      Seq(java.lang.Long.valueOf(-3L), java.lang.Long.valueOf(4L))))
  }

  test("null elements propagate to null products, as the HOF form did") {
    compare(Seq(Seq(java.lang.Long.valueOf(2L), null,
      java.lang.Long.valueOf(7L))))
  }

  test("NULL array yields NULL (filtered upstream, but pinned)") {
    VectorFunctions.register(spark)
    val r = Seq[Option[Seq[Long]]](None).toDF("q")
      .select(call_function("pair_products", col("q")).as("c"))
      .collect()
    assert(r(0).isNullAt(0))
  }
}
