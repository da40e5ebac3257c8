package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_ngram_cms invariants: one-sided error (est ≥ exact always),
  * exactness when the sketch is collision-free, and the bounded-state
  * guarantee that makes CMS the 100 TB path.
  */
class CmsSpec extends AnyFunSuite {
  import TestSpark._

  test("CMS estimates are one-sided: est >= exact for every top-k gram") {
    val rows = SparkEntry.queries("q_ngram_cms")(spark, TestSpark.sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("cnt"),
        s"CMS underestimated ${r.getAs[String]("gram")}")
      assert(r.getAs[Long]("cms_err") ==
        r.getAs[Long]("cms_est") - r.getAs[Long]("cnt"))
    }
    // ranks are 1..k in exact-count order
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 20L))
    val cnts = rows.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts == cnts.sorted.reverse)
  }

  test("a tiny corpus with default width is collision-free: est == exact") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cms").toString
    // 3 distinct trigrams spread over 2 docs; 4 lanes x 1024 buckets
    // cannot collide 3 grams in every lane (min over lanes is exact
    // unless ALL lanes collide)
    Seq((1L, "alpha beta gamma delta", "en", "s0", 22L),
        (2L, "alpha beta gamma", "en", "s0", 16L),
        (3L, null.asInstanceOf[String], "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("q_ngram_cms")(spark, tmp).collect()
    val byGram = rows.map(r => r.getAs[String]("gram") ->
      (r.getAs[Long]("cnt"), r.getAs[Long]("cms_est"))).toMap
    assert(byGram == Map(
      "alpha beta gamma" -> (2L, 2L),
      "beta gamma delta" -> (1L, 1L)))
    rows.foreach(r => assert(r.getAs[Long]("cms_err") == 0L))
  }

  test("streaming CMS over two micro-batches equals the batch sketch counter-for-counter") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val texts = Tables.documents(spark, TestSpark.sf)
      .filter(col("text").isNotNull).select("text")
      .collect().map(_.getString(0)).toSeq
    val input = MemoryStream[String]
    val q = graft.streaming.StreamingOps
      .streamingCms(input.toDF().withColumnRenamed("value", "text"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    val (b1, b2) = texts.splitAt(texts.length / 2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms_stream").collect()
      .map(r => (r.getAs[Long]("lane"), r.getAs[Long]("bucket")) -> r.getAs[Long]("counter"))
      .toMap
    val batch = graft.queries.SketchOps.trigramRows(
        Tables.documents(spark, TestSpark.sf))
      .select(explode(graft.queries.SketchOps.cmsLanes(4, 1024)).as("lb"))
      .groupBy(col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))
      .agg(count(lit(1)).as("counter")).collect()
      .map(r => (r.getAs[Long]("lane"), r.getAs[Long]("bucket")) -> r.getAs[Long]("counter"))
      .toMap
    assert(streamed == batch,
      "streaming sketch must equal batch sketch over the same documents")
    assert(streamed.size <= 4 * 1024)
  }

  test("sketch state is bounded by depth x width regardless of corpus size") {
    // the sketch subtree aggregates on (lane, bucket) — distinct keys
    // <= 4 x 1024 by construction; verify on the real fixture by
    // rebuilding the same aggregation shape
    import org.apache.spark.sql.functions._
    val grams = Tables.documents(spark, TestSpark.sf)
      .filter(col("text").isNotNull)
      .withColumn("w", expr("filter(split(text, ' '), x -> x <> '')"))
      .select(explode(expr(
        """transform(slice(w, 1, greatest(size(w) - 2, 0)),
          |  (x, i) -> concat_ws(' ', x, element_at(w, i + 2), element_at(w, i + 3)))"""
          .stripMargin)).as("gram"))
    val nGrams = grams.count()
    val sketchRows = grams
      .select(explode(graft.queries.SketchOps.cmsLanes(4, 1024)).as("lb"))
      .groupBy("lb.lane", "lb.bucket").count().count()
    assert(nGrams > 4096, "fixture too small to demonstrate the bound")
    assert(sketchRows <= 4L * 1024L)
  }
}
