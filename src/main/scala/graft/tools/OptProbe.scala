package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-by-stage profiler for the optimization rounds: time
  * each intermediate of a query under investigation so the expensive
  * stage is identified by measurement, not guesswork (guide §1).
  * Usage: runMain graft.tools.OptProbe <probeName> [sfDir]
  */
object OptProbe {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count()
    catch { case scala.util.control.NonFatal(_) => () }
    name match {
      case "allpairs" => allpairs(spark, d)
      case "pii" => pii(spark, d)
      case "triangles" => triangles(spark, d)
      case "covcells" => covcells(spark, d)
      case "joinoverlap" => joinoverlap(spark, d)
      case "ckptpart" =>
        // does localCheckpoint preserve outputPartitioning? (AQE on/off)
        import org.apache.spark.sql.expressions.Window
        Seq("true", "false").foreach { aqe =>
          spark.conf.set("spark.sql.adaptive.enabled", aqe)
          val df = spark.range(0, 100000)
            .select((col("id") % 1000).as("src"), col("id").as("dst"))
            .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
          val ck = df.localCheckpoint()
          println(s"[probe] aqe=$aqe ckpt partitioning: " +
            ck.queryExecution.executedPlan.outputPartitioning)
          val joined = ck.as("a").join(ck.as("b").hint("shuffle_hash"),
            col("a.src") === col("b.src"))
          val nExch = joined.queryExecution.executedPlan.toString
            .split("\n").count(_.contains("Exchange"))
          println(s"[probe] aqe=$aqe self-join exchanges: $nExch")
        }
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      case "jobs" =>
        // job count + wall per key: iteration kernels pay one
        // scheduler round-trip per job, the local latency floor
        sys.env.getOrElse("OPT_KEYS", "q_graph_hits").split(",").foreach { k =>
          (1 to 2).foreach { i =>
            val counter = new java.util.concurrent.atomic.AtomicInteger()
            val l = new org.apache.spark.scheduler.SparkListener {
              override def onJobStart(
                  j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
                counter.incrementAndGet(); ()
              }
            }
            spark.sparkContext.addSparkListener(l)
            val t0 = System.nanoTime()
            graft.SparkEntry.queries(k)(spark, d).foreach(_ => ())
            val secs = (System.nanoTime() - t0) / 1e9
            spark.sparkContext.removeSparkListener(l)
            println(f"[probe] $k run$i: ${counter.get()} jobs, $secs%.2f s")
          }
        }
      case "plancost" =>
        // planning-only vs execution cost for named keys (args via env)
        sys.env.getOrElse("OPT_KEYS", "q_sim_pq").split(",").foreach { k =>
          (1 to 2).foreach { i =>
            val t0 = System.nanoTime()
            val df = graft.SparkEntry.queries(k)(spark, d)
            val t1 = System.nanoTime()
            df.queryExecution.executedPlan
            val t2 = System.nanoTime()
            df.foreach(_ => ())
            val t3 = System.nanoTime()
            println(f"[probe] $k run$i: construct ${(t1-t0)/1e9}%.2f plan ${(t2-t1)/1e9}%.2f exec ${(t3-t2)/1e9}%.2f")
          }
        }
      case other => sys.error(s"unknown probe '$other'")
    }
    spark.stop()
  }

  def pii(spark: SparkSession, d: String): Unit = {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    val ipPat    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val userPat  = "\\buser \\d+\\b"
    val line = concat(
      lit("user "), col("user_id").cast("string"),
      lit(" <u"), col("user_id").cast("string"), lit("@mail.example.com> did "),
      col("event_type"),
      lit(" from 10."), pmod(col("user_id"), lit(256L)).cast("string"),
      lit("."), pmod(col("event_id"), lit(256L)).cast("string"),
      lit("."), pmod(col("user_id") + col("event_id"), lit(256L)).cast("string"))
    val base = graft.Tables.events(spark, d)
      .select(col("event_id"), line.as("line"))
    t("line build only")(base.foreach(_ => ()))
    t("line build only 2")(base.foreach(_ => ()))
    val counts = base.select(col("event_id"),
      size(regexp_extract_all(col("line"), lit(emailPat), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("line"), lit(ipPat), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(col("line"), lit(userPat), lit(0))).cast("long").as("n_user_ids"))
    t("counts only")(counts.foreach(_ => ()))
    t("counts only 2")(counts.foreach(_ => ()))
    val red = base.select(col("event_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("line"), ipPat, "[IP]"),
          emailPat, "[EMAIL]"),
        userPat, "[USER]").as("redacted"))
    t("redact only")(red.foreach(_ => ()))
    t("redact only 2")(red.foreach(_ => ()))
    val countsRc = base.select(col("event_id"),
      regexp_count(col("line"), lit(emailPat)).cast("long").as("n_emails"),
      regexp_count(col("line"), lit(ipPat)).cast("long").as("n_ips"),
      regexp_count(col("line"), lit(userPat)).cast("long").as("n_user_ids"))
    t("counts regexp_count")(countsRc.foreach(_ => ()))
    t("counts regexp_count 2")(countsRc.foreach(_ => ()))
    val noSort = graft.SparkEntry.queries("q_pii")(spark, d)
    t("full q_pii")(noSort.foreach(_ => ()))
    t("full q_pii 2")(noSort.foreach(_ => ()))
  }

  def allpairs(spark: SparkSession, d: String): Unit = {
    val sh = t("shingles artifact")(
      graft.queries.DedupOps.SharedDedup.shingles(spark, d))
    t("shingles count")(println(sh.count()))
    val docs = sh.filter(!col("fb")).drop("fb")
    val ex = docs.select(col("doc_id"), explode(col("fps")).as("fp"))
    val dfreq = ex.groupBy("fp").agg(count(lit(1)).as("df"))
    t("dfreq count")(println(dfreq.count()))
    val pe0 = ex.join(dfreq, "fp").groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("fp")))).as("ord"))
      .select(col("doc_id"), size(col("ord")).as("n"),
        explode(expr(
          "slice(transform(ord, x -> x.fp), 1, (size(ord) div 2) + 1)"))
          .as("fp"))
    val pe = t("pe build+ckpt")(graft.plans.Ckpt.maybe(pe0))
    t("pe count")(println(pe.count()))
    val cand0 = pe.as("a").join(pe.as("b"),
      col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id") &&
        col("a.n") <= col("b.n") * 2 && col("b.n") <= col("a.n") * 2)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    t("cand pre-distinct count")(println(cand0.count()))
    val cand = cand0.distinct()
    t("cand distinct count")(println(cand.count()))
    val ver = cand
      .join(docs.select(col("doc_id").as("doc_a"), col("g").as("ga")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("g").as("gb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("n_inter"),
        size(col("ga")).cast("long").as("n_a"),
        size(col("gb")).cast("long").as("n_b"))
      .filter(expr("3 * n_inter >= n_a + n_b"))
    t("verify count")(println(ver.count()))
    t("full query foreach (warm1)")(
      graft.SparkEntry.queries("q_dedup_allpairs")(spark, d).foreach(_ => ()))
    t("full query foreach (warm2)")(
      graft.SparkEntry.queries("q_dedup_allpairs")(spark, d).foreach(_ => ()))

    // PPJoin positional-filter prototype: prefix entries carry their
    // 1-based position; a candidate instance survives only if its
    // overlap upper bound 1 + min(n_a - p_a, n_b - p_b) can still
    // reach the J >= 1/2 requirement 3*o >= n_a + n_b.
    val peP0 = ex.join(dfreq, "fp").groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("fp")))).as("ord"))
      .select(col("doc_id"), size(col("ord")).as("n"),
        posexplode(expr(
          "slice(transform(ord, x -> x.fp), 1, (size(ord) div 2) + 1)")))
      .withColumnRenamed("col", "fp")
      .select(col("doc_id"), col("n"), col("fp"), (col("pos") + 1).as("p"))
    val peP = t("peP build+ckpt")(graft.plans.Ckpt.maybe(peP0))
    val candP0 = peP.as("a").join(peP.as("b"),
      col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id") &&
        col("a.n") <= col("b.n") * 2 && col("b.n") <= col("a.n") * 2 &&
        (lit(1) + least(col("a.n") - col("a.p"), col("b.n") - col("b.p"))) * 3
          >= col("a.n") + col("b.n"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    t("candP pre-distinct count")(println(candP0.count()))
    val candP = candP0.distinct()
    t("candP distinct count")(println(candP.count()))
    val verP = candP
      .join(docs.select(col("doc_id").as("doc_a"), col("g").as("ga")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("g").as("gb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("n_inter"),
        size(col("ga")).cast("long").as("n_a"),
        size(col("gb")).cast("long").as("n_b"))
      .filter(expr("3 * n_inter >= n_a + n_b"))
    t("verP count")(println(verP.count()))
  }

  /** Stage-by-stage timing of the triangle artifact build (r16: the
    * most expensive cold path in the bench — 23.9s on whichever graph
    * key runs first) plus its consumers.
    */
  def triangles(spark: SparkSession, d: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val li = graft.Tables.lineitem(spark, d)
    val so = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("sk"))
      .distinct()
    t("so distinct")(so.foreach(_ => ()))
    val e0 = so.as("x").join(so.as("y"),
        col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
      .select(col("x.sk").as("a"), col("y.sk").as("b"))
    t("pair join pre-distinct")(println(e0.count()))
    val e = e0.distinct()
    t("coEdges distinct")(println(e.count()))
    val eC = t("coEdges ckpt")(graft.plans.Ckpt.maybe(e))
    val eNew = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("sk"))
      .groupBy("ok").agg(sort_array(collect_set(col("sk"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"""
          .stripMargin)).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
    t("coEdges NEW (collect_set) ckpt")(graft.plans.Ckpt.maybe(eNew))
    t("coEdges NEW again")(graft.plans.Ckpt.maybe(eNew))
    println("==== coEdges BEFORE (distinct + self-join) ====")
    e.explain("formatted")
    println("==== coEdges AFTER (collect_set + in-row pairs) ====")
    eNew.explain("formatted")
    val sym = eC.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(eC.select(col("b").as("src"), col("a").as("dst")))
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
    val symC = t("sym window+ckpt")(graft.plans.Ckpt.maybe(sym))
    val deg = symC.select(col("src").as("node"), col("deg")).dropDuplicates("node")
    val o0 = symC.join(
        broadcast(deg.select(col("node").as("dn"), col("deg").as("ddeg"))),
        col("dst") === col("dn"))
      .filter(col("deg") < col("ddeg") ||
        (col("deg") === col("ddeg") && col("src") < col("dst")))
      .select(col("src"), col("dst"), col("ddeg"))
    val o = t("oriented ckpt")(graft.plans.Ckpt.maybe(o0))
    t("oriented count")(println(o.count()))
    val e1 = o.select(col("src").as("u"), col("dst").as("v"), col("ddeg").as("dv"))
    val e2 = o.select(col("src").as("u2"), col("dst").as("w"), col("ddeg").as("dw"))
    val wedges = e1.join(e2, col("u") === col("u2") &&
        (col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w"))))
      .select(col("u"), col("v"), col("w"))
    t("wedge count")(println(wedges.count()))
    val tris = wedges.join(o.select(col("src").as("v"), col("dst").as("w")),
      Seq("v", "w"), "left_semi")
    t("tris count (shuffle semi)")(println(tris.count()))
    val trisB = wedges.join(
      broadcast(o.select(col("src").as("v"), col("dst").as("w"))),
      Seq("v", "w"), "left_semi")
    t("tris count (broadcast semi)")(println(trisB.count()))
    val trisBB = e1.join(broadcast(e2), col("u") === col("u2") &&
        (col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w"))))
      .select(col("u"), col("v"), col("w"))
      .join(broadcast(o.select(col("src").as("v"), col("dst").as("w"))),
        Seq("v", "w"), "left_semi")
    t("tris count (bcast wedge + bcast semi)")(println(trisBB.count()))
    // packed single-long key: LongHashedRelation instead of the
    // generic two-column UnsafeHashedRelation
    val trisPk = wedges
      .withColumn("vw", shiftleft(col("v"), 32).bitwiseOR(col("w")))
      .join(broadcast(o.select(
          shiftleft(col("src"), 32).bitwiseOR(col("dst")).as("vw"))),
        Seq("vw"), "left_semi")
      .select(col("u"), col("v"), col("w"))
    t("tris count (packed bcast semi)")(println(trisPk.count()))
    t("tris count (packed bcast semi) 2")(println(trisPk.count()))
    println("==== closure BEFORE (shuffle semi) ====")
    tris.explain("formatted")
    println("==== closure AFTER (packed broadcast semi) ====")
    trisPk.explain("formatted")
  }

  /** Candidate-volume probe for q_join_overlap's hour-binned interval
    * self-join (r16, verdict item 4): sessions/hour histogram and the
    * in-bin pair count, vs what a finer bin would give. */
  def joinoverlap(spark: SparkSession, d: String): Unit = {
    val sess = graft.Tables.events(spark, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("s_us"),
        unix_micros(col("session_window.end")).as("e_us"))
      .transform(graft.plans.Ckpt.maybe)
    t("sessions count")(println(sess.count()))
    val binned = sess.select(col("user_id"), col("s_us"), col("e_us"),
        explode(expr("sequence(s_us div 3600000000, (e_us - 1) div 3600000000)"))
          .as("hr"))
      .transform(graft.plans.Ckpt.maybe)
    t("binned rows")(println(binned.count()))
    val hist = binned.groupBy("hr").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("hours"), max(col("n")).as("mx"),
        expr("percentile(n, 0.5)").as("med"), sum(col("n") * col("n")).as("pairs2"))
    t("histogram")(hist.show(false))
    val a = binned.select(col("hr"), col("user_id").as("ua"),
      col("s_us").as("sa"), col("e_us").as("ea"))
    val b = binned.select(col("hr"), col("user_id").as("ub"),
      col("s_us").as("sb"), col("e_us").as("eb"))
    val joined = a.join(b, Seq("hr"))
      .filter(col("ua") < col("ub"))
    t("in-bin ua<ub pairs")(println(joined.count()))
    val binned10 = sess.select(col("user_id"), col("s_us"), col("e_us"),
        explode(expr("sequence(s_us div 600000000, (e_us - 1) div 600000000)"))
          .as("hr"))
      .transform(graft.plans.Ckpt.maybe)
    t("binned rows (10min)")(println(binned10.count()))
    val a10 = binned10.select(col("hr"), col("user_id").as("ua"))
    val b10 = binned10.select(col("hr"), col("user_id").as("ub"))
    t("in-bin ua<ub pairs (10min)")(println(
      a10.join(b10, Seq("hr")).filter(col("ua") < col("ub")).count()))
    val out = joined
      .filter(col("sa") < col("eb") && col("sb") < col("ea") &&
        col("hr") === expr("greatest(sa, sb) div 3600000000"))
      .groupBy("ua", "ub").agg(count(lit(1)).as("n"))
    t("output pair-rows")(println(out.count()))
    t("full q_join_overlap")(graft.SparkEntry.queries("q_join_overlap")(spark, d).foreach(_ => ()))
    t("full q_join_overlap 2")(graft.SparkEntry.queries("q_join_overlap")(spark, d).foreach(_ => ()))
  }

  /** Plan + timing evidence for the covCells build segment (it lives
    * behind a SharedState checkpoint, so consumer-key plans don't show
    * it): the old nested-transform HOF pair build vs the pair_products
    * kernel. */
  def covcells(spark: SparkSession, d: String): Unit = {
    graft.functions.VectorFunctions.register(spark)
    val qd = graft.Tables.embeddings(spark, d)
      .filter(col("embedding").isNotNull)
      .select(transform(col("embedding"),
        v => floor(v.cast("double") * 1e6 + 0.5).cast("long")).as("q"))
    val before = qd
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("q")) - 1), i => transform(
          sequence(i, size(col("q")) - 1), j => struct(
            i.cast("long").as("i"), j.cast("long").as("j"),
            (element_at(col("q"), i + 1) * element_at(col("q"), j + 1))
              .as("p")))))).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"), col("c.p").as("p"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("p")).as("s_ij"))
    val after = qd
      .select(explode(call_function("pair_products", col("q"))).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"), col("c.p").as("p"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("p")).as("s_ij"))
    t("HOF pair build (before)")(before.foreach(_ => ()))
    t("HOF pair build (before) 2")(before.foreach(_ => ()))
    t("pair_products kernel (after)")(after.foreach(_ => ()))
    t("pair_products kernel (after) 2")(after.foreach(_ => ()))
    println("==== covCells BEFORE (HOF pair build) ====")
    before.explain("formatted")
    println("==== covCells AFTER (pair_products kernel) ====")
    after.explain("formatted")
  }
}
