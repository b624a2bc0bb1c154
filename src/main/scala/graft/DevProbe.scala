package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev probe for the r16 optimization round — times isolated
  * stages of the iterative-graph keys and prints per-round plans.
  * Not part of the driver contract; safe to delete.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[devprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def drain(label: String, df: org.apache.spark.sql.DataFrame): Unit =
      time(label)(df.write.format("noop").mode("overwrite").save())

    // warmup
    drain("warmup q1_agg", SparkEntry.queries("q1_agg")(spark, sfDir))

    args.headOption.getOrElse("lpa") match {
      case "q" =>
        // steady-state per-query timing: 3 drains in ONE JVM, min kept —
        // isolates plan cost from JIT/fresh-JVM noise for A/B work
        val names = args.drop(1)
        val results = names.map { n =>
          val ts = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(n)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          n -> ts
        }
        results.foreach { case (n, ts) =>
          println(f"[devprobe-q] $n min=${ts.min}%.3f runs=" +
            ts.map(t => f"$t%.2f").mkString(","))
        }
      case "lpa" =>
        // stage 1: the co-purchase edge derivation alone
        val t = graft.sources.Tables(spark, sfDir)
        for (i <- 1 to 2) {
          val edges = time(s"kcoreEdges build+checkpoint #$i") {
            val e = OlapC.kcoreEdgesOn(
              t.lineitem.select(col("l_orderkey"), col("l_partkey")),
              "l_orderkey", "l_partkey", OlapC.KcoreSupport)
            e.localCheckpoint(eager = true)
          }
          println(s"[devprobe] edges rows = ${edges.count()}")
          // stage 2: the LPA rounds alone
          val out = time(s"lpaOn rounds #$i")(OlapC.lpaOn(edges, OlapC.LpaRounds))
          drain(s"lpa final segment drain #$i", out)
        }
      case "baskets" =>
        val ss = graft.streaming.StreamOps.streamingSession(spark)
        for (i <- 1 to 3) {
          // full key (drain happens inside the builder)
          val t0 = System.nanoTime()
          val out = SparkEntry.queries("stream_basket_pairs")(spark, sfDir)
          println(f"[devprobe] stream_basket_pairs build+drain #$i: ${(System.nanoTime()-t0)/1e9}%.3f s")
          drain(s"stream_basket_pairs read tail #$i", out)
          // machine alone: settled baskets drained with a pass-through
          // xform (no pair expansion, no lift tail)
          val t1 = System.nanoTime()
          val li = ss.read.option("pathGlobFilter", "lineitem.parquet")
            .parquet(sfDir)
          val maxTsUs = li.agg(max(unix_micros(col("l_shipdate")))).head().getLong(0)
          val raw = ss.readStream.schema(li.schema)
            .option("pathGlobFilter", "lineitem.parquet").parquet(sfDir)
            .select(col("l_orderkey"), col("l_partkey"),
              col("l_shipdate").as("ts"))
          val sdir = graft.streaming.StreamOps.sentinelDir(ss, sfDir, maxTsUs,
            3 * graft.streaming.StatefulBaskets.GapUs)
          val sschema = ss.read.parquet(sdir).schema
          val sentinel = ss.readStream.schema(sschema).parquet(sdir)
            .select(col("user_id").as("l_orderkey"),
              col("event_id").as("l_partkey"), col("ts"))
          val settled = graft.streaming.StatefulBaskets.settledBaskets(ss,
            raw.unionByName(sentinel))
          val partials = graft.streaming.StreamOps.drainViaParquetSink(ss,
            settled.toDF(), "probe_baskets",
            xform = (mb, _) => mb.filter(col("bk") >= 0)
              .agg(count(lit(1)).as("n"), sum(size(col("items"))).as("sz")))
          println(f"[devprobe] settled-machine drain only #$i: ${(System.nanoTime()-t1)/1e9}%.3f s (rows=${partials.count()})")
        }
      case "drainfloor" =>
        import org.apache.spark.sql.streaming.Trigger
        val ss = graft.streaming.StreamOps.streamingSession(spark)
        val schema = ss.read.parquet(s"$sfDir/documents.parquet").schema
        for (i <- 1 to 3) {
          // minimal AvailableNow drain: tiny source, 1-row aggregate,
          // memory sink — the irreducible harness cost
          time(s"minimal stream drain #$i") {
            val src = ss.readStream.schema(schema)
              .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
            val agg = src.agg(count(lit(1)).as("n"))
            ss.streams.active.filter(_.name == "probe_min").foreach(_.stop())
            val q = agg.writeStream.format("memory").queryName("probe_min")
              .outputMode("complete").trigger(Trigger.AvailableNow()).start()
            q.awaitTermination()
          }
          time(s"foreachBatch parquet-sink drain #$i") {
            val src = ss.readStream.schema(schema)
              .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
            val agg = src.groupBy(col("doc_id") % 10).agg(count(lit(1)))
            graft.streaming.StreamOps.drainViaParquetSink(ss, agg.toDF(),
              "probe_fb", complete = true)
          }
          time(s"eventStats #$i")(
            graft.streaming.StreamOps.eventStats(ss, sfDir))
          drain(s"stream_quality_gate full #$i",
            SparkEntry.queries("stream_quality_gate")(spark, sfDir))
          drain(s"stream_events full #$i",
            SparkEntry.queries("stream_events")(spark, sfDir))
        }
      case "ann" =>
        val emb = graft.sources.Tables(spark, sfDir).embeddings
          .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        for (i <- 1 to 3) {
          val idx = time(s"graphBuild #$i")(
            Ann.graphBuild(emb, "vec_id", "emb", m = VectorOps.GraphM,
              nLists = VectorOps.IvfLists))
          val out = time(s"graphTopK #$i")(
            Ann.graphTopK(idx, emb, emb.filter(col("vec_id") % 50 === 0),
              "vec_id", "emb", VectorOps.TopK, beam = VectorOps.GraphBeam,
              hops = VectorOps.GraphHops, entries = VectorOps.GraphEntries))
          drain(s"graph rank+drain #$i", out.orderBy(col("query_id"), col("rank")))
        }
      case "scan" =>
        val t = graft.sources.Tables(spark, sfDir)
        val li = t.lineitem.select(col("l_orderkey"), col("l_partkey"))
        for (i <- 1 to 3) {
          drain(s"scan-only #$i", li)
          drain(s"scan+count-agg #$i",
            li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n")))
          drain(s"scan+collectset #$i",
            li.groupBy(col("l_orderkey"))
              .agg(sort_array(collect_set(col("l_partkey"))).as("items")))
          drain(s"scan+repart+collectset #$i",
            li.repartition(32)
              .groupBy(col("l_orderkey"))
              .agg(sort_array(collect_set(col("l_partkey"))).as("items")))
        }
      case "edgestages" =>
        val t = graft.sources.Tables(spark, sfDir)
        val li = t.lineitem.select(col("l_orderkey"), col("l_partkey"))
        for (i <- 1 to 3) {
          val g = graft.operators.OlapD.basketsGrouped(li, "l_orderkey",
            "l_partkey", None)
          drain(s"grouped only #$i", g)
          val pairs = g.select(explode(graft.operators.OlapD
              .basketPairExpansion).as("p"))
            .groupBy(col("p.item_a").as("u"), col("p.item_b").as("v"))
            .agg(count(lit(1)).as("supp"))
            .filter(col("supp") >= OlapC.KcoreSupport)
          drain(s"grouped+pairs #$i", pairs)
          val edges = OlapC.kcoreEdgesOn(li, "l_orderkey", "l_partkey",
            OlapC.KcoreSupport)
          drain(s"full edges #$i", edges)
          time(s"full edges checkpoint #$i")(
            edges.localCheckpoint(eager = true))
        }
      case "lpaplan" =>
        val t = graft.sources.Tables(spark, sfDir)
        val edges = OlapC.kcoreEdgesOn(
          t.lineitem.select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", OlapC.KcoreSupport)
          .localCheckpoint(eager = true)
        // one LPA round, plan printed
        val labels = edges.select(col("src").as("node")).distinct()
          .select(col("node"), col("node").as("lbl"))
          .localCheckpoint(eager = true)
        val round = edges
          .join(labels.select(col("node").as("dst"), col("lbl")), "dst")
          .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("_cnt"))
          .groupBy(col("src"))
          .agg(graft.functions.topk.top_k_by_score(
            col("_cnt").cast("double"), col("lbl"), 1).as("_tk"))
          .select(col("src").as("node"),
            col("_tk").getItem(0).getField("id").as("lbl"))
        round.write.format("noop").mode("overwrite").save()
        println(round.queryExecution.executedPlan.toString.linesIterator
          .take(60).mkString("\n"))
      case "sssp" =>
        val t = graft.sources.Tables(spark, sfDir)
        for (i <- 1 to 2) {
          val partials = time(s"tradeLinkPartials #$i") {
            OlapC.tradeLinkPartialsOn(t.lineitem, t.orders)
              .localCheckpoint(eager = true)
          }
          val out = time(s"ssspBoardOn #$i")(
            OlapC.ssspBoardOn(partials, OlapC.SsspSource, OlapC.SsspRounds))
          drain(s"sssp final drain #$i", out)
        }
      case "kcore" =>
        val t = graft.sources.Tables(spark, sfDir)
        for (i <- 1 to 2) {
          val edges = time(s"kcoreEdges #$i") {
            OlapC.kcoreEdgesOn(
              t.lineitem.select(col("l_orderkey"), col("l_partkey")),
              "l_orderkey", "l_partkey", OlapC.KcoreSupport)
              .localCheckpoint(eager = true)
          }
          val out = time(s"kcorePartsOn peel #$i")(
            OlapC.kcorePartsOn(edges, OlapC.KcoreK, OlapC.KcorePeelRounds))
          drain(s"kcore final drain #$i", out)
        }
    }
    spark.stop()
  }
}
