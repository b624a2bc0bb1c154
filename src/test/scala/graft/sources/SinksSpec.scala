package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class SinksSpec extends SparkSpec {

  private val out = s"${sys.props("java.io.tmpdir")}/graft_sink_test"

  test("z-order layout: morton key replays per-bit; files cover compact regions") {
    val orders = Tables(spark, sfDir).orders
    // the key interleaves the NORMALIZED dims: reconstruct both from the
    // key bits and compare to an independent normalization
    val all = Sinks.zorderLayout(spark, sfDir).collect()
    val (xs, ds) = (all.map(_.getLong(1)), all.map(_.getLong(2)))
    val m = (1L << Sinks.ZOrderBits) - 1
    def norm(v: Long, lo: Long, hi: Long) = (v - lo) * m / math.max(1L, hi - lo)
    all.foreach { r =>
      val (x, d, z) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val xBack = (0 until Sinks.ZOrderBits).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val dBack = (0 until Sinks.ZOrderBits).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(xBack === norm(x, xs.min, xs.max))
      assert(dBack === norm(d, ds.min, ds.max))
    }

    // writeZOrdered vs a linear sort on x: the pruning property is that
    // EVERY file's min/max range is sub-global in BOTH dimensions (so a
    // selective predicate on either column skips files); a linear sort
    // leaves the trailing dimension's per-file range at ~100% of global
    val day = datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
    val base = orders.select(col("o_custkey").cast("long").as("x"),
      day.cast("long").as("d"))
    val zDir = s"$out-zorder"
    val linDir = s"$out-linear"
    Sinks.writeZOrdered(base, zDir, col("x"), col("d"), numFiles = 16)
    base.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(linDir)
    def avgRanges(dir: String): (Double, Double) = {
      val rs = spark.read.parquet(dir)
        .withColumn("_f", input_file_name())
        .groupBy(col("_f"))
        .agg((max(col("x")) - min(col("x"))).as("xr"),
          (max(col("d")) - min(col("d"))).as("dr"))
        .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
      (rs.map(_._1).sum / rs.length, rs.map(_._2).sum / rs.length)
    }
    val g = base.agg(max(col("x")) - min(col("x")),
      max(col("d")) - min(col("d"))).head()
    val (gx, gd) = (g.getLong(0).toDouble, g.getLong(1).toDouble)
    val (zx, zd) = avgRanges(zDir)
    val (lx, ld) = avgRanges(linDir)
    // z-order: both dims sub-global per file
    assert(zx < gx * 0.6, s"z avg x-range $zx vs global $gx")
    assert(zd < gd * 0.6, s"z avg d-range $zd vs global $gd")
    // the linear layout prunes x harder but cannot prune d at all — the
    // contrast that justifies z-order for two-predicate workloads
    assert(lx < gx * 0.2, s"lin avg x-range $lx vs global $gx")
    assert(ld > gd * 0.9, s"lin avg d-range $ld vs global $gd")
  }

  test("zorder_prune: the clustered layout skips files the natural one cannot") {
    val rows = Sinks.zorderPrune(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(7)))
    val byLayout = rows.groupBy(_._1)
    assert(byLayout.keySet === Set("zorder", "natural"))
    val total = graft.sources.Tables(spark, sfDir).orders.count()
    byLayout.foreach { case (layout, fs) =>
      // files partition the corpus: full except the last, rows sum exactly
      assert(fs.map(_._3).sum === total, layout)
      val sorted = fs.sortBy(_._2)
      sorted.dropRight(1).foreach(f =>
        assert(f._3 === Sinks.PruneRowsPerFile, s"$layout file ${f._2}"))
    }
    // the measured win: the box query skips most z-ordered files and
    // (on this uniformly-spread corpus) no naturally-ordered file
    def skipped(l: String) = byLayout(l).count(_._4 == 0)
    assert(skipped("zorder") > skipped("natural"))
    assert(skipped("zorder") >= byLayout("zorder").size / 2,
      s"zorder skipped only ${skipped("zorder")}/${byLayout("zorder").size}")
    assert(skipped("natural") === 0)
  }

  test("hilbert_prune: same invariants; curve skips at least half the files") {
    val rows = Sinks.hilbertPrune(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(6)))
    val total = graft.sources.Tables(spark, sfDir).orders.count()
    assert(rows.map(_._2).sum === total)
    val sorted = rows.sortBy(_._1)
    sorted.dropRight(1).foreach(f => assert(f._2 === Sinks.PruneRowsPerFile))
    // the curve clusters: the box query skips at least half the files
    // (the zorder_prune bar — the ops team compares the two on THEIR data)
    val skipped = rows.count(_._3 == 0)
    assert(skipped >= rows.length / 2, s"hilbert skipped only $skipped/${rows.length}")
  }

  test("footer_prune: REAL parquet footers equal the engine recomputation (C75)") {
    val got = Sinks.footerPrune(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
    assert(got.nonEmpty)
    // the footers must carry EXACTLY the per-bin stats a full scan finds:
    // recompute each bin from the layout itself and require equality —
    // this is what makes the footer audit trustworthy with zero row reads
    val shift = 2 * Sinks.ZOrderBits - Sinks.FooterFilesLog
    val expected = Sinks.zorderLayout(spark, sfDir)
      .withColumn("fid", shiftright(col("zkey"), shift))
      .groupBy("fid").agg(count(lit(1)).as("n"),
        min("x").as("x0"), max("x").as("x1"),
        min("d").as("d0"), max("d").as("d1"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.length === expected.size) // one audit row per non-empty bin
    got.foreach { case (fid, n, x0, x1, d0, d1, _) =>
      assert(expected(fid) === ((n, x0, x1, d0, d1)), s"file $fid")
    }
    val total = graft.sources.Tables(spark, sfDir).orders.count()
    assert(got.map(_._2).sum === total)
    // and the deploy audit reaches the same conclusion as the C67 replay:
    // the box query skips at least half of the z-ordered files
    val skipped = got.count(_._7 == 0)
    assert(skipped >= got.length / 2, s"skipped only $skipped/${got.length}")
  }

  test("hilbert: full-grid bijection, unit steps (the locality Morton lacks)") {
    import graft.functions.spatial.hilbert_index
    val bits = 3
    val n = 1 << bits
    // full 8×8 grid
    val grid = spark.range(n.toLong * n).selectExpr(
      s"id % $n AS x", s"id div $n AS y")
      .withColumn("h", hilbert_index(col("x"), col("y"), bits))
      .withColumn("z", Sinks.zorderKey(col("x"), col("y"), bits))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // bijection onto [0, n²)
    assert(grid.map(_._3).toSet === (0L until n.toLong * n).toSet)
    // Hilbert: EVERY consecutive pair of curve positions is grid-adjacent
    val byH = grid.sortBy(_._3)
    byH.sliding(2).foreach {
      case Array((x1, y1, _, _), (x2, y2, _, _)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L)
      case _ =>
    }
    // Morton: provably NOT (seams exist) — the contrast that makes the
    // iterative walk worth a custom expression
    val byZ = grid.sortBy(_._4)
    val zJumps = byZ.sliding(2).count {
      case Array((x1, y1, _, _), (x2, y2, _, _)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1L
      case _ => false
    }
    assert(zJumps > 0)
    // interpreted eval agrees with codegen (collect goes through codegen;
    // spot-check a few points against an independent JVM walk)
    def ref(xi: Long, yi: Long): Long = {
      var (x, y, d) = (xi, yi, 0L)
      var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    grid.foreach { case (x, y, h, _) => assert(h === ref(x, y)) }
  }

  test("partitioned parquet: layout, bounded files, lossless roundtrip") {
    val docs = Tables(spark, sfDir).documents
    Sinks.writePartitionedParquet(docs, out,
      partitionCols = Seq("lang"), sortCols = Seq("doc_id"), filesPerPartition = 2)

    // Hive-style partition dirs exist
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    langs.foreach { l =>
      assert(Files.exists(Paths.get(out, s"lang=$l")), s"missing partition dir lang=$l")
      val files = Files.list(Paths.get(out, s"lang=$l")).toArray
        .map(_.toString).filter(_.endsWith(".parquet"))
      assert(files.nonEmpty && files.length <= 2,
        s"lang=$l has ${files.length} files, expected <= 2")
    }

    // roundtrip is lossless (partition col comes back typed as string here)
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.getAs[String]("text"))
    val b = back.orderBy("doc_id").collect().map(_.getAs[String]("text"))
    assert(a.toSeq === b.toSeq)
  }

  test("co-bucketed tables join with zero shuffle exchanges (D13)") {
    val t = Tables(spark, sfDir)
    Sinks.writeBucketed(t.lineitem.select("l_orderkey", "l_quantity"),
      "bkt_lineitem", "l_orderkey", 8, sortCols = Seq("l_orderkey"))
    Sinks.writeBucketed(t.orders.select("o_orderkey", "o_totalprice"),
      "bkt_orders", "o_orderkey", 8, sortCols = Seq("o_orderkey"))
    val joined = spark.table("bkt_lineitem")
      .join(spark.table("bkt_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(sum("l_quantity"), max("o_totalprice"))
    assert(joined.count() === t.lineitem.select("l_orderkey").distinct().count())
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    // drop the catalog tables: leaving them registered was observed to
    // perturb UNRELATED plans compiled later in the same session (the
    // etl_receipts budget grew an exchange when this suite ran first)
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")

    // the D13 driver key: the PRODUCTION rollup plan over its own
    // registered tables is also exchange-free before the aggregation,
    // and the eager board equals the raw-parquet join
    val sfx = java.lang.Long.toHexString(sfDir.hashCode.toLong & 0xffffffffL)
    val (lt, ot) = (s"graft_d13_lineitem_$sfx", s"graft_d13_orders_$sfx")
    Sinks.writeBucketed(t.lineitem
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      lt, "l_orderkey", Sinks.BucketJoinBuckets, sortCols = Seq("l_orderkey"))
    Sinks.writeBucketed(t.orders.select(col("o_orderkey"), col("o_orderpriority")),
      ot, "o_orderkey", Sinks.BucketJoinBuckets, sortCols = Seq("o_orderkey"))
    val prodPlan = Sinks.bucketedJoinFrame(spark, lt, ot)
      .queryExecution.executedPlan.toString
    // the ONLY exchange is the rollup's own aggregation exchange: no
    // hashpartitioning on the join key anywhere
    assert(!prodPlan.contains("hashpartitioning(l_orderkey") &&
      !prodPlan.contains("hashpartitioning(o_orderkey"),
      s"D13 join shuffled on the bucket key:\n$prodPlan")
    spark.sql(s"DROP TABLE IF EXISTS $lt")
    spark.sql(s"DROP TABLE IF EXISTS $ot")

    val board = Sinks.bucketedJoin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val raw = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        graft.operators.Olap.dsum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy(col("o_orderpriority")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(board.nonEmpty && board.toSeq === raw.toSeq)
    // and the key leaves no catalog residue behind
    assert(!spark.catalog.tableExists(lt) && !spark.catalog.tableExists(ot))
  }

  test("dpp_prune: the fact scan carries a dynamic pruning subquery and " +
      "the board is layout-independent (D14)") {
    val df = Sinks.dppPrune(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the pruning subquery rides the PARTITION filters of the fact scan —
    // unselected day-partitions are never opened
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("dynamicpruning")),
      s"no dynamic pruning in the fact scan:\n${plan.take(4000)}")
    val rows = df.collect().map(r =>
      (r.getDate(0).toString, r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).distinct.length === Sinks.DppTopDays)
    // layout-independent: equals the same computation from the RAW table
    val raw = graft.sources.Tables(spark, sfDir).events
      .withColumn("event_date", to_date(col("ts")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("dv").desc, col("event_date"))
    val top = raw.groupBy(col("event_date"))
      .agg(sum(col("value").cast("decimal(25,6)")).as("dv"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= Sinks.DppTopDays).select(col("event_date").as("d"))
    val expect = raw.join(top, col("event_date") === col("d"))
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("n"),
        graft.operators.Olap.dsum(col("value")).as("day_value"))
      .orderBy(col("event_date")).collect().map(r =>
        (r.getDate(0).toString, r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq === expect.toSeq)
    // pruning has something to prune: the artifact holds MORE
    // day-partitions than the dim keeps
    val dirs = new java.io.File(Sinks.dppEventsPath(spark, sfDir))
      .listFiles.count(_.getName.startsWith("event_date="))
    assert(dirs > Sinks.DppTopDays, s"only $dirs partitions on disk")
  }

  test("csv_roundtrip: board equals the ORC board, and hostile text " +
      "survives the quoting edge cases (D15)") {
    // same corpus, two formats, one format-independent fingerprint:
    // cross-format equality in-engine (each is separately oracle-checked
    // against parquet)
    val csv = Sinks.csvRoundtrip(spark, sfDir).collect().map(_.toString)
    val orc = Sinks.orcRoundtrip(spark, sfDir).collect().map(_.toString)
    assert(csv.nonEmpty && csv.toSeq === orc.toSeq)
    // the scratch really is CSV
    val files = new java.io.File(graft.sources.IndexScratch.path("csvrt", sfDir))
      .listFiles.filter(_.getName.endsWith(".csv"))
    assert(files.nonEmpty)

    // hostile payloads: delimiters, quotes, newlines, nulls
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain", "en", "s1", 5L),
      (2L, "comma, inside", "en", "s1", 13L),
      (3L, "a \"quoted\" word", "en", "s2", 15L),
      (4L, "line\nbreak", "en", "s2", 10L),
      (5L, null.asInstanceOf[String], null.asInstanceOf[String], "s3", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val p = java.nio.file.Files.createTempDirectory("graft_csvrt").toString
    nasty.write.option("header", "true").option("quoteAll", "true")
      .option("escape", "\"").mode("overwrite").csv(p)
    val back = spark.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, " +
        "n_chars BIGINT")
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true").csv(p)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(back === Map(1L -> "plain", 2L -> "comma, inside",
      3L -> "a \"quoted\" word", 4L -> "line\nbreak", 5L -> null))
    graft.sources.IndexScratch.deleteRec(new java.io.File(p))
  }

  test("json_roundtrip: board equals the ORC board, and hostile text " +
      "survives the JSON escaping edge cases (D16)") {
    // same corpus, another format, one format-independent fingerprint
    val jsn = Sinks.jsonRoundtrip(spark, sfDir).collect().map(_.toString)
    val orc = Sinks.orcRoundtrip(spark, sfDir).collect().map(_.toString)
    assert(jsn.nonEmpty && jsn.toSeq === orc.toSeq)
    // the scratch really is JSON lines
    val files = new java.io.File(
        graft.sources.IndexScratch.path("jsonrt", sfDir))
      .listFiles.filter(_.getName.endsWith(".json"))
    assert(files.nonEmpty)

    // hostile payloads: JSON's own escape set — backslash, quote,
    // control chars, unicode, newline — plus NULLs (the writer OMITS
    // null fields; the explicit read schema must restore them)
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain", "en", "s1", 5L),
      (2L, "back\\slash and \"quote\"", "en", "s1", 22L),
      (3L, "tab\there, newline\nthere", "en", "s2", 23L),
      (4L, "unicode é中😀 mix", "fr", "s2", 14L),
      (5L, null.asInstanceOf[String], null.asInstanceOf[String], "s3", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val p = java.nio.file.Files.createTempDirectory("graft_jsonrt").toString
    nasty.write.mode("overwrite").json(p)
    val back = spark.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, " +
        "n_chars BIGINT")
      .json(p)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(back === Map(1L -> "plain", 2L -> "back\\slash and \"quote\"",
      3L -> "tab\there, newline\nthere",
      4L -> "unicode é中😀 mix", 5L -> null))
    graft.sources.IndexScratch.deleteRec(new java.io.File(p))
  }

  test("partition_evolution: the partitioned era's files physically LACK " +
      "lang (restored from the directory tree), and the census is " +
      "layout-independent (D17)") {
    val board = Sinks.partitionEvolution(spark, sfDir).collect()
    assert(board.nonEmpty)
    // both eras present, each with >1 lang (the partition column came back)
    val langsByEra = board.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(langsByEra.keySet === Set(0L, 1L))
    assert(langsByEra.values.forall(_.size > 1))

    // the capability is load-bearing: a leaf file of the partitioned era
    // read DIRECTLY (no partition discovery) has NO lang column
    val root = graft.sources.IndexScratch.path("partevo", sfDir)
    val leaf = new java.io.File(s"$root/era2").listFiles()
      .filter(_.getName.startsWith("lang=")).head.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val direct = spark.read.parquet(leaf.getAbsolutePath)
    assert(!direct.columns.contains("lang"),
      s"era2 leaf carries lang in-file: ${direct.columns.mkString(",")}")
    // while the flat era's files DO carry it as data
    val flatLeaf = new java.io.File(s"$root/era1").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(spark.read.parquet(flatLeaf.getAbsolutePath)
      .columns.contains("lang"))

    // vanilla mixed-directory discovery REFUSES this layout — the
    // two-read union is necessary, not a style choice
    intercept[Exception] {
      spark.read.parquet(root).collect()
    }
  }

  test("snapshot_read: history moves version by version, and the v3 " +
      "snapshot equals the B71 compaction census (D18)") {
    val board = Sinks.snapshotRead(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(board.map(_._1).toSeq === Seq(1L, 2L, 3L))
    val n = graft.sources.Tables(spark, sfDir).orders.count()
    val nDeleted = graft.sources.Tables(spark, sfDir).orders
      .filter(col("o_orderkey") % graft.operators.OlapC.CdcDeleteMod === 0)
      .count()
    // v1/v2 keep every key (updates replace, not remove); v3 loses the
    // tombstoned keys
    assert(board(0)._2 === n && board(1)._2 === n)
    assert(board(2)._2 === n - nDeleted)
    // the updates actually changed content between v1 and v2
    assert(board(0)._4 !== board(1)._4)
    assert(board(0)._3 < board(1)._3) // doubled prices raise the mass

    // time travel is CDC compaction under a predicate: the v3 census
    // equals the same census over cdc_compact's own result
    val cdc = graft.operators.OlapC.cdcCompact(spark, sfDir)
    val h48 = conv(substring(md5(concat_ws(":",
      col("o_orderkey"), col("op"), col("o_orderstatus"),
      col("o_totalprice").cast("decimal(25,2)"), col("version"))), 1, 12),
      16, 10).cast("long")
    val v3 = cdc.agg(count(lit(1)),
        sum(col("o_totalprice").cast("decimal(25,2)")).cast("double"),
        Sinks.censusFingerprint(h48)).head()
    assert((board(2)._2, board(2)._3, board(2)._4) ===
      ((v3.getLong(0), v3.getDouble(1), v3.getLong(2))))
  }

  test("json lines sink writes parseable records") {
    val path = s"$out-json"
    Sinks.writeJsonLines(
      graft.etl.Receipts.etlWebhookJson(spark, sfDir).limit(10), path)
    val back = spark.read.json(path)
    assert(back.count() === 10)
    assert(back.columns.contains("webhook_json"))
  }

  test("compact_plan: FFD groups from real footers — coverage, no overflow (D3)") {
    val plan = Sinks.compactPlan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(plan.nonEmpty)
    // every footer file is planned exactly once…
    assert(plan.map(_._1).distinct.length === plan.length)
    // …and the planned rows cover the table exactly (nothing lost by a
    // rewrite that streams each group)
    val total = graft.sources.Tables(spark, sfDir).orders.count()
    assert(plan.map(_._2).sum === total)
    val budget = math.max(1L, total / Sinks.CompactFrac)
    plan.groupBy(_._3).foreach { case (grp, fs) =>
      // no group exceeds the budget unless it is one oversized file
      // (FFD's own-bin rule for len > budget)
      assert(fs.map(_._2).sum <= budget || fs.length == 1,
        s"group $grp overflows")
      // offsets tile the group contiguously in placement order
      val inOrder = fs.sortBy(_._4)
      inOrder.sliding(2).foreach {
        case Array(a, b) => assert(b._4 === a._4 + a._2, s"gap in group $grp")
        case _ => ()
      }
      assert(inOrder.head._4 === 0L)
    }
    // the value-range writer leaves skew; the plan must actually compact
    // (fewer output files than input files)
    assert(plan.map(_._3).distinct.length < plan.length)
  }

  test("compact_rewrite: executed groups match the plan, one real file each (D3b)") {
    val plan = Sinks.compactPlan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val got = Sinks.compactRewrite(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // audit covers exactly the planned groups
    assert(got.map(_._1).toSet === plan.map(_._3).toSet)
    got.foreach { case (grp, nFiles, nRows) =>
      // the one-file-per-group write contract, observed in REAL footers
      assert(nFiles === 1L, s"group $grp split across files")
      assert(nRows === plan.filter(_._3 == grp).map(_._2).sum, s"group $grp rows")
    }
    // nothing lost end-to-end: the compacted table holds the whole input
    assert(got.map(_._3).sum ===
      graft.sources.Tables(spark, sfDir).orders.count())
  }

  test("cdc_compact_rewrite: tombstones purged during the rewrite, " +
      "delete-wins, one real file per group (D12)") {
    import graft.operators.OlapC
    val orders = graft.sources.Tables(spark, sfDir).orders
    val got = Sinks.cdcCompactRewrite(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // one real file per group, observed in REAL footers
    got.foreach { case (grp, nFiles, _, _) =>
      assert(nFiles === 1L, s"group $grp split across files") }
    // survivors = exactly the non-tombstoned keys (delete-wins: %UpsertMod
    // keys carry an update too, but the delete's version 3 outranks it)
    val nDeleted = orders
      .filter(col("o_orderkey") % OlapC.CdcDeleteMod === 0).count()
    assert(got.map(_._3).sum === orders.count() - nDeleted)
    // the key fingerprint proves WHICH rows survived, not just how many
    val keySums = orders.agg(
      sum(col("o_orderkey")).as("all"),
      sum(when(col("o_orderkey") % OlapC.CdcDeleteMod === 0,
        col("o_orderkey"))).as("del")).head()
    assert(got.map(_._4).sum === keySums.getLong(0) - keySums.getLong(1))
    // the purge genuinely removed rows vs the plain D3b rewrite
    val plain = Sinks.compactRewrite(spark, sfDir).collect()
      .map(_.getLong(2)).sum
    assert(got.map(_._3).sum < plain)
  }

  test("orc_roundtrip: the ORC copy preserves every row and column (D4)") {
    import graft.sources.{IndexScratch, Sinks, Tables}
    val board = Sinks.orcRoundtrip(spark, sfDir).collect().map(_.toString)
    assert(board.nonEmpty)
    // the same rollup from the parquet table inside Spark — the board is
    // format-independent by construction
    val path = IndexScratch.path("orcrt", sfDir)
    val docs = Tables(spark, sfDir).documents
    assert(spark.read.orc(path).count() === docs.count())
    // the injective per-column coalesce+md5 spelling (fixed-width digest
    // concat — NULL-safe, no separator aliasing), same as orcRoundtrip
    val perCol = Seq(col("doc_id").cast("string"), col("text"), col("lang"),
      col("source"), col("n_chars").cast("string"))
      .map(c => md5(coalesce(c, lit("<NULL>"))))
    val h48 = conv(substring(md5(concat(perCol: _*)), 1, 12), 16, 10)
      .cast("long")
    val fromParquet = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        Sinks.censusFingerprint(h48).as("content_h"))
      .orderBy(col("source")).collect().map(_.toString)
    assert(board.toSeq === fromParquet.toSeq)
    // partition-column restoration: every lang survives the partitionBy
    assert(spark.read.orc(path).select("lang").distinct().count() ===
      docs.select("lang").distinct().count())
  }

  test("census fingerprint is multiplicity-sensitive: a byte-identical " +
      "duplicate row moves the board (r12 ADVICE — xor cancelled it)") {
    import spark.implicits._
    import graft.sources.Sinks
    // two byte-identical documents in ONE era group — the seeded-dup
    // corpus shape the r12 BIT_XOR fingerprint was blind to (even
    // multiplicities of one digest xor to absence)
    val once = Seq((1L, "alpha", "en", "s1", 5L), (3L, "alpha", "en", "s1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dupd = once.unionAll(
      Seq((5L, "alpha", "en", "s1", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    // schemaEvolutionCensusOn digests TEXT only, so identical texts have
    // identical digests: the board must still tell 2 copies from 3
    def h(df: org.apache.spark.sql.DataFrame) =
      Sinks.schemaEvolutionCensusOn(df).collect()
        .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val h2 = h(once); val h3 = h(dupd)
    assert(h2(1L) != h3(1L),
      "third identical copy left the era-1 fingerprint unchanged")
    // and the mod-2⁶¹−1 fold is exactly 3x vs 2x the per-row digest —
    // 48-bit digests times 3 stay far below the modulus, so no wrap
    assert(h3(1L) === h2(1L) / 2 * 3)
  }

  test("layout_compare: Hilbert reads no more than Morton for the same box (D5)") {
    import graft.sources.Sinks
    val rows = Sinks.layoutCompare(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq === Seq("hilbert", "zorder"))
    // same data, same binning: identical file and row masses per layout
    assert(rows.map(_._2).distinct.size === 1)
    assert(rows.map(_._3).distinct.size === 1)
    rows.foreach { case (l, _, nr, fr, rr, frac) =>
      assert(fr > 0 && rr > 0, s"$l: the query box pruned everything")
      assert(fr < rows.head._2, s"$l: the box pruned nothing")
      assert(math.abs(frac - rr.toDouble / nr) < 1e-12, s"$l frac")
    }
    // the comparison number itself: Hilbert's locality means the same
    // box never forces MORE rows open than Morton's (measured from real
    // footers; strictly fewer at the gate corpus)
    val h = rows.find(_._1 == "hilbert").get
    val z = rows.find(_._1 == "zorder").get
    assert(h._5 <= z._5, s"hilbert ${h._5} read more rows than morton ${z._5}")
  }

  test("hilbert3: Skilling walk is a true 3-D Hilbert curve — bijection " +
      "and unit-step adjacency on the FULL cube (D7)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // exhaustive at every feasible resolution: bijective onto
    // [0, 2^(3·bits)) and consecutive curve positions always grid-adjacent
    // (the defining Hilbert property — a Morton key fails this at every
    // "seam"); bits=4 already checks 4096 cells
    for (bits <- 1 to 4) {
      val n = 1 << bits
      val pts = for (x <- 0 until n; y <- 0 until n; z <- 0 until n)
        yield (x.toLong, y.toLong, z.toLong)
      val keyed = pts.toDF("x", "y", "z")
        .withColumn("h", graft.functions.spatial.hilbert_index3(
          col("x"), col("y"), col("z"), bits))
        .collect()
        .map(r => (r.getLong(3), (r.getLong(0), r.getLong(1), r.getLong(2))))
      assert(keyed.map(_._1).distinct.length === n * n * n,
        s"bits=$bits: not a bijection")
      assert(keyed.map(_._1).min === 0L &&
        keyed.map(_._1).max === (n * n * n - 1).toLong)
      keyed.sortBy(_._1).map(_._2).toSeq.sliding(2).foreach { w =>
        val (x1, y1, z1) = w(0); val (x2, y2, z2) = w(1)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) === 1L,
          s"bits=$bits: curve jump between ($x1,$y1,$z1) and ($x2,$y2,$z2)")
      }
    }
  }

  test("schema_evolution: the merged read restores every era's rows and " +
      "surfaces v1's missing columns as NULL (D11)") {
    import graft.sources.{IndexScratch, Sinks, Tables}
    val board = Sinks.schemaEvolution(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables(spark, sfDir).documents
    val n = docs.count()
    assert(board.map(_._2).sum === n, "merged read lost rows")
    // era 1 (v1 schema): EVERY row's late columns are null; zero char mass
    val era1 = board.find(_._1 == 1L).get
    assert(era1._3 === era1._2 && era1._4 === 0L)
    // era 0 (v2): no synthetic nulls beyond the base table's own
    val era0 = board.find(_._1 == 0L).get
    assert(era0._3 === docs.filter(col("doc_id") % 2 === 0 &&
      col("source").isNull).count())
    // and the capability is LOAD-BEARING: without mergeSchema the reader
    // pins one footer's schema — the late columns can vanish entirely
    val path = IndexScratch.path("schevo", sfDir)
    val plain = spark.read.parquet(path).schema.fieldNames.toSet
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
      .schema.fieldNames.toSet
    assert(merged === Set("doc_id", "text", "lang", "source", "n_chars"))
    assert(plain.subsetOf(merged))
  }

  test("hilbert4: the d=4 walk is a true Hilbert curve — bijection and " +
      "unit-step adjacency on the full 4-cube (D10)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    for (bits <- 1 to 3) {
      val n = 1 << bits
      val pts = for (x <- 0 until n; y <- 0 until n; z <- 0 until n;
        w <- 0 until n) yield (x.toLong, y.toLong, z.toLong, w.toLong)
      val keyed = pts.toDF("x", "y", "z", "w")
        .withColumn("h", graft.functions.spatial.hilbert_index4(
          col("x"), col("y"), col("z"), col("w"), bits))
        .collect()
        .map(r => (r.getLong(4),
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
      val total = n.toLong * n * n * n
      assert(keyed.map(_._1).distinct.length === total,
        s"bits=$bits: not a bijection")
      assert(keyed.map(_._1).min === 0L && keyed.map(_._1).max === total - 1)
      keyed.sortBy(_._1).map(_._2).toSeq.sliding(2).foreach { p2 =>
        val (x1, y1, z1, w1) = p2(0); val (x2, y2, z2, w2) = p2(1)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) +
          math.abs(z1 - z2) + math.abs(w1 - w2) === 1L,
          s"bits=$bits: curve jump at ($x1,$y1,$z1,$w1)->($x2,$y2,$z2,$w2)")
      }
    }
  }

  test("3-D layouts: keys bijective on normalized cells; real-footer " +
      "audits skip most files under the 3-D box (D6/D8/D9)") {
    import graft.sources.Sinks
    import org.apache.spark.sql.functions._
    // one key per occupied (nx, nd, nv) cell — layout keys are cell ids
    val h3 = Sinks.queries("hilbert3_layout")(spark, sfDir)
    val z3 = Sinks.queries("zorder3_layout")(spark, sfDir)
    val cells = h3.join(z3, Seq("o_orderkey", "x", "d", "v"))
      .select(col("hkey"), col("zkey")).distinct().count()
    assert(h3.select(col("hkey")).distinct().count() ===
      z3.select(col("zkey")).distinct().count())
    assert(cells === h3.select(col("hkey")).distinct().count(),
      "hkey and zkey disagree on cell identity")
    // the audits: a 3-D-clustered layout must let the middle-quarter box
    // skip MOST files (a 2-D layout leaves the third dim's range global)
    for (name <- Seq("footer_prune3", "footer_prune3_hilbert")) {
      val audit = Sinks.queries(name)(spark, sfDir).collect()
        .map(r => (r.getLong(1), r.getInt(8)))
      val reads = audit.count(_._2 == 1)
      assert(reads > 0, s"$name: the box pruned everything")
      assert(reads * 2 < audit.length,
        s"$name: box opened $reads of ${audit.length} files — no skip power")
    }
    // the decision board: consistent masses, sane fractions
    val rows = Sinks.layoutCompare3(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq === Seq("hilbert3", "zorder3"))
    assert(rows.map(_._3).distinct.size === 1)
    rows.foreach { case (l, nf, nr, fr, rr, frac) =>
      assert(fr > 0 && fr * 2 < nf, s"$l files_read $fr of $nf")
      assert(frac > 0.0 && frac < 0.5, s"$l read_frac $frac")
      assert(math.abs(frac - rr.toDouble / nr) < 1e-12, s"$l frac")
    }
  }
}
