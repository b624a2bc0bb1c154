package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OlapCSpec extends SparkSpec {

  test("funnel equals a plain-Scala replay of the ordered-step semantics") {
    val evs = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expected = evs.groupBy(_._1).map { case (u, es) =>
      def firstAfter(tpe: String, after: Option[Long]): Option[Long] =
        after.flatMap(t => es.filter(e => e._3 == tpe && e._2 > t)
          .map(_._2).minOption)
      val tView = es.filter(_._3 == "view").map(_._2).minOption
      val tClick = firstAfter("click", tView)
      val tPurchase = firstAfter("purchase", tClick)
      val stage =
        if (tPurchase.isDefined) 3
        else if (tClick.isDefined) 2
        else if (tView.isDefined) 1 else 0
      u -> ((tView, tClick, tPurchase, stage))
    }
    val got = OlapC.funnel(spark, sfDir).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      r.getLong(0) -> ((opt(1), opt(2), opt(3), r.getInt(4)))
    }.toMap
    assert(got === expected)
    // ordering invariant: whenever present, t_view < t_click < t_purchase
    got.values.foreach { case (v, c, p, _) =>
      c.foreach(tc => assert(v.exists(_ < tc)))
      p.foreach(tp => assert(c.exists(_ < tp)))
    }
  }

  test("retention: offset 0 is the cohort size; counts replay from user-weeks") {
    val userWeeks = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val cohort = userWeeks.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = userWeeks
      .map { case (u, wk) =>
        (cohort(u), java.time.temporal.ChronoUnit.DAYS.between(cohort(u), wk) / 7)
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = OlapC.retention(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getInt(1).toLong) -> r.getLong(2))
      .toMap
    assert(got === expected.map { case ((c, o), n) => (c, o) -> n })
    // offset 0 counts every user of the cohort exactly once
    val cohortSizes = cohort.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    got.collect { case ((c, 0L), n) => assert(n === cohortSizes(c)) }
  }

  test("scd2_track: run-length compaction replays from the raw event order") {
    val evs = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._2, e._3))
      // collapse consecutive equal event_types into runs
      val runs = ordered.foldLeft(Vector.empty[(String, Long, Long)]) {
        case (acc, (_, ts, _, tpe)) =>
          acc.lastOption match {
            case Some((t, from, n)) if t == tpe =>
              acc.init :+ ((t, from, n + 1))
            case _ => acc :+ ((tpe, ts, 1L))
          }
      }
      runs.zipWithIndex.map { case ((tpe, from, n), i) =>
        val to = runs.lift(i + 1).map(_._2)
        (u, i + 1, tpe, from, to, n)
      }
    }.toSet
    val got = OlapC.scd2Track(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5))
    }.toSet
    assert(got === expected)
    // intervals tile: each user has exactly one open (current) interval
    got.groupBy(_._1).values.foreach { rs =>
      assert(rs.count(_._5.isEmpty) === 1)
      val sorted = rs.toSeq.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5.contains(b._4), "valid_to must equal next valid_from")
          assert(a._3 !== b._3, "adjacent runs must differ in attribute")
        case _ =>
      }
    }
  }

  test("pagerank: matches an independent JVM replay; mass is conserved-ish") {
    import graft.sources.Tables
    val t = Tables(spark, sfDir)
    val edges = OlapC.pagerankNations(spark, sfDir) // force build once (sanity)
    val edgeRows = t.lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(t.supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey"), col("s_nationkey")).count()
      .collect().map(r => (r.getAs[Number](0).longValue(),
        r.getAs[Number](1).longValue()) -> r.getLong(2)).toMap
    val nodes = t.nation.select(col("n_nationkey")).collect()
      .map(_.getAs[Number](0).longValue()).sorted
    val n = nodes.length
    val outw = edgeRows.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val base = OlapC.PrScale * (OlapC.PrDampDen - OlapC.PrDampNum) /
      (OlapC.PrDampDen * n)
    var r = nodes.map(_ -> OlapC.PrScale / n).toMap
    for (_ <- 1 to OlapC.PrIters) {
      val contrib = edgeRows.toSeq
        .map { case ((s, d), w) => d -> (r(s) * w / outw(s)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(nd =>
        nd -> (base + OlapC.PrDampNum * contrib.getOrElse(nd, 0L) /
          OlapC.PrDampDen)).toMap
    }
    val got = edges.collect()
      .map(row => row.getAs[Number](0).longValue() -> row.getLong(2)).toMap
    assert(got === r)
    // floor-division drops at most a few ulps of mass per node per round:
    // total stays within 1% of the unit mass and never exceeds it
    val mass = got.values.sum.toDouble / OlapC.PrScale
    assert(mass <= 1.0 && mass > 0.9, s"mass $mass")
    // the graph is non-trivial: ranks separate
    assert(got.values.toSet.size > 1)
  }

  test("pagerank: deep iteration (iters=30) completes with a bounded plan") {
    import graft.sources.Tables
    val t = Tables(spark, sfDir)
    val edges = t.lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(t.supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val nodes = t.nation.select(col("n_nationkey").as("node"))
    // pre-checkpoint-cadence this would grow an exponentially-analyzed
    // lineage; with the cadence the whole run (plan + execute) stays fast
    val t0 = System.nanoTime()
    val ranks = OlapC.pagerankOn(edges, nodes, iters = 30)
    val rows = ranks.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rows.length == 25)
    assert(secs < 120, s"iters=30 took ${secs}s — lineage blow-up?")
    // ranks are still a probability-ish vector after deep iteration
    val mass = rows.map(_.getLong(1)).sum.toDouble / OlapC.PrScale
    assert(mass <= 1.0 && mass > 0.9, s"mass $mass")
    assert(rows.map(_.getLong(1)).toSet.size > 1)
  }

  test("distinct_incremental: daily-sketch union equals the single-pass sketch") {
    val r = OlapC.distinctIncremental(spark, sfDir).head()
    val (nDays, est, direct, exact) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // HLL register updates are max-merges: union of daily sketches must be
    // BIT-identical to sketching the whole stream at once
    assert(est === direct)
    // and the estimate lands near the exact cardinality
    assert(math.abs(est - exact) <= math.max(2L, (exact * 0.05).toLong),
      s"est $est vs exact $exact")
    val expDays = graft.sources.Tables(spark, sfDir).events
      .select(to_date(col("ts"))).distinct().count()
    assert(nDays === expDays)
  }

  test("quantile_sketch: day-merge is exact; estimates within the 2^-5 bound; state bounded") {
    val ev = graft.sources.Tables(spark, sfDir).events
    // 1) mergeability is EXACT: the union-of-daily-sketches board equals a
    //    single-pass global sketch (bucket counts add, order-free)
    val cents = ev.select(
      greatest(floor(col("value") * 100.0).cast("bigint"), lit(0L)).as("v"))
      .collect().map(_.getLong(0)).sorted
    val merged = OlapC.quantileSketch(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(merged.map(_._1).toSeq === OlapC.QsTargets.map(_._1).sorted)
    merged.foreach { case (label, n, estCents, estValue) =>
      assert(n === cents.length.toLong)
      val (_, num, den) = OlapC.QsTargets.find(_._1 == label).get
      // 2) exact-rank percentile from the raw stream: the estimate is the
      //    bucket lower bound, so est ≤ exact ≤ est·(1 + 2^-5) (+1 cent
      //    for the integer floor)
      val rank = ((cents.length * num + den - 1) / den).toInt
      val exact = cents(rank - 1)
      assert(estCents <= exact, s"$label: est $estCents above exact $exact")
      assert(exact <= estCents + (estCents >> OlapC.QsSub) + 1,
        s"$label: exact $exact beyond error bound of est $estCents")
      assert(estValue === estCents.toDouble / 100.0)
    }
    // 3) the stored state is O(buckets), not O(values): each daily sketch
    //    holds at most the constant bucket space however large the day is
    val bCase = OlapC.qsBucketCase("v", (x, k) => s"shiftright($x, $k)")
    val perDay = ev.select(to_date(col("ts")).as("day"),
      greatest(floor(col("value") * 100.0).cast("bigint"), lit(0L)).as("v"))
      .withColumn("bucket", expr(bCase))
      .groupBy(col("day"))
      .agg(countDistinct(col("bucket")).as("sketch_rows"),
        count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(perDay.nonEmpty)
    perDay.foreach { case (rows, n) =>
      assert(rows <= 64L * 53, s"sketch rows $rows exceed the bucket space")
      assert(rows <= n, s"sketch ($rows rows) larger than the day ($n)")
      // strict compression is only guaranteed once the day outgrows the
      // constant bucket space (tiny sf0.001 days can be injective)
      if (n > 64L * 53)
        assert(rows < n, s"sketch ($rows rows) not smaller than the day ($n)")
    }
  }

  test("interval_coverage: union length replays from a direct interval merge") {
    val evs = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val w = OlapC.CoverageWindowUs
    val expected = evs.groupBy(_._1).map { case (u, es) =>
      val iv = es.map(_._2).sorted.map(t => (t, t + w))
      val merged = iv.foldLeft(Vector.empty[(Long, Long)]) {
        case (acc, (s, e)) =>
          acc.lastOption match {
            case Some((ms, me)) if s <= me =>
              acc.init :+ ((ms, math.max(me, e)))
            case _ => acc :+ ((s, e))
          }
      }
      u -> ((merged.size, merged.map(p => p._2 - p._1).sum))
    }
    val got = OlapC.intervalCoverage(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got === expected)
    // coverage is bounded by n_events × window and below the raw sum
    // (overlaps actually merge somewhere in the corpus)
    val rawSum = evs.length.toLong * w
    assert(got.values.map(_._2).sum < rawSum)
  }

  test("event_transitions: counts replay from per-user ordered paths") {
    val evs = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val path = es.sortBy(e => (e._2, e._3)).map(_._4)
      ("START" +: path.init.toSeq).zip(path.toSeq)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = OlapC.eventTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    // every event contributes exactly one transition
    assert(got.values.sum === evs.length.toLong)
    // START out-degree = number of users
    assert(got.collect { case ((f, _), n) if f == "START" => n }.sum ===
      evs.map(_._1).distinct.length.toLong)
  }

  test("salted_join: equals the plain join; the salt reaches the join keys") {
    import graft.sources.Tables
    val ev = Tables(spark, sfDir).events
      .select(when(col("user_id") % 10 < 5, 1L).otherwise(col("user_id"))
        .as("k"), col("value"))
    val dim = ev.select(col("k")).distinct()
      .select(col("k"), substring(md5(col("k").cast("string")), 1, 8)
        .as("label"))
    val plain = ev.join(dim, "k")
      .groupBy(col("k"), col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(25,2)")).cast("double").as("value_sum"))
      .collect().map(_.toString).sorted
    val salted = OlapC.saltedJoin(spark, sfDir).collect().map(_.toString).sorted
    assert(salted.toSeq === plain.toSeq)
    // the hot key actually dominates (the scenario salting exists for),
    // and the salt column participates in the join
    val hot = OlapC.saltedJoin(spark, sfDir)
      .filter(col("k") === 1L).head().getAs[Long]("n")
    val total = Tables(spark, sfDir).events.count()
    assert(hot.toDouble / total > 0.4)
    val joined = graft.operators.Skew.saltedJoin(ev, dim, "k", OlapC.SaltBuckets)
    assert(joined.queryExecution.analyzed.toString.contains("_salt"))
  }

  test("table_profile: one-pass stats replay; approx path lands near exact") {
    val orders = graft.sources.Tables(spark, sfDir).orders
    val rows = orders.select(OlapC.ProfileCols.map(col): _*).collect()
    val expected = OlapC.ProfileCols.zipWithIndex.map { case (c, i) =>
      c -> ((rows.length.toLong,
        rows.count(_.isNullAt(i)).toLong,
        rows.map(r => if (r.isNullAt(i)) null else r.get(i)).filter(_ != null)
          .distinct.length.toLong))
    }.toMap
    val got = OlapC.tableProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected)
    val approx = OlapC.tableProfileOn(orders, OlapC.ProfileCols, exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    approx.foreach { case (c, d) =>
      val e = expected(c)._3.toDouble
      assert(math.abs(d - e) <= math.max(4.0, e * 0.1), s"$c approx $d vs $e")
    }
  }

  test("rolling_features: trailing-window counts replay per user") {
    val evs = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byUser = evs.groupBy(_._1)
    val got = OlapC.rollingFeatures(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    byUser.values.flatten.foreach { case (u, ts, id, _) =>
      val inWin = byUser(u).filter(e =>
        e._2 <= ts && e._2 >= ts - OlapC.RollWindowUs)
      val expSum = inWin.map(e => BigDecimal(e._4).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum
      assert(got(id)._1 === inWin.length.toLong, s"event $id count")
      assert(got(id)._2 === expSum.toDouble, s"event $id sum")
    }
    // windows actually roll: not every count is the user's total
    assert(got.values.exists(_._1 > 1))
    assert(evs.groupBy(_._1).exists { case (u, es) =>
      es.map(e => got(e._3)._1).min < es.length })
  }

  test("value_histogram: buckets replay; counts cover every event") {
    val evs = graft.sources.Tables(spark, sfDir).events
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val (vmin, vmax) = (evs.map(_._2).min, evs.map(_._2).max)
    val expected = evs.groupBy { case (t, v) =>
      (t, math.min(OlapC.HistBuckets - 1,
        math.floor((v - vmin) * OlapC.HistBuckets / (vmax - vmin)).toInt))
    }.view.mapValues(_.length.toLong).toMap
    val got = OlapC.valueHistogram(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    assert(got.values.sum === evs.length.toLong)
  }

  test("upsert_latest: changed keys take v2, untouched keys keep the base row") {
    val base = graft.sources.Tables(spark, sfDir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    // output order: key, version, then payload columns
    val got = OlapC.upsertLatest(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(2), r.getDouble(3), r.getLong(1))))
      .toMap
    assert(got.keySet === base.keySet, "exactly one row per key")
    got.foreach { case (k, (st, price, v)) =>
      if (k % OlapC.UpsertMod == 0) {
        assert(v === 2L && st === "U")
        assert(price === base(k)._2 * 2)
      } else {
        assert(v === 1L && st === base(k)._1)
        assert(price === base(k)._2)
      }
    }
  }

  test("mv_incremental: merge equals recompute; merging is associative") {
    import graft.sources.Tables
    val ev = Tables(spark, sfDir).events
    val full = OlapC.mvDailyAggOn(ev, "ts", "event_type", "value")
      .select(col("day"), col("event_type"), col("n"),
        col("_vsum").cast("double").as("value_sum"), col("value_max"))
      .collect().map(_.toString).sorted
    val got = OlapC.mvIncremental(spark, sfDir).collect().map(_.toString).sorted
    assert(got.toSeq === full.toSeq)
    // three-way split merged pairwise in a different order: same view
    def part(m: Int) = OlapC.mvDailyAggOn(
      ev.filter(col("event_id") % 3 === m), "ts", "event_type", "value")
    val threeWay = OlapC.mvMergeOn(part(2), OlapC.mvMergeOn(part(0), part(1)))
      .select(col("day"), col("event_type"), col("n"),
        col("_vsum").cast("double").as("value_sum"), col("value_max"))
      .collect().map(_.toString).sorted
    assert(threeWay.toSeq === full.toSeq)
  }

  test("anomaly_robust: flags exactly the >z·MAD deviations; approx path agrees on medians") {
    val evs = graft.sources.Tables(spark, sfDir).events
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.size
      // continuous interpolation, matching Spark percentile/quantile_cont
      val pos = 0.5 * (n - 1)
      val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    val byType = evs.groupBy(_._2)
    val expected = byType.toSeq.flatMap { case (tpe, es) =>
      val med = median(es.toSeq.map(_._3))
      val mad = median(es.toSeq.map(e => math.abs(e._3 - med)))
      es.toSeq.filter(e => math.abs(e._3 - med) > OlapC.AnomalyZ * mad)
        .map(e => (e._1, tpe, e._3))
    }.toSet
    val got = OlapC.anomalyRobust(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "synthetic corpus should contain some outliers")
    // the t-digest production path lands near the exact medians
    val exact = OlapC.anomalyRobust(spark, sfDir)
      .select(col("event_type"), col("med"), col("mad")).distinct().collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val approx = OlapC.anomalyRobustOn(graft.sources.Tables(spark, sfDir).events,
        "event_id", "event_type", "value", OlapC.AnomalyZ, exact = false)
      .select(col("event_type"), col("med"), col("mad")).distinct().collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    approx.foreach { case (tpe, (m, d)) =>
      exact.get(tpe).foreach { case (me, de) =>
        assert(math.abs(m - me) <= math.max(1.0, math.abs(me)) * 0.05)
        assert(math.abs(d - de) <= math.max(1.0, de) * 0.10)
      }
    }
  }

  test("table_diff: statuses partition the synthetic edits exactly") {
    val keys = graft.sources.Tables(spark, sfDir).orders
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val got = OlapC.tableDiff(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val removed = keys.filter(_ % OlapC.DiffDelMod == 0).toSet
    val added = keys.filter(_ % OlapC.DiffAddMod == 0).map(_ + 100000000L).toSet
    val changed = keys.filter(k =>
      k % OlapC.DiffChgMod == 0 && k % OlapC.DiffDelMod != 0).toSet
    assert(got.filter(_._2 == "removed").keySet === removed)
    assert(got.filter(_._2 == "added").keySet === added)
    assert(got.filter(_._2 == "changed").keySet === changed)
    assert(got.size === removed.size + added.size + changed.size)
  }

  test("table_diff digest distinguishes null from empty string") {
    import spark.implicits._
    val base = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "v")
    val cur = Seq((1L, Some("")), (2L, Some("x"))).toDF("k", "v")
    val d = OlapC.tableDiffOn(base, cur, "k", Seq("v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "changed"))
  }

  test("resample_ffill: spine is dense per user and fills carry forward") {
    val rows = OlapC.resampleFfill(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty && rows.exists(_._4 == 1), "no gaps to fill")
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2.toEpochDay)
      // dense: every day between first and last is present exactly once
      val days = sorted.map(_._2.toEpochDay)
      assert(days.toSeq === (days.head to days.last))
      // first day is active by construction; gaps repeat the previous fill
      assert(sorted.head._4 === 0)
      sorted.sliding(2).foreach {
        case Array(prev, curr) if curr._4 == 1 =>
          assert(curr._3 === prev._3, s"gap day ${curr._2} not carried")
        case _ =>
      }
    }
  }

  test("user_ltv: seeded triangle — cohorts from ANY event, value from " +
      "purchases only; corpus totals reconcile (B90)") {
    import spark.implicits._
    // user 1: acquired wk0 via view, buys 10.0 in wk0 and 5.0 in wk2
    // user 2: acquired wk0, never buys — forms a cohort, no LTV row
    // user 3: acquired wk2, buys 7.5 twice in wk2 (offset 0, n=2)
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", "view", 0.0),
      (1L, "2024-01-02 10:00:00", "purchase", 10.0),
      (1L, "2024-01-16 10:00:00", "purchase", 5.0),
      (2L, "2024-01-03 10:00:00", "view", 0.0),
      (3L, "2024-01-15 10:00:00", "view", 0.0),
      (3L, "2024-01-16 10:00:00", "purchase", 7.5),
      (3L, "2024-01-17 10:00:00", "purchase", 7.5))
      .toDF("user_id", "tss", "event_type", "value")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"),
        col("event_type"), col("value"))
    val got = OlapC.userLtvOn(rows, "user_id", "ts", "event_type",
        "value", "purchase").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 0, 1L, 1L, 10.0),  // u1 wk0
      ("2024-01-01", 2, 1L, 1L, 5.0),   // u1 wk2
      ("2024-01-15", 0, 2L, 1L, 15.0))) // u3: two purchases, one buyer

    // corpus reconciliation: triangle value mass == total purchase mass,
    // and every (cohort, 0 <= offset) cell is consistent with retention's
    // cohort derivation (no offset can precede acquisition)
    val tri = OlapC.userLtv(spark, sfDir)
    val triMass = tri.agg(sum(col("ltv").cast("decimal(25,2)"))).head()
      .getDecimal(0)
    val purchMass = graft.sources.Tables(spark, sfDir).events
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(25,2)"))).head().getDecimal(0)
    assert(triMass.compareTo(purchMass) === 0)
    assert(tri.filter(col("week_offset") < 0).count() === 0L)
  }
}
