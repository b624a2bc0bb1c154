package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OlapDSpec extends SparkSpec {

  test("attribution: replays an independent last-touch computation") {
    val evs = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val byUser = evs.groupBy(_._1)
    val expected = evs.filter(_._4 == "purchase").map { p =>
      val before = byUser(p._1)
        .filter(e => e._4 == "click" &&
          (e._2 < p._2 || (e._2 == p._2 && e._3 < p._3)))
      val lastClick = if (before.isEmpty) None
        else Some(before.maxBy(e => (e._2, e._3)))
      val eligible = lastClick.filter(_._2 >= p._2 - OlapD.AttrWindowUs)
      (p._3, eligible.map(_._3), eligible.map(_._2))
    }.sortBy(_._1)
    val got = OlapD.attribution(spark, sfDir).collect().map(r =>
      (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.toSeq === expected.toSeq)
    // both buckets exist: attributed purchases and organic ones
    assert(got.exists(_._2.isDefined) && got.exists(_._2.isEmpty))
  }

  test("triangle_count: known graph — clique triangles, no path/star/hub false positives") {
    import spark.implicits._
    // K4 on {0,1,2,3} (each node in C(3,2)=3 triangles), a path 4-5-6,
    // a star hub 7 -> {8,9,10}, node 11 isolated; duplicate directions
    // and self-loops must collapse/drop
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (2L, 1L), (3L, 3L), // reverse dup + self-loop
      (4L, 5L), (5L, 6L),
      (7L, 8L), (7L, 9L), (7L, 10L)).toDF("src", "dst")
    val nodes = (0L to 11L).toDF("node")
    val got = OlapD.triangleCountOn(edges, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (0L to 11L).map(n => n -> (if (n <= 3) 3L else 0L)).toMap
    assert(got === expected)
  }

  test("interval_overlap equals a brute-force overlap join") {
    val rows = OlapD.intervalOverlapQ(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // ownership-bucket dedup: every (session, promo) pair appears once
    val keys = rows.map(t => (t._1, t._2, t._3))
    assert(keys.distinct.length === keys.length)
    // brute force over the collected sessions × promo windows
    val base = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val sessions = Sessionize.assign(base, "user_id", "ts_us",
        OlapB.SessionGapUs, "event_id")
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_us")).as("s"), max(col("ts_us")).as("e")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tsAll = sessions.flatMap(s => Seq(s._3, s._4))
    val (d0, d1) = (tsAll.min / OlapD.DayUs, tsAll.max / OlapD.DayUs)
    val expected = (for {
      (u, sid, s, e) <- sessions
      d <- d0 to d1
      ps = d * OlapD.DayUs + OlapD.PromoStartUs
      pe = d * OlapD.DayUs + OlapD.PromoEndUs
      if s <= pe && ps <= e
    } yield (u, sid, d, math.min(e, pe) - math.max(s, ps))).sortBy(t => (t._1, t._2, t._3))
    assert(rows.toSeq === expected.toSeq)
    assert(rows.nonEmpty)
  }

  test("unpivot_wide is the inverse of the pivot (round trip = direct long agg)") {
    val direct = graft.sources.Tables(spark, sfDir).events
      .filter(col("event_type").isin(OlapB.EventTypes: _*))
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(Olap.dsum(col("value"), 2).as("value_sum"))
      .collect().map(_.toString).sorted
    val melted = OlapD.unpivotWide(spark, sfDir).collect().map(_.toString).sorted
    assert(melted.nonEmpty && melted.toSeq === direct.toSeq)
  }

  test("triangle_count query: total is consistent and the graph is non-trivial") {
    val rows = OlapD.triangleCount(spark, sfDir).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total % 3 === 0, "every triangle has exactly 3 corners")
    assert(rows.map(_.getLong(2)).distinct.length > 1,
      "thresholded trade graph should not be complete/regular")
  }

  test("table_integrity: seeded violations fail by known counts; clean checks pass (C89)") {
    val t = graft.sources.Tables(spark, sfDir)
    val rows = OlapD.tableIntegrity(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 7)
    val by = rows.map(r => (r._1, r._2) -> r._4).toMap
    // seeded counts, exactly: one duplicate-pk row per %101 doc (which
    // also carries the bumped n_chars), one 63-dim orphan per %97 vec,
    // one orphan lineitem per %89 orderkey row
    val dupDocs = t.documents.filter(col("doc_id") % 101 === 0).count()
    val badVecs = t.embeddings.filter(col("vec_id") % 97 === 0).count()
    val orphLi = t.lineitem.filter(col("l_orderkey") % 89 === 0).count()
    assert(dupDocs > 0 && badVecs > 0 && orphLi > 0, "seeding degenerate")
    assert(by(("documents", "pk_unique")) === dupDocs)
    assert(by(("documents", "n_chars_consistent")) === dupDocs)
    assert(by(("embeddings", "dim_64")) === badVecs)
    assert(by(("embeddings", "fk_documents")) === badVecs)
    assert(by(("lineitem", "fk_orders")) === orphLi)
    // the untouched checks prove the clean lake passes
    assert(by(("documents", "text_not_null")) === 0L)
    assert(by(("orders", "fk_customer")) === 0L)
    // n_rows reflects the seeded unions
    val byN = rows.map(r => (r._1, r._2) -> r._3).toMap
    assert(byN(("documents", "pk_unique")) === t.documents.count() + dupDocs)
    assert(byN(("embeddings", "dim_64")) === t.embeddings.count() + badVecs)
  }

  test("attribution_linear: credit conserves per purchase and agrees " +
      "with last-touch eligibility (B72)") {
    import org.apache.spark.sql.functions._
    val linear = OlapD.attributionLinear(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(linear.nonEmpty)
    // conservation: total distributed credit never exceeds the credited
    // purchases' value mass, and misses it only by the integer-floor
    // remainder (< n_touch micro-units per purchase)
    val lt = OlapD.attribution(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getDouble(5)))
    // linear's credited purchase set ⊇ last-touch's (a strictly-before
    // in-window click satisfies the closed window too; same-instant
    // clicks can ONLY add linear credit): so distributed credit is
    // bounded above by the TOTAL purchase mass and below by the
    // last-touch credited mass minus the integer-floor remainders
    // (< n_touch micro-units per purchase, Σ < total pairs)
    val allPurchValueMicro = lt.map(p => math.floor(p._4 * 1e6).toLong).sum
    val ltCreditedMicro = lt.filter(_._3.isDefined)
      .map(p => math.floor(p._4 * 1e6).toLong).sum
    val distributed = linear.values.map(_._2).sum
    val totalPairs = linear.values.map(_._1).sum
    assert(distributed <= allPurchValueMicro)
    assert(distributed >= ltCreditedMicro - totalPairs)
    // every purchase with a last-touch click gets SOME linear credit
    // receiver (the last-touch click is inside the same window), and
    // that click is among the receivers
    val receivers = linear.keySet.map(_._2)
    lt.foreach { case (_, user, click, _) =>
      click.foreach(c => assert(receivers.contains(c),
        s"last-touch click $c of user $user received no linear credit")) }
  }

  test("rfm_segments: hand-checked quartiles on seeded users, ordered " +
      "monotonicity and balance on the real corpus (B80)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // anchor day comes from ALL events (the trailing click), not just
    // purchases
    val evs = Seq(
      (1L, "2024-01-01", "purchase", 10.0),
      (1L, "2024-01-05", "purchase", 30.0),
      (2L, "2024-01-08", "purchase", 5.0),
      (3L, "2024-01-02", "purchase", 100.0),
      (4L, "2024-01-09", "purchase", 1.0),
      (9L, "2024-01-11", "click", 0.0))
      .toDF("user_id", "day", "event_type", "value")
      .select(col("user_id"), col("day").cast("date").cast("timestamp")
        .as("ts"), col("event_type"), col("value"))
    val got = OlapD.rfmSegmentsOn(evs, "user_id", "ts", "event_type",
        "value", "purchase").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))).toMap
    assert(got === Map(
      1L -> ((6L, 2L, 40.0, 2L, 4L, 3L, "243")),
      2L -> ((3L, 1L, 5.0, 3L, 1L, 2L, "312")),
      3L -> ((9L, 1L, 100.0, 1L, 2L, 4L, "124")),
      4L -> ((2L, 1L, 1.0, 4L, 3L, 1L, "431"))))

    // real corpus: ntile assignment respects each metric's total order
    // and buckets stay balanced within one user
    val real = OlapD.rfmSegments(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(real.nonEmpty)
    def monotone(sorted: Seq[Long]): Boolean =
      sorted.zip(sorted.tail).forall { case (a, b) => a <= b }
    assert(monotone(real.sortBy(u => (-u._2, u._1)).map(_._5).toSeq)) // r_q
    assert(monotone(real.sortBy(u => (u._3, u._1)).map(_._6).toSeq)) // f_q
    assert(monotone(real.sortBy(u => (u._4, u._1)).map(_._7).toSeq)) // m_q
    Seq(real.map(_._5), real.map(_._6), real.map(_._7)).foreach { qs =>
      val sizes = qs.groupBy(identity).view.mapValues(_.size).values
      assert(qs.toSet === Set(1L, 2L, 3L, 4L) &&
        sizes.max - sizes.min <= 1)
    }
  }

  test("activity_streaks: islands on seeded days, brute-force parity on " +
      "the real corpus, one user-key exchange (B79)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // user 1: days 1,2,3 | 5 | 10,11 (with a same-day duplicate);
    // user 2: one day
    val evs = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-02"),
      (1L, "2024-01-03"), (1L, "2024-01-05"),
      (1L, "2024-01-10"), (1L, "2024-01-11"),
      (2L, "2024-02-01"))
      .toDF("user_id", "day")
      .select(col("user_id"), (col("day").cast("date")).cast("timestamp")
        .as("ts"))
    val got = OlapD.activityStreaksOn(evs, "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 6L, 3L, 3L), (2L, 1L, 1L, 1L)))

    // real corpus: brute-force reimplementation over collected days
    val days = graft.sources.Tables(spark, sfDir).events
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expected = days.toSeq.map { case (u, ds) =>
      val streaks = ds.foldLeft(List.empty[Long]) { (acc, d) => acc match {
        case h :: t if ds.contains(d.minusDays(1)) => (h + 1) :: t
        case _ => 1L :: acc
      }}
      (u, ds.size.toLong, streaks.size.toLong, streaks.max)
    }.sortBy(_._1)
    val real = OlapD.activityStreaks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(real.nonEmpty && real.toSeq === expected)
  }

  test("attribution_time_decay: power-of-two recency weights, integer " +
      "split, window-edge clamp, conservation (B77)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val hourUs = 3600L * 1000000L
    val p = 1000L * hourUs // purchase instant
    // clicks at ages 0h / 25h / 73h → day buckets 0/1/3 → weights 64/32/8;
    // plus one at EXACTLY the window edge (7 days) → clamped to weight 1
    val evs = Seq(
      (1L, p, 10L, "purchase", 100.0),
      (1L, p, 1L, "click", 0.0),
      (1L, p - 25 * hourUs, 2L, "click", 0.0),
      (1L, p - 73 * hourUs, 3L, "click", 0.0),
      (1L, p - OlapD.AttrWindowUs, 4L, "click", 0.0),
      // outside the window by 1 us: no credit
      (1L, p - OlapD.AttrWindowUs - 1, 5L, "click", 0.0),
      // an unrelated user's click: never paired
      (2L, p, 6L, "click", 0.0))
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
    val got = OlapD.attributionTimeDecayOn(evs, "user_id", "ts_us",
        "event_id", "event_type", "value", "click", "purchase",
        OlapD.AttrWindowUs, OlapD.DecayHalfLifeUs).collect()
      .map(r => (r.getLong(1), r.getLong(3))).toMap
    val vMicro = 100000000L
    val wSum = 64L + 32 + 8 + 1
    assert(got === Map(
      1L -> vMicro * 64 / wSum, 2L -> vMicro * 32 / wSum,
      3L -> vMicro * 8 / wSum, 4L -> vMicro * 1 / wSum))
    // recency strictly dominates within the purchase
    assert(got(1L) > got(2L) && got(2L) > got(3L) && got(3L) > got(4L))
    // conservation: full value minus only the floor remainders
    val dist = got.values.sum
    assert(dist <= vMicro && dist >= vMicro - 4)

    // real corpus: same credited-pair structure as B72 (same window,
    // same RangeJoin pairs) — identical click set and purchase counts,
    // total credit bounded by linear's conservation envelope
    val decay = OlapD.attributionTimeDecay(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val linear = OlapD.attributionLinear(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(decay.nonEmpty && decay.keySet === linear.keySet)
    assert(decay.forall { case (k, (np, _)) => linear(k)._1 == np })
    val dTot = decay.values.map(_._2).sum
    val lTot = linear.values.map(_._2).sum
    val pairsTot = linear.values.map(_._1).sum
    // both models distribute the same mass up to floor remainders
    assert(math.abs(dTot - lTot) <= pairsTot)
  }

  test("bloom_semi_join: bloom pre-filter is semantically invisible, " +
      "sound (no false negatives), deterministic, and scan-fused (B76)") {
    import org.apache.spark.sql.functions._
    val t = graft.sources.Tables(spark, sfDir)
    val dim = t.orders.filter(col("o_orderpriority") === "1-URGENT")

    // invisible: pruned+verified result == plain semi-join rollup
    val got = OlapD.bloomSemiJoin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val plain = t.lineitem
      .join(dim.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        Olap.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy(col("l_returnflag"), col("l_linestatus")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.toSeq === plain.toSeq)

    // sound + selective: every true-matching fact row passes the bloom
    // (superset), and the bloom actually prunes the complement
    val bloom = OlapD.keyBloomOf(dim, "o_orderkey")
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val probe = column(BloomFilterMightContain(
      expression(lit(bloom)), expression(xxhash64(col("l_orderkey")))))
    val nFact = t.lineitem.count()
    val nPass = t.lineitem.filter(probe).count()
    val nTrue = t.lineitem.join(dim.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(nTrue <= nPass, "bloom dropped a true match (false negative)")
    assert(nPass < nFact, "bloom pruned nothing")

    // deterministic: the aggregate is order-independent bit-for-bit
    assert(java.util.Arrays.equals(bloom, OlapD.keyBloomOf(dim, "o_orderkey")))

    // scan-fused: every bloom probe Filter sits DIRECTLY over a file
    // scan — the pruned complement never reaches an exchange
    val plan = OlapD.bloomSemiJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    val probes = lines.zipWithIndex.filter(_._1.contains("might_contain("))
    assert(probes.nonEmpty, "bloom probe missing from the executed plan")
    probes.foreach { case (_, i) =>
      assert(lines(i + 1).contains("FileScan"),
        s"bloom probe at plan line $i is not fused over the scan") }

    // empty dim: null bloom short-circuits to the (vacuously empty)
    // semi-join; null fact keys never match, mirroring SQL equality
    import spark.implicits._
    val fact = Seq(Some(1L), Some(2L), None).toDF("k")
    val emptyDim = Seq.empty[Long].toDF("d")
    assert(OlapD.bloomSemiJoinOn(fact, "k", emptyDim, "d").count() === 0L)
    val nullDim = Seq(1L, 3L).toDF("d")
    val kept = OlapD.bloomSemiJoinOn(fact, "k", nullDim, "d")
      .collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(1L))
  }

  test("skyline_2d: hand-checked frontier, and the skyline property " +
      "(no survivor dominated, every point covered) on the real corpus") {
    import spark.implicits._
    // min price / max qty; (3,4) is dominated by (2,5); (2,2) by (2,5)
    // (equal price, higher qty); (4,1) by everything cheaper-and-bigger
    val pts = Seq((1.0, 3.0), (2.0, 5.0), (3.0, 4.0), (2.0, 2.0),
      (4.0, 6.0), (4.0, 1.0)).toDF("p", "q")
    val got = OlapD.skyline2dOn(pts, "p", "q").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(got === Seq((1.0, 3.0), (2.0, 5.0), (4.0, 6.0)))

    // real corpus: the skyline PROPERTY, checked distributedly —
    // (a) soundness: no survivor is dominated by any corpus point;
    // (b) completeness: every corpus point is covered (dominated-or-
    //     equal) by some survivor
    val items = graft.sources.Tables(spark, sfDir).lineitem
      .select(col("l_extendedprice").cast("decimal(25,6)").as("cp"),
        col("l_quantity").cast("decimal(25,6)").as("cq"))
    val sky = OlapD.skyline2d(spark, sfDir)
      .select(col("price").cast("decimal(25,6)").as("sp"),
        col("qty").cast("decimal(25,6)").as("sq"))
    assert(sky.count() > 0)
    val dominators = items.join(broadcast(sky),
      col("cp") <= col("sp") && col("cq") >= col("sq") &&
        (col("cp") < col("sp") || col("cq") > col("sq")))
    assert(dominators.count() === 0L, "a survivor is dominated")
    val uncovered = items.join(broadcast(sky),
        col("sp") <= col("cp") && col("sq") >= col("cq"), "left_anti")
    assert(uncovered.count() === 0L, "a corpus point is not covered")
  }

  test("skyline_2d: the bucket pre-prune is semantically invisible " +
      "(equals the plain one-window sweep)") {
    val items = graft.sources.Tables(spark, sfDir).lineitem
    val pts = items.select(
        col("l_extendedprice").cast("decimal(25,6)").as("price"),
        col("l_quantity").cast("decimal(25,6)").as("qty"))
      .groupBy(col("price")).agg(max(col("qty")).as("qty"))
    val sweep = org.apache.spark.sql.expressions.Window
      .orderBy(col("price"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val naive = pts.withColumn("runmax", max(col("qty")).over(sweep))
      .filter(col("runmax").isNull || col("qty") > col("runmax"))
      .select(col("price").cast("double"), col("qty").cast("double"))
      .orderBy(col("price"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val pruned = OlapD.skyline2d(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(pruned.toSeq === naive.toSeq)
  }

  test("linreg_trend: exact rational on a seeded series, NULL slope on " +
      "a single-day group, double parity on the real corpus") {
    import spark.implicits._
    // group a: y = 2x + 1 over three days → slope exactly 2/day;
    // group b: one day → den 0 → NULL slope
    val rows = Seq(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-02", 3.0),
      ("a", "2024-01-03", 5.0),
      ("b", "2024-06-01", 7.0))
      .toDF("g", "ds", "rev")
      .select(col("g"), to_date(col("ds")).as("d"), col("rev"))
    val got = OlapD.linregTrendOn(rows, "g", "d", "rev").collect()
    val a = got.find(_.getString(0) == "a").get
    assert(a.getLong(1) === 3L)  // n_days
    assert(a.getLong(2) === 12L) // num = n·Σxy − Σx·Σy = 39 − 27
    assert(a.getLong(3) === 6L)  // den = n·Σx² − (Σx)² = 15 − 9
    assert(a.getDouble(4) === 2.0)
    val b = got.find(_.getString(0) == "b").get
    assert(b.getLong(3) === 0L && b.isNullAt(4))

    // real corpus: the integer rational agrees with a driver-side
    // double OLS on the collected daily rollup
    val daily = graft.sources.Tables(spark, sfDir).lineitem
      .groupBy(col("l_returnflag").as("g"), to_date(col("l_shipdate")).as("d"))
      .agg(sum(expr("CAST(l_extendedprice * (1.0 - l_discount) " +
        "AS DECIMAL(25,6))")).as("rev"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate,
        math.floor(r.getDecimal(2).doubleValue())))
    val expect = daily.groupBy(_._1).map { case (g, xs) =>
      val d0 = xs.map(_._2).min
      val pts = xs.map(t => (t._2.toEpochDay - d0.toEpochDay).toDouble -> t._3)
      val n = pts.size.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(t => t._1 * t._2).sum
      val sxx = pts.map(t => t._1 * t._1).sum
      g -> (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    OlapD.linregTrend(spark, sfDir).collect().foreach { r =>
      val e = expect(r.getString(0))
      assert(math.abs(r.getDouble(4) - e) <= math.abs(e) * 1e-6 + 1e-6,
        s"${r.getString(0)}: ${r.getDouble(4)} vs $e")
    }
  }

  test("fd_profile: seeded FDs — a held key, a violated pair, and the " +
      "NULL-as-value discipline; key-implied FDs hold on the corpus") {
    import spark.implicits._
    val t = Seq(
      (1L, "x", "m"), (1L, "x", "n"),   // a=1: b stable, c violates
      (2L, "y", "m"), (2L, "y", "m"),
      (3L, null.asInstanceOf[String], "m"),          // a=3: b is {NULL}
      (4L, "z", "m"), (4L, null.asInstanceOf[String], "m")) // b={z,NULL}
      .toDF("a", "b", "c")
    val ab = OlapD.fdCheckOn(t, "a", "b", "t.a->b").collect().head
    // groups: 1→{x} ok, 2→{y} ok, 3→{NULL} nb=1 ok, 4→{z,NULL} nb=2
    assert((ab.getLong(1), ab.getLong(2), ab.getLong(3), ab.getInt(4)) ===
      ((4L, 1L, 2L, 0)))
    val ac = OlapD.fdCheckOn(t, "a", "c", "t.a->c").collect().head
    assert((ac.getLong(1), ac.getLong(2), ac.getInt(4)) === ((4L, 1L, 0)))

    val board = OlapD.fdProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getInt(4)).toMap
    assert(board("customer.c_custkey->c_mktsegment") === 1) // key-implied
    assert(board("orders.o_orderkey->o_orderpriority") === 1)
    assert(board.size === OlapD.FdCandidates.size)
  }
}
