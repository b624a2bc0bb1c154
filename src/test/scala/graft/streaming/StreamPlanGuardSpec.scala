package graft.streaming

import graft.SparkSpec

/** Shuffle budgets for the STREAMING surface (r10 VERDICT #6).
  *
  * PlanGuardSpec deliberately skips `stream_*` — those queries execute on
  * construction and their plans live inside the streaming engine. The
  * per-batch BATCH side is observable though: every parquet-sink drain
  * records its micro-batches' exchange counts (max across batches) in
  * [[StreamOps.batchExchangeCounts]], and the micro-batch Dataset handed
  * to foreachBatch is backed by the engine's already-computed rows, so
  * the recorded count is exactly the drain's `xform` cost — the stateless
  * probe/scoring joins this guard pins.
  *
  * Two invariants:
  *  - every budgeted drain stays at or under its ceiling (a new shuffle
  *    in a probe/scoring join fails HERE, not in a bench three rounds
  *    later);
  *  - every drain that RAN is budgeted (a new drainViaParquetSink
  *    consumer must declare its batch-side budget — unbudgeted shuffles
  *    cannot slip in unlisted).
  *
  * Budgets calibrated at sf0.001 on a cold session; pass-through drains
  * (identity xform) pin at ZERO — the engine's own exchanges never leak
  * into the batch side, so any nonzero count there is a regression.
  */
class StreamPlanGuardSpec extends SparkSpec {

  /** max batch-side shuffle exchanges per drain (ceilings, like
    * PlanGuardSpec's): nonzero entries are the xform joins' documented
    * shapes, zero entries are identity/pass-through drains. */
  private val batchShuffleBudget = Map(
    // identity xforms: the sink write only — zero batch-side shuffles
    "graft_stream_attribution" -> 0,
    "graft_stream_cdc_compact" -> 0,
    "graft_stream_cluster_assign" -> 0, // frozen centroid literals, pure map
    "graft_stream_dedup" -> 0,
    "graft_stream_dedup_ttl" -> 0,
    "graft_stream_events" -> 0,
    "graft_stream_funnel" -> 0,
    "graft_stream_join" -> 0,
    "graft_stream_kn_score" -> 0, // LM tables broadcast-joined, no shuffle
    "graft_stream_ppl_band" -> 0, // frozen scalars; scoring+banding is a map
    "graft_stream_pack_bestfit" -> 0,
    "graft_stream_scd2" -> 0,
    "graft_stream_sessions" -> 0,
    "graft_stream_sessions_native" -> 0,
    "graft_stream_sessions_tws" -> 0,
    "graft_stream_topk" -> 0,
    "graft_stream_transitions" -> 0,
    "graft_stream_unigram_encode" -> 0, // vocab costs are driver literals
    "graft_stream_upsert" -> 0,
    // scoring/probe joins (each the batch operator's own audited shape)
    "graft_stream_linreg" -> 3, // r13 eviction drain: per batch only the FINALIZED day windows append (a filter); the stats tail runs once at read; ceiling kept at the old measured max
    "graft_stream_skyline" -> 4, // B81's sweep tail over the delivered O(prices) state: bucket agg + O(buckets) window + the near-frontier sweep
    "graft_stream_rfm" -> 3, // B80's ntile tail over the delivered O(users) state: anchor agg + the three shared-exchange ntile sorts
    "graft_stream_basket_pairs" -> 5, // r13 eviction drain: per batch only the SETTLED baskets become partial boards — map-side pair expansion (no join) + pair rollup + item rollup + 1-row basket count; ceiling kept at the measured max
    "graft_stream_kcore" -> 2, // B113: B94's settled baskets -> map-side pair expansion + ONE pair partial agg per batch (no item/basket boards); the support cut + peel run once at read
    "graft_stream_pagerank" -> 3, // B114: per batch the orders join (one shuffle pair at deploy) + broadcast dim joins + the O(nations^2) partial agg; the rank iteration runs once at read
    "graft_stream_record_linkage" -> 1, // B127: per batch B126's own blocking+scoring joins all broadcast against the frozen A side; the only exchange is the candidate-pair distinct
    "graft_stream_sssp" -> 1, // B129: per batch the lineitem⋈static-orders join broadcasts and the (c,s,ok) distinct is the only exchange; the weight rollup + relax loop run once at read
    "graft_stream_communities" -> 1, // B131: B113's identical settled-basket pair-partial agg (shared spelling); the LPA rounds run once at read
    "graft_stream_ab_ttest" -> 1, // B133: per batch ONE (type, arm) partial agg to the sufficient statistics; the t/df math runs once at read over the merged board
    "graft_stream_triangle" -> 3, // B117: the SAME per-batch shape as B114 (orders join + broadcast dims + O(nations^2) canonical-edge partial agg); the strong cut + wedge join run once at read
    "graft_stream_winnow" -> 2, // B115: per batch C110's map-side selection — ONE doc-key window + the distinct partial agg; the capped overlap join runs once at read
    "graft_stream_retention" -> 1, // B119: per batch ONE distinct partial agg shrinks arrivals to (user, week) rows; B20's board runs once at read
    "graft_stream_user_ltv" -> 1, // B120: per batch ONE (user, week) grid partial agg; B90's cohort join + rollup run once at read
    "graft_stream_interval_coverage" -> 1, // B121: per batch B36's island sweep — ONE user-key exchange carries the window + island agg; the re-sweep runs once at read
    "graft_stream_theta_ops" -> 2, // B123: per batch the (segment, hash) distinct partial agg + the k-bounded TopK agg — partials are the O(segments·k) sketches themselves; pair algebra runs once at read
    "graft_stream_activity_streaks" -> 1, // B124: per batch ONE distinct partial agg shrinks arrivals to (user, day) rows; B79's island chain runs once at read
    "graft_stream_attribution_shapley" -> 1, // r13 eviction drain: per batch only the SETTLED users' signatures shrink to <=2^m count rows (one partial-agg exchange); the lattice runs once at read over the merged rollup
    "graft_stream_forecast_snaive" -> 4, // r13 eviction drain: per batch only the FINALIZED day windows append (a filter — no exchange); the season tail runs once at read; ceiling kept at the old measured max
    "graft_stream_changepoint" -> 0, // B105: the SAME dailyRevenueDrain machine (filter-only xform — zero batch-side shuffles); B101's CUSUM tail runs once at read
    "graft_stream_acf" -> 0, // B106: the SAME dailyRevenueDrain machine; B102's estimator runs once at read
    "graft_stream_ccf" -> 0, // B135: the SAME dailyRevenueDrain machine; B134's pairwise Pearson board runs once at read
    "graft_stream_top_paths" -> 1, // B108: per batch the settled paths shrink to (path, n) partials — one partial-agg exchange; the rank board runs once at read
    "graft_stream_benford" -> 1, // B109: per batch the stateless digit map shrinks to (digit, n) partials — one partial-agg exchange; the χ² board runs once at read
    "graft_stream_nb_score" -> 1, // per-doc token rollup; model broadcast
    "graft_stream_index_probe" -> 1, // band equi-join vs the persisted index
    "graft_stream_phash_probe" -> 1, // band equi-join vs the persisted index
    "graft_stream_line_dedup" -> 2, // line df census + LEFT join back
    "graft_stream_decontaminate" -> 3, // bench bcast + pair dedup + verify join
    "graft_stream_quality_ensemble" -> 5, // B66's own 3-signal vote joins
    "graft_stream_substring_scrub" -> 2, // dup-start collect agg + the doc-key join back; the frozen census joins broadcast
    "graft_stream_dup_spans" -> 2, // C105's island tail per batch: the dup-start join (census broadcast) + the doc-key island window share the doc exchange; (doc, island) rollup rides it (measured 2)
    "graft_stream_admission_chain" -> 8, // B61's staged gate joins; r15 adds the winnow copy-gate's corpus-scale shapes (hash-key pair join vs the checkpointed history board + pair rollup + the ratio join) — the board is corpus-sized at deploy, so NOT broadcast by design (measured 8)
    "graft_stream_ann_lsh_stats" -> 1 // B100: per-batch (table, bucket) count partials — one partial-agg exchange; the table rollup runs at read (measured 1)
  )

  test("streaming batch-side shuffle budgets hold, and every drained " +
      "query is budgeted") {
    StreamOps.batchExchangeCounts.clear()
    val names = graft.SparkEntry.queries.keys
      .filter(_.startsWith("stream")).toSeq.sorted
    names.foreach(n => graft.SparkEntry.queries(n)(spark, sfDir).count())
    val got = StreamOps.batchExchangeCounts.readOnlySnapshot().toMap
    assert(got.nonEmpty)
    val over = got.toSeq.sortBy(_._1).flatMap { case (name, n) =>
      batchShuffleBudget.get(name) match {
        case None => Some(s"$name: UNBUDGETED drain ($n exchanges) — " +
          "add it to batchShuffleBudget")
        case Some(b) if n > b => Some(s"$name: $n exchanges (budget $b)")
        case _ => None
      }
    }
    assert(over.isEmpty, over.mkString("; "))
    // the budget list carries no dead entries (a renamed drain would
    // silently stop being guarded otherwise)
    val stale = batchShuffleBudget.keys.filterNot(got.contains).toSeq.sorted
    assert(stale.isEmpty, s"budgeted drains that never ran: $stale")
  }
}
