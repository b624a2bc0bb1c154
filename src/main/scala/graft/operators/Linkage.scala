package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** B126/B127: probabilistic RECORD LINKAGE (Fellegi & Sunter 1969) —
  * the entity-resolution capability none of the dedup family covers:
  * dedup asks "is this the same TEXT", linkage asks "is this the same
  * ENTITY across two differently-dirty sources", scored field-by-field.
  *
  * Pipeline (the production shape):
  *  1. MULTI-PASS BLOCKING — candidate pairs come from the UNION of
  *     cheap equi-joins, one per pass (pass 1: normalized name; pass 2:
  *     (nation, balance-cents)), so a record whose name was mangled is
  *     still reachable through the balance pass and vice versa. Never
  *     all-pairs: each pass is an equi-join on its block key, the scale
  *     unit a 100 TB run shuffles on.
  *  2. AGREEMENT VECTOR — per candidate pair, one level per field
  *     (name: exact / case-insensitive / disagree; nation, balance,
  *     segment: agree / disagree). Pure map-side column algebra.
  *  3. FELLEGI-SUNTER SCORE — Σ of frozen integer weights (milli-bits,
  *     1000·log₂(m/u) for declared match/unmatch probabilities, rounded
  *     to stable integers so the score is hash-exact cross-engine; the
  *     classifier depends only on the thresholds, which the spec pins).
  *  4. CLASSIFY — match / possible (clerical review) / non_match by the
  *     two FS thresholds.
  *
  * The driver key links the customer table against a deterministic
  * "import feed" derived from it (the linkage literature's standard
  * evaluation shape — known truth, controlled noise):
  *  - keys %3==0, %15!=0 → TIER 1: name case-mangled, rest intact
  *    (score 24500 → match);
  *  - keys %15==0 → TIER 2: name case-mangled AND balance off by 7
  *    cents (score 12500 → possible — exactly the conflict a clerk
  *    reviews);
  *  - keys %3==2 → NOVEL: unrecognizable name, balance +13, unknown
  *    segment — reachable only through pass-2 chance collisions on
  *    (nation, cents), which score 2500 → non_match.
  * Everything (the feed, both passes, the weights) replays in SQL, so
  * the key is HASH-checked, and the streaming twin derives the same
  * feed map-side per micro-batch against the static customer side —
  * zero state, drain == batch, shared oracle. */
object Linkage {

  // Frozen FS weights in MILLI-BITS (1000·log₂(m/u), rounded): declared
  // m/u — name ci-match m=.95/u=.0005 (~10.9 bits ≈ 11000), name exact
  // m=.90/u=.0001 (~13.1 ≈ 14000 with the exact-beats-ci margin), name
  // disagree (1-m)/(1-u) (~-4.3, widened to -8000: a name conflict is
  // near-disqualifying at these sources' error rates), nation m=.98/u=.04
  // (~+1500 agree / -4000 disagree), balance-cents m=.90/u=.00009
  // (~+10000 / -2000), segment m=.95/u=.2 (~+2000 / -1000).
  val WNameExact = 14000L
  val WNameCi = 11000L
  val WNameDis = -8000L
  val WNationAgr = 1500L
  val WNationDis = -4000L
  val WBalAgr = 10000L
  val WBalDis = -2000L
  val WSegAgr = 2000L
  val WSegDis = -1000L

  /** FS thresholds: ≥ upper → match; ≥ lower → possible; else non_match. */
  val MatchThreshold = 20000L
  val PossibleThreshold = 8000L

  /** Exact balance key: cents on the half-up integer grid — the same
    * IEEE chain in both engines, so the block key cannot fork. */
  private def cents(c: Column): Column =
    floor(c * lit(100) + lit(0.5)).cast("long")

  /** The A side: customers as (id, name, nation, cents, seg). */
  private[graft] def sideAOf(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_nationkey").cast("long").as("nation"),
      cents(col("c_acctbal")).as("cents"),
      col("c_mktsegment").as("seg"))

  private[graft] def sideA(spark: SparkSession, dir: String): DataFrame =
    sideAOf(Tables(spark, dir).customer)

  /** The deterministic import feed (the B side), derivable map-side from
    * any customer frame — the streaming twin applies it per micro-batch. */
  private[graft] def importFeedOf(customer: DataFrame): DataFrame = {
    val k = col("c_custkey")
    val tier = customer.filter(k % 3 === 0).select(
      (k + 1000000L).as("id"), lower(col("c_name")).as("name"),
      col("c_nationkey").cast("long").as("nation"),
      (cents(col("c_acctbal")) +
        when(k % 15 === 0, lit(7L)).otherwise(lit(0L))).as("cents"),
      col("c_mktsegment").as("seg"))
    val novel = customer.filter(k % 3 === 2).select(
      (k + 2000000L).as("id"),
      concat(lit("Unknown#"), k.cast("string")).as("name"),
      col("c_nationkey").cast("long").as("nation"),
      (cents(col("c_acctbal")) + lit(13L)).as("cents"),
      lit("UNKNOWN").as("seg"))
    tier.unionByName(novel)
  }

  /** The generic linkage core over two (id, name, nation, cents, seg)
    * sides: multi-pass blocking → agreement vector → FS score → class.
    * Output: one row per CANDIDATE pair, ordered columns only. */
  /** `bandWidth` is pass 2's block-size knob: the shipped 1e5-cent band
    * keeps all three classes exercised at test scale; a corpus scale-up
    * NARROWS it so Σ|A_block|·|B_block| stays bounded (the 24× probe
    * runs width/reps — the nLists discipline applied to blocking). */
  def linkagePairsOn(a: DataFrame, b: DataFrame,
      bandWidth: Long = 100000L): DataFrame = {
    val aF = a.select(col("id").as("a_id"), col("name").as("a_name"),
      col("nation").as("a_nation"), col("cents").as("a_cents"),
      col("seg").as("a_seg"), lower(col("name")).as("_ak"))
    val bF = b.select(col("id").as("b_id"), col("name").as("b_name"),
      col("nation").as("b_nation"), col("cents").as("b_cents"),
      col("seg").as("b_seg"), lower(col("name")).as("_bk"))
    // pass 1: normalized name; pass 2: (nation, balance BAND — cents DIV
    // 1e5, both engines truncate toward zero) — union, distinct. The
    // band width is the block-size knob: coarse here so the possible/
    // non_match classes are exercised at test scale; a 100 TB run
    // narrows it (or adds a pass) to keep blocks bounded, exactly like
    // raising nLists on the ANN side.
    val p1 = aF.join(bF, aF("_ak") === bF("_bk"))
      .select(col("a_id"), col("b_id"))
    val p2 = aF.join(bF, aF("a_nation") === bF("b_nation") &&
        expr(s"a_cents DIV $bandWidth") === expr(s"b_cents DIV $bandWidth"))
      .select(col("a_id"), col("b_id"))
    val cand = p1.unionAll(p2).distinct()
    val scored = cand.join(aF.drop("_ak"), "a_id").join(bF.drop("_bk"), "b_id")
      .withColumn("name_lvl",
        when(col("a_name") === col("b_name"), lit(2))
          .when(lower(col("a_name")) === lower(col("b_name")), lit(1))
          .otherwise(lit(0)))
      .withColumn("nation_agr",
        when(col("a_nation") === col("b_nation"), lit(1)).otherwise(lit(0)))
      .withColumn("bal_agr",
        when(col("a_cents") === col("b_cents"), lit(1)).otherwise(lit(0)))
      .withColumn("seg_agr",
        when(col("a_seg") === col("b_seg"), lit(1)).otherwise(lit(0)))
    val score =
      when(col("name_lvl") === 2, lit(WNameExact))
        .when(col("name_lvl") === 1, lit(WNameCi))
        .otherwise(lit(WNameDis)) +
      when(col("nation_agr") === 1, lit(WNationAgr))
        .otherwise(lit(WNationDis)) +
      when(col("bal_agr") === 1, lit(WBalAgr)).otherwise(lit(WBalDis)) +
      when(col("seg_agr") === 1, lit(WSegAgr)).otherwise(lit(WSegDis))
    scored.withColumn("score", score)
      .withColumn("class",
        when(col("score") >= MatchThreshold, lit("match"))
          .when(col("score") >= PossibleThreshold, lit("possible"))
          .otherwise(lit("non_match")))
      .select(col("a_id"), col("b_id"), col("name_lvl"),
        col("nation_agr"), col("bal_agr"), col("seg_agr"),
        col("score"), col("class"))
  }

  def recordLinkage(spark: SparkSession, dir: String): DataFrame =
    linkagePairsOn(sideA(spark, dir),
        importFeedOf(Tables(spark, dir).customer))
      .orderBy(col("a_id"), col("b_id"))

  private val sidesSql =
    s"""a AS (
       |  SELECT c_custkey AS id, c_name AS name,
       |    CAST(c_nationkey AS BIGINT) AS nation,
       |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
       |    c_mktsegment AS seg
       |  FROM customer),
       |b AS (
       |  SELECT c_custkey + 1000000 AS id, lower(c_name) AS name,
       |    CAST(c_nationkey AS BIGINT) AS nation,
       |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
       |      + CASE WHEN c_custkey % 15 = 0 THEN 7 ELSE 0 END AS cents,
       |    c_mktsegment AS seg
       |  FROM customer WHERE c_custkey % 3 = 0
       |  UNION ALL
       |  SELECT c_custkey + 2000000 AS id,
       |    'Unknown#' || CAST(c_custkey AS VARCHAR) AS name,
       |    CAST(c_nationkey AS BIGINT) AS nation,
       |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 13 AS cents,
       |    'UNKNOWN' AS seg
       |  FROM customer WHERE c_custkey % 3 = 2)""".stripMargin

  /** The CTE chain shared by the pair key and the golden-record key
    * (everything up to the classified pair table `v`). */
  private val linkageBodySql: String =
    s"""$sidesSql,
       |cand AS (
       |  SELECT DISTINCT a_id, b_id FROM (
       |    SELECT a.id AS a_id, b.id AS b_id FROM a JOIN b
       |      ON lower(a.name) = lower(b.name)
       |    UNION ALL
       |    SELECT a.id AS a_id, b.id AS b_id FROM a JOIN b
       |      ON a.nation = b.nation
       |      AND a.cents // 100000 = b.cents // 100000)),
       |scored AS (
       |  SELECT a_id, b_id,
       |    CASE WHEN a.name = b.name THEN 2
       |         WHEN lower(a.name) = lower(b.name) THEN 1 ELSE 0 END
       |      AS name_lvl,
       |    CASE WHEN a.nation = b.nation THEN 1 ELSE 0 END AS nation_agr,
       |    CASE WHEN a.cents = b.cents THEN 1 ELSE 0 END AS bal_agr,
       |    CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS seg_agr
       |  FROM cand JOIN a ON a.id = a_id JOIN b ON b.id = b_id),
       |w AS (
       |  SELECT *,
       |    CAST(CASE name_lvl WHEN 2 THEN $WNameExact WHEN 1 THEN $WNameCi
       |          ELSE $WNameDis END
       |     + CASE nation_agr WHEN 1 THEN $WNationAgr ELSE $WNationDis END
       |     + CASE bal_agr WHEN 1 THEN $WBalAgr ELSE $WBalDis END
       |     + CASE seg_agr WHEN 1 THEN $WSegAgr ELSE $WSegDis END
       |     AS BIGINT) AS score
       |  FROM scored),
       |v AS (
       |  SELECT *,
       |    CASE WHEN score >= $MatchThreshold THEN 'match'
       |         WHEN score >= $PossibleThreshold THEN 'possible'
       |         ELSE 'non_match' END AS class
       |  FROM w)""".stripMargin

  val recordLinkageSql: String =
    s"""WITH $linkageBodySql
       |SELECT a_id, b_id, name_lvl, nation_agr, bal_agr, seg_agr, score,
       |  class
       |FROM v
       |ORDER BY a_id, b_id""".stripMargin

  // --- B136: golden-record survivorship over the match graph ---------------
  /** The step AFTER linkage that a master-data deploy actually ships:
    * per master (A) record, the surviving GOLDEN row — the best match
    * (max score, ties to the smaller import id — the bounded-heap
    * rule), how many imports matched, and how many sit in the clerical
    * (possible) queue. Masters with no candidates at all still appear
    * (n_matched = n_possible = 0): the golden table is a TOTAL view of
    * the master side, not a join artifact. */
  def linkageGolden(spark: SparkSession, dir: String): DataFrame = {
    val a = sideA(spark, dir)
    val pairs = linkagePairsOn(a,
        importFeedOf(Tables(spark, dir).customer))
      .localCheckpoint(eager = true) // feeds both class rollups
    val best = pairs.filter(col("class") === "match")
      .groupBy(col("a_id"))
      .agg(count(lit(1)).as("n_matched"),
        graft.functions.topk.top_k_by_score(
          col("score").cast("double"), col("b_id"), 1).as("_tk"))
      .select(col("a_id"), col("n_matched"),
        col("_tk").getItem(0).getField("id").as("best_b_id"),
        col("_tk").getItem(0).getField("score").cast("long")
          .as("best_score"))
    val poss = pairs.filter(col("class") === "possible")
      .groupBy(col("a_id")).agg(count(lit(1)).as("n_possible"))
    a.select(col("id").as("a_id"), col("name"), col("nation"),
        col("cents"), col("seg"))
      .join(best, Seq("a_id"), "left")
      .join(poss, Seq("a_id"), "left")
      .select(col("a_id"), col("name"), col("nation"), col("cents"),
        col("seg"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        coalesce(col("n_possible"), lit(0L)).as("n_possible"),
        col("best_b_id"), col("best_score"))
      .orderBy(col("a_id"))
  }

  val linkageGoldenSql: String =
    s"""WITH $linkageBodySql,
       |best AS (
       |  SELECT a_id, n_matched, b_id AS best_b_id, score AS best_score
       |  FROM (
       |    SELECT a_id, b_id, score,
       |      COUNT(*) OVER (PARTITION BY a_id) AS n_matched,
       |      ROW_NUMBER() OVER (PARTITION BY a_id
       |        ORDER BY score DESC, b_id) AS rn
       |    FROM v WHERE class = 'match')
       |  WHERE rn = 1),
       |poss AS (
       |  SELECT a_id, COUNT(*) AS n_possible FROM v
       |  WHERE class = 'possible' GROUP BY a_id)
       |SELECT a.id AS a_id, a.name, a.nation, a.cents, a.seg,
       |  COALESCE(best.n_matched, 0) AS n_matched,
       |  COALESCE(poss.n_possible, 0) AS n_possible,
       |  best.best_b_id, best.best_score
       |FROM a
       |LEFT JOIN best ON best.a_id = a.id
       |LEFT JOIN poss ON poss.a_id = a.id
       |ORDER BY a_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "record_linkage" -> (recordLinkage _),
    "linkage_golden" -> (linkageGolden _))

  val oracles: Map[String, String] = Map(
    "record_linkage" -> recordLinkageSql,
    "linkage_golden" -> linkageGoldenSql)
}
