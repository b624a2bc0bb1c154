package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B93 `attribution_shapley`: hand-computed coalition values and Shapley
  * credits on a seeded touch lattice, the null-player and efficiency
  * axioms, and the strict pre-conversion cut. */
class AttributionShapleySpec extends SparkSpec {

  private def ev(rows: Seq[(Long, Int, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "t", "event_type")
      .select(col("user_id"),
        timestamp_seconds(lit(1704067200L) + col("t") * 3600).as("ts"),
        col("event_type"))
  }

  test("hand lattice: v(S) and the exact 3-channel Shapley credits") {
    // converted users' pre-purchase touch sets (view, click, signup):
    // u1 (1,1,0)  u2 (0,0,0)  u3 (0,1,0) - its view posts AFTER purchase
    // u4 (0,0,1)  u5 (1,1,1)  u6 (0,0,0) - its click ties purchase ts
    // u7 never converts: excluded entirely
    val rows = Seq(
      (1L, 1, "view"), (1L, 2, "click"), (1L, 3, "purchase"),
      (2L, 1, "purchase"),
      (3L, 1, "click"), (3L, 2, "purchase"), (3L, 3, "view"),
      (4L, 1, "signup"), (4L, 2, "purchase"),
      (5L, 1, "view"), (5L, 2, "click"), (5L, 3, "signup"),
      (5L, 4, "purchase"),
      (6L, 2, "click"), (6L, 2, "purchase"),
      (7L, 1, "view"), (7L, 2, "click"))
    val got = OlapD.attributionShapleyOn(ev(rows), "user_id", "ts",
        "event_type", "purchase").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // v000=2 v100=2 v010=3 v001=3 v110=4 v101=3 v011=4 v111=6 ->
    // 6·φ = view 5, click 11, signup 8; Σφ = 4 = v(C) − v(∅)
    assert(got === Map(
      "view" -> ((5L, 6L, 5.0 / 6.0)),
      "click" -> ((11L, 6L, 11.0 / 6.0)),
      "signup" -> ((8L, 6L, 8.0 / 6.0))))
  }

  test("null player: a channel never touched pre-conversion gets zero " +
      "credit; the remaining two split the touched conversions") {
    val rows = Seq(
      (1L, 1, "view"), (1L, 2, "purchase"),
      (2L, 1, "click"), (2L, 2, "purchase"),
      (3L, 1, "purchase"), (3L, 2, "signup")) // signup post-conversion
    val got = OlapD.attributionShapleyOn(ev(rows), "user_id", "ts",
        "event_type", "purchase").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("signup") === 0L)
    // symmetric single-carrier channels: equal credit, Σφ·6 = 6·(3−1)
    assert(got("view") === got("click") && got("view") === 6L)
  }

  /** Independent oracle for the generalized lattice: Shapley by its
    * PERMUTATION definition — φ_c·m! = Σ over all m! channel orderings
    * of the marginal v(prefix ∪ c) − v(prefix) — a different formulation
    * from the production subset-weight sweep, over the same v. */
  private def permutationShapley(sigs: Seq[Vector[Int]],
      m: Int): Map[Int, Long] = {
    def v(s: Vector[Int]): Long =
      sigs.count(sig => sig.zip(s).forall { case (a, b) => a <= b }).toLong
    val acc = scala.collection.mutable.Map.empty[Int, Long]
      .withDefaultValue(0L)
    (0 until m).permutations.foreach { perm =>
      var prefix = Vector.fill(m)(0)
      perm.foreach { c =>
        val next = prefix.updated(c, 1)
        acc(c) += v(next) - v(prefix)
        prefix = next
      }
    }
    acc.toMap
  }

  private def checkLattice(m: Int, sigs: Seq[Vector[Int]]): Unit = {
    import spark.implicits._
    val chans = (0 until m).map(i => s"ch$i")
    val flags = sigs.zipWithIndex
      .map { case (s, u) => (u.toLong, s) }
      .toDF("_u", "_s")
      .select(col("_u") +:
        (0 until m).map(i => element_at(col("_s"), i + 1).as(s"f$i")): _*)
    val got = OlapD.shapleyTailOn(flags, chans).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exp = permutationShapley(sigs, m)
    val mFact = (1 to m).map(_.toLong).product
    chans.zipWithIndex.foreach { case (ch, ci) =>
      assert(got(ch) === ((exp(ci), mFact)),
        s"m=$m channel $ch: got ${got(ch)}, permutation oracle " +
          s"${(exp(ci), mFact)}")
    }
    // efficiency axiom: Σφ·m! = m!·(v(C) − v(∅))
    val vFull = sigs.size.toLong
    val vEmpty = sigs.count(_.forall(_ == 0)).toLong
    assert(got.values.map(_._1).sum === mFact * (vFull - vEmpty))
  }

  test("m=4 lattice: subset-weight sweep equals the permutation " +
      "definition on a hand corpus (r12 VERDICT #2 generalization)") {
    checkLattice(4, Seq(
      Vector(1, 1, 0, 0), Vector(0, 0, 0, 0), Vector(0, 1, 0, 1),
      Vector(1, 0, 1, 0), Vector(1, 1, 1, 1), Vector(0, 0, 0, 1),
      Vector(0, 0, 1, 1), Vector(1, 0, 0, 0), Vector(1, 0, 0, 0)))
  }

  test("m=5 lattice: subset-weight sweep equals the permutation " +
      "definition, including a null player") {
    // ch4 never appears pre-conversion -> null player, exact zero
    val sigs = Seq(
      Vector(1, 1, 0, 0, 0), Vector(0, 0, 0, 0, 0), Vector(0, 1, 1, 0, 0),
      Vector(1, 0, 1, 1, 0), Vector(1, 1, 1, 1, 0), Vector(0, 0, 1, 0, 0),
      Vector(0, 1, 0, 1, 0))
    checkLattice(5, sigs)
    import spark.implicits._
    val flags = sigs.zipWithIndex.map { case (s, u) => (u.toLong, s) }
      .toDF("_u", "_s")
      .select(col("_u") +:
        (0 until 5).map(i => element_at(col("_s"), i + 1).as(s"f$i")): _*)
    val got = OlapD.shapleyTailOn(flags, (0 until 5).map(i => s"ch$i"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("ch4") === 0L)
  }

  test("m=4 end-to-end: attributionShapleyOn builds the generalized " +
      "flag rollup from raw events") {
    val chans = Seq("view", "click", "signup", "email")
    val rows = Seq(
      (1L, 1, "view"), (1L, 2, "email"), (1L, 3, "purchase"),
      (2L, 1, "purchase"),
      (3L, 1, "click"), (3L, 2, "signup"), (3L, 3, "purchase"),
      (4L, 1, "email"), (4L, 2, "purchase"), (4L, 3, "view"))
    val got = OlapD.attributionShapleyOn(ev(rows), "user_id", "ts",
        "event_type", "purchase", chans).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val sigs = Seq( // per converted user, flags in chans order
      Vector(1, 0, 0, 1), Vector(0, 0, 0, 0), Vector(0, 1, 1, 0),
      Vector(0, 0, 0, 1))
    val exp = permutationShapley(sigs, 4)
    chans.zipWithIndex.foreach { case (ch, ci) =>
      assert(got(ch) === ((exp(ci), 24L)), s"channel $ch")
    }
  }

  test("real corpus: efficiency axiom and den — Σ phi_num = 6·(converted " +
      "users with >= 1 pre-conversion touch)") {
    val out = OlapD.attributionShapley(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("click", "signup", "view"))
    assert(out.forall(_.getLong(2) === 6L))
    val sumNum = out.map(_.getLong(1)).sum
    // independent re-derivation of v(C) − v(∅)
    val e = graft.sources.Tables(spark, sfDir).events
    val fp = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts")).as("fpts"))
    val touched = fp.join(
        e.filter(col("event_type").isin(OlapD.ShapleyChannels: _*))
          .select(col("user_id"), col("ts")),
        Seq("user_id"))
      .filter(col("ts") < col("fpts"))
      .select(col("user_id")).distinct().count()
    assert(sumNum === 6L * touched, s"Σφ·6=$sumNum vs 6·touched=${6 * touched}")
  }
}
