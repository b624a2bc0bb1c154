package graft

class GraftExtensionsSpec extends SparkSpec {

  test("custom expressions are callable from SQL") {
    val cos = spark.sql(
      "SELECT quantized_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-9)

    val sh = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS s").collect()(0).getSeq[String](0)
    assert(sh.toSet === Set("a b c", "b c d"))

    val sig = spark.sql(
      "SELECT minhash_signature(word_shingles('a b c d e', 2), 16) AS m")
      .collect()(0).getSeq[Long](0)
    assert(sig.length === 16)

    val fp = spark.sql("SELECT simhash64(split('x y z', ' ')) AS f")
      .collect()(0).getLong(0)
    val fp2 = spark.sql("SELECT simhash64(split('x y z', ' ')) AS f")
      .collect()(0).getLong(0)
    assert(fp === fp2)

    val buckets = spark.sql(
      "SELECT lsh_sign_buckets(array(1.0d, -1.0d), 4, 8, 2) AS b")
      .collect()(0).getSeq[Long](0)
    assert(buckets.length === 4)

    // the 2-D/3-D/4-D curve family from SQL — each agrees with its
    // Column-API expression at a spot point
    val h2 = spark.sql("SELECT hilbert_index(3L, 5L, 4) AS h")
      .collect()(0).getLong(0)
    val h3 = spark.sql("SELECT hilbert_index3(3L, 5L, 6L, 4) AS h")
      .collect()(0).getLong(0)
    val h4 = spark.sql("SELECT hilbert_index4(3L, 5L, 6L, 7L, 4) AS h")
      .collect()(0).getLong(0)
    import org.apache.spark.sql.functions._
    val api = spark.range(1)
      .select(graft.functions.spatial.hilbert_index(lit(3L), lit(5L), 4),
        graft.functions.spatial.hilbert_index3(lit(3L), lit(5L), lit(6L), 4),
        graft.functions.spatial
          .hilbert_index4(lit(3L), lit(5L), lit(6L), lit(7L), 4))
      .collect()(0)
    assert((h2, h3, h4) === ((api.getLong(0), api.getLong(1), api.getLong(2))))

    // the C101 suffix kernel from SQL — banana: suffixes at 1 ("anana")
    // and 3 ("ana") share "ana"
    val lcp = spark.sql(
      "SELECT common_prefix_length_at('banana', 1L, 3L) AS l")
      .collect()(0).getLong(0)
    assert(lcp === 3L)
    // plain INT literals coerce via ImplicitCastInputTypes (r11 ADVICE:
    // this used to fail analysis demanding BIGINT positions)
    val lcpInt = spark.sql(
      "SELECT common_prefix_length_at('banana', 1, 3) AS l")
      .collect()(0).getLong(0)
    assert(lcpInt === 3L)
  }

  test("BandedLevenshteinRewrite: the unbanded filter plans as the " +
      "banded kernel + length guard, with unchanged semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a parquet-backed view: a LocalRelation would be constant-folded by
    // the optimizer and leave no Filter to rewrite (or inspect)
    val tmp = java.nio.file.Files.createTempDirectory("graft_lev").toString
    Seq(
      ("kitten", "sitting"),   // d = 3: kept at k = 3, dropped at k = 2
      ("abc", "abc"),          // d = 0
      ("abc", "abxc"),         // d = 1
      ("short", "muchlongertext"), // length gap 9 > k: guard kills it
      (null.asInstanceOf[String], "x")) // NULL: dropped in both spellings
      .toDF("a", "b").write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).createOrReplaceTempView("lev_pairs")

    val q = "SELECT a, b FROM lev_pairs WHERE levenshtein(a, b) <= 3"
    val df = spark.sql(q)
    val opt = df.queryExecution.optimizedPlan.toString
    // the rewrite fired: banded kernel (threshold arg) + the length guard
    assert(opt.contains("levenshtein(a#") &&
        opt.contains("Some(3)) >= 0"),
      s"banded kernel missing from:\n$opt")
    assert(opt.contains("abs((length(a#") || opt.contains("abs((length("),
      s"length guard missing from:\n$opt")
    // semantics: equals the brute-force unbanded reference
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("kitten", "sitting"), ("abc", "abc"),
      ("abc", "abxc")))
    // boundary: d == k kept above; d > k dropped
    val k2 = spark.sql(
      "SELECT a FROM lev_pairs WHERE levenshtein(a, b) <= 2").collect()
    assert(k2.map(_.getString(0)).toSet === Set("abc", "abc"))
    // mirrored spelling rewrites too
    val mir = spark.sql(
      "SELECT a FROM lev_pairs WHERE 3 >= levenshtein(a, b)")
    assert(mir.queryExecution.optimizedPlan.toString
      .contains("Some(3)) >= 0"))
    assert(mir.collect().length === 3)
    // idempotence: the banded form no longer matches the pattern — the
    // already-banded user spelling is left alone (no double guard)
    val banded = spark.sql(
      "SELECT a FROM lev_pairs WHERE levenshtein(a, b, 3) >= 0")
    val bp = banded.queryExecution.optimizedPlan.toString
    assert(!bp.contains("abs((length"), s"double rewrite in:\n$bp")
    assert(banded.collect().length === 3)
  }

  test("BandedLevenshteinRewrite widened spellings: strict </>, =, " +
      "distance-large, and BETWEEN all band (r11 next-round #6)") {
    // the lev_pairs view from the previous test is parquet-backed; the
    // distances there: kitten/sitting=3, abc/abc=0, abc/abxc=1,
    // short/muchlongertext=12 (gap 9), (null,x)=NULL
    def optPlan(q: String) = spark.sql(q).queryExecution.optimizedPlan.toString
    def rows(q: String) = spark.sql(q).collect().length

    // strict <: lev < 3 bands at 2 (boundary d=3 dropped)
    val lt = "SELECT a FROM lev_pairs WHERE levenshtein(a, b) < 3"
    assert(optPlan(lt).contains("Some(2)) >= 0"), optPlan(lt))
    assert(rows(lt) === 2)
    // mirrored strict >: 3 > lev, same band
    val gtm = "SELECT a FROM lev_pairs WHERE 3 > levenshtein(a, b)"
    assert(optPlan(gtm).contains("Some(2)) >= 0"))
    assert(rows(gtm) === 2)
    // lev < 0 is constant-false; the k >= 1 scope leaves it alone
    assert(rows("SELECT a FROM lev_pairs WHERE levenshtein(a, b) < 0") === 0)

    // equality: lev = 3 bands at 3 and demands the exact distance
    val eq = "SELECT a FROM lev_pairs WHERE levenshtein(a, b) = 3"
    assert(optPlan(eq).contains("Some(3)) = 3"), optPlan(eq))
    assert(rows(eq) === 1)
    assert(rows("SELECT a FROM lev_pairs WHERE 1 = levenshtein(a, b)") === 1)
    assert(rows("SELECT a FROM lev_pairs WHERE levenshtein(a, b) = 0") === 1)

    // distance-large: lev > 2 probes the band's -1 (far-pair short
    // circuit on the length gap); NULL row stays dropped
    val gt = "SELECT a FROM lev_pairs WHERE levenshtein(a, b) > 2"
    assert(optPlan(gt).contains("Some(2)) < 0"), optPlan(gt))
    assert(rows(gt) === 2) // kitten/sitting (3) + short/muchlongertext (12)
    val ge = "SELECT a FROM lev_pairs WHERE levenshtein(a, b) >= 3"
    assert(optPlan(ge).contains("Some(2)) < 0"))
    assert(rows(ge) === 2)
    assert(rows("SELECT a FROM lev_pairs WHERE 2 < levenshtein(a, b)") === 2)

    // BETWEEN desugars to the two conjuncts — BOTH now band
    val bt = "SELECT a FROM lev_pairs WHERE levenshtein(a, b) BETWEEN 1 AND 3"
    val btPlan = optPlan(bt)
    assert(btPlan.contains("Some(3)) >= 0") && btPlan.contains("Some(0)) < 0"),
      btPlan)
    // no unbanded (two-arg) levenshtein survives anywhere in the plan
    assert(!"levenshtein\\([^()]*\\)".r.findAllIn(btPlan)
      .exists(c => !c.contains("Some")), btPlan)
    assert(rows(bt) === 2) // d=3 (kitten) and d=1 (abxc); d=0 and gap-9 out
  }

  test("custom aggregates are callable from SQL") {
    val tk = spark.sql(
      """SELECT top_k_by_score(s, id, 2) AS t FROM
        |VALUES (1.0d, 1L), (3.0d, 2L), (2.0d, 3L) AS v(s, id)""".stripMargin)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(tk.map(_.getLong(0)) === Seq(2L, 3L))

    val hh = spark.sql(
      """SELECT heavy_hitters(w, 4) AS h FROM
        |VALUES ('a'), ('a'), ('b') AS v(w)""".stripMargin)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(hh.map(r => (r.getString(0), r.getLong(1))) === Seq(("a", 2L), ("b", 1L)))
  }
}
