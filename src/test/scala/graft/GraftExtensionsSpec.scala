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
  }
}
