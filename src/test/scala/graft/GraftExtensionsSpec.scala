package graft

/** The extensions must make the native expressions SQL-addressable —
  * tested via runtime registration on the shared session (the
  * `.withExtensions` path shares the same builder list, asserted
  * directly against a fresh SparkSessionExtensions instance).
  */
class GraftExtensionsSpec extends SparkSpecBase {

  test("runtime-registered functions callable from SQL — all five") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT
        |  simhash64('the quick brown fox') AS sh,
        |  minhash_signature('a b c d e', 2, 4) AS mh,
        |  decimal_scaled_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                     array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS dot,
        |  word_shingles('a b c d', 3) AS ws,
        |  gram_hash_range('abcdefgh', 4) AS ghr
        |""".stripMargin).collect()(0)
    assert(rows.getLong(0) != 0L)
    assert(rows.getSeq[Long](1).length == 4)
    assert(rows.getDouble(2) == 4.0) // 1.5*2.0 + 2.0*0.5
    assert(rows.getSeq[String](3) == Seq("a b c", "b c d"))
    val ghr = rows.getSeq[Long](4)
    assert(ghr.length == 2 && ghr(0) <= ghr(1))
  }

  test("SQL results equal the Column-API results for every native expression") {
    import spark.implicits._
    import graft.functions._
    GraftExtensions.register(spark)
    val df = Seq("spark native expression parity check").toDF("t")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT simhash64(t), minhash_signature(t, 2, 4),
        |  word_shingles(t, 2), gram_hash_range(t, 4)
        |FROM ext_docs""".stripMargin).collect()(0)
    val viaCol = df.select(
      simhash64Native($"t"), minhashNative($"t", 2, 4),
      wordShinglesNative($"t", 2), gramHashRangeNative($"t", 4)).collect()(0)
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getSeq[Long](1) == viaCol.getSeq[Long](1))
    assert(viaSql.getSeq[String](2) == viaCol.getSeq[String](2))
    assert(viaSql.getSeq[Long](3) == viaCol.getSeq[Long](3))
  }

  test("scalar args must be integer literals — clear plan-time error, not an NPE") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq("n" -> 1L).toDF("t", "n").createOrReplaceTempView("ext_bad")
    // non-foldable column argument
    val e1 = intercept[Exception] {
      spark.sql("SELECT word_shingles(t, n) FROM ext_bad").collect()
    }
    assert(e1.getMessage.contains("integer literal"), e1.getMessage)
    // NULL literal
    val e2 = intercept[Exception] {
      spark.sql("SELECT gram_hash_range('abc', NULL)").collect()
    }
    assert(e2.getMessage.contains("integer literal"), e2.getMessage)
    // string literal
    val e3 = intercept[Exception] {
      spark.sql("SELECT minhash_signature('a b c', '2', 4)").collect()
    }
    assert(e3.getMessage.contains("integer literal"), e3.getMessage)
  }

  test("random_projection callable from SQL and equal to the Column API") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      """SELECT random_projection(
        |  array(CAST(0.25 AS FLOAT), CAST(-0.5 AS FLOAT), CAST(1.0 AS FLOAT)),
        |  4) AS p""".stripMargin).collect()(0).getSeq[Long](0)
    val viaCol = spark.range(1).select(
      graft.functions.randomProjectionNative(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit(0.25f),
          org.apache.spark.sql.functions.lit(-0.5f),
          org.apache.spark.sql.functions.lit(1.0f)), 4).as("p"))
      .collect()(0).getSeq[Long](0)
    assert(viaSql == viaCol && viaSql.length == 4)
  }

  test("random_projection casts double-literal arrays instead of misreading them") {
    GraftExtensions.register(spark)
    // The natural SQL spelling: fractional literals analyze as
    // array<double>. Without the ImplicitCastInputTypes declaration,
    // getFloat would read 4-byte halves of each double — silently
    // wrong projections. With it, this must equal the float-array arm.
    val viaDouble = spark.sql(
      "SELECT random_projection(array(0.25, -0.5, 1.0), 4) AS p")
      .collect()(0).getSeq[Long](0)
    val viaFloat = spark.sql(
      """SELECT random_projection(
        |  array(CAST(0.25 AS FLOAT), CAST(-0.5 AS FLOAT), CAST(1.0 AS FLOAT)),
        |  4) AS p""".stripMargin).collect()(0).getSeq[Long](0)
    assert(viaDouble == viaFloat, s"$viaDouble != $viaFloat")
  }

  test("decimal_scaled_dot casts double-literal arrays instead of misreading them") {
    GraftExtensions.register(spark)
    val viaDouble = spark.sql(
      "SELECT decimal_scaled_dot(array(0.25, -0.5), array(2.0, 4.0)) AS d")
      .collect()(0).getDouble(0)
    assert(viaDouble == 0.25 * 2.0 + (-0.5) * 4.0, s"got $viaDouble")
  }

  test("fold_hash callable from SQL, codepoint-exact beyond the BMP") {
    GraftExtensions.register(spark)
    // expected values computed by an independent JVM codepoint walk
    def expected(s: String): Long = {
      var acc = 0L
      s.codePoints().toArray.foreach(cp => acc = (acc * 31L + cp) % 1000000007L)
      acc
    }
    for (s <- Seq("a b c", "héllo wörld", "日本語テキスト", "clef 𝄞 here", "")) {
      val got = spark.sql(s"SELECT fold_hash('${s}') AS h").collect()(0).getLong(0)
      assert(got == expected(s), s"'$s': $got != ${expected(s)}")
    }
  }

  test("fold_hash byte-walk fast path ≡ String walk, incl. malformed UTF-8") {
    import org.apache.spark.unsafe.types.UTF8String
    // valid strings across planes: fast path must equal the String walk
    for (s <- Seq("", "plain ascii", "héllo wörld", "日本語テキスト",
        "clef 𝄞 here", "mixed 𝄞 ascii ü 語")) {
      val u = UTF8String.fromString(s)
      assert(graft.expressions.FoldHashImpl.compute(u) ==
        graft.expressions.FoldHashImpl.computeSlow(u), s"'$s'")
    }
    // malformed byte sequences: fast path must defer to the String
    // walk's replacement-char semantics, bit-exactly
    val malformed = Seq(
      Array(0xFF.toByte),                          // invalid lead
      Array(0xC3.toByte),                          // truncated 2-byte
      Array(0xC0.toByte, 0x80.toByte),             // overlong NUL
      Array(0xED.toByte, 0xA0.toByte, 0x80.toByte), // surrogate D800
      Array('a'.toByte, 0xE2.toByte, 0x28.toByte, 0xA1.toByte, 'b'.toByte))
    for (bytes <- malformed) {
      val u = UTF8String.fromBytes(bytes)
      assert(graft.expressions.FoldHashImpl.compute(u) ==
        graft.expressions.FoldHashImpl.computeSlow(u),
        bytes.map(b => f"${b & 0xFF}%02X").mkString(" "))
    }
  }

  test("token_buckets: SQL ≡ Column API ≡ independent codepoint recompute; " +
      "bigram fold equals hashing the concatenated string") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // independent recompute: tokenize on \s+, fold codepoints mod B
    def fold(s: String, acc0: Long, b: Long): Long = {
      var acc = acc0
      s.codePoints().toArray.foreach(cp => acc = (acc * 31L + cp) % b)
      acc
    }
    def expected(text: String, b: Long, bigrams: Boolean): Seq[Long] = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val uni = toks.map(fold(_, 0L, b))
      if (bigrams && toks.length >= 2)
        uni ++ toks.sliding(2).map(p => fold(p(1), (fold(p(0), 0L, b) * 31L + 32L) % b, b)).toSeq
      else uni
    }
    val cases = Seq("the quick brown fox", "one", "", "  spaced   out\ttabs ",
      "héllo wörld über", "日本語 テキスト 語", "clef 𝄞 mixed ascii")
    for (t <- cases; bg <- Seq(true, false)) {
      val viaCol = Seq(t).toDF("t")
        .select(graft.functions.tokenBucketsNative(org.apache.spark.sql.functions.col("t"), 1024, bg))
        .collect()(0).getSeq[Long](0).toSeq
      assert(viaCol == expected(t, 1024L, bg), s"column arm: '$t' bigrams=$bg")
      val lit = t.replace("\t", "\\t")
      val viaSql = spark.sql(s"SELECT token_buckets('$lit', 1024, $bg) AS b")
        .collect()(0).getSeq[Long](0).toSeq
      assert(viaSql == expected(t, 1024L, bg), s"SQL arm: '$t' bigrams=$bg")
    }
    // bigram continuation-fold ≡ fold of the materialized "a b" string
    assert(fold("a b", 0L, 1024L) ==
      fold("b", (fold("a", 0L, 1024L) * 31L + 32L) % 1024L, 1024L))
    // null text → null array (scorer nulls propagate, rows survive)
    val nullRow = Seq[(Integer, String)]((1, null)).toDF("i", "t")
      .select(graft.functions.tokenBucketsNative(org.apache.spark.sql.functions.col("t"), 64, true).as("b"))
      .collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("the session-build extensions class injects the same function set") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext) // must not throw; builder list is shared
    assert(GraftExtensions.all.map(_._1.funcName).sorted ==
      Seq("decimal_scaled_dot", "fold_hash", "gram_hash_range", "int8_dot",
        "lsh_buckets", "minhash_signature", "random_projection", "simhash64",
        "subseq_starts", "token_buckets", "word_shingles"))
  }
}
