package graft.expressions

import graft.SparkSpecBase
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** The product-quantization kernels pinned against declarative
  * oracles — encode (per-subspace argmin L2, ties lowest), the
  * per-query dot LUT, and the LUT×codes score; plus the corrupt/null
  * quarantine arms. The codebook layout contract ([m][k][subDim]
  * flattened) is exercised by construction.
  */
class PqSpec extends SparkSpecBase {
  import spark.implicits._

  private def cb(m: Int, ks: Int, subDim: Int, seed: Long): PqCodebook = {
    val rnd = new scala.util.Random(seed)
    new PqCodebook(m, ks, subDim,
      Array.fill(m * ks * subDim)(rnd.nextGaussian()))
  }

  private def cbSeq(c: PqCodebook): Seq[Seq[Seq[Double]]] =
    (0 until c.m).map(mi => (0 until c.ks).map(k =>
      (0 until c.subDim).map(j =>
        c.data(mi * c.ks * c.subDim + k * c.subDim + j))))

  private def col3(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Column = GraftSqlBridge.column(e)

  /** Declarative encode: per subspace, argmin Σ(a−b)² with the same
    * left-fold arithmetic, ties to the lowest id via (d2, idx) sort.
    */
  private def encodeDeclarative(vec: Column, c: PqCodebook): Column = {
    val s = cbSeq(c)
    array((0 until c.m).map { mi =>
      val cents = typedLit(s(mi))
      val sub = slice(vec, mi * c.subDim + 1, c.subDim)
      element_at(array_sort(transform(
        sequence(lit(0), lit(c.ks - 1)), k =>
          struct(aggregate(zip_with(sub, element_at(cents, k + 1),
            (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
            lit(0.0), (acc, v) => acc + v).as("d2"),
            k.as("idx")))), 1).getField("idx").cast("int")
    }: _*)
  }

  test("encode ≡ declarative per-subspace argmin-L2, random vectors") {
    val c = cb(m = 4, ks = 7, subDim = 3, seed = 1L)
    val rnd = new scala.util.Random(2L)
    val df = (0 until 300).map(i =>
      (i.toLong, Array.fill(12)(rnd.nextGaussian()))).toDF("id", "vec")
    val both = df.select(
      transform(col3(PqEncode(GraftSqlBridge.expression(col("vec")), c)),
        b => b.cast("int") + when(b < 0, 256).otherwise(0)).as("native"),
      encodeDeclarative(col("vec"), c).as("oracle"))
    val bad = both.where(not(col("native") <=> col("oracle"))).collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("lut values equal the declarative sub-space dots; score equals " +
      "the LUT-gather sum computed independently") {
    val c = cb(m = 4, ks = 5, subDim = 4, seed = 3L)
    val rnd = new scala.util.Random(4L)
    val q = Array.fill(16)(rnd.nextGaussian())
    val x = Array.fill(16)(rnd.nextGaussian())
    val df = Seq((q, x)).toDF("q", "x")
    val row = df.select(
      col3(PqDotLut(GraftSqlBridge.expression(col("q")), c)).as("lut"),
      col3(PqEncode(GraftSqlBridge.expression(col("x")), c)).as("codes"))
      .head()
    val lut = row.getSeq[Float](0)
    val codes = row.getSeq[Byte](1)
    // oracle LUT: per (mi, k) the double left-fold dot cast to float
    for (mi <- 0 until c.m; k <- 0 until c.ks) {
      var s = 0.0
      for (j <- 0 until c.subDim)
        s += q(mi * c.subDim + j) *
          c.data(mi * c.ks * c.subDim + k * c.subDim + j)
      assert(lut(mi * c.ks + k) == s.toFloat, s"lut($mi,$k)")
    }
    // score = Σ lut[mi·ks + code_mi], double accumulation of floats
    val expected = codes.zipWithIndex
      .map { case (b, mi) => lut(mi * c.ks + (b & 0xFF)).toDouble }.sum
    val got = df.select(col3(PqLutScore(
      GraftSqlBridge.expression(
        col3(PqDotLut(GraftSqlBridge.expression(col("q")), c))),
      GraftSqlBridge.expression(
        col3(PqEncode(GraftSqlBridge.expression(col("x")), c))),
      c.ks))).head().getDouble(0)
    assert(got == expected)
  }

  test("corrupt vectors encode to NULL codes (the quarantine); null " +
      "inputs propagate; shape-mismatched scores are null, not wrong") {
    val c = cb(m = 2, ks = 4, subDim = 2, seed = 5L)
    val df = Seq(
      (1L, Array(1.0, Double.NaN, 0.0, 2.0)), // NaN → null codes
      (2L, Array(1.0, 2.0))                   // wrong dim → null codes
    ).toDF("id", "vec")
    val enc = df.select(col("id"),
        col3(PqEncode(GraftSqlBridge.expression(col("vec")), c)).as("e"))
      .orderBy("id").collect()
    assert(enc.forall(_.isNullAt(1)), enc.mkString("; "))
    assert(df.select(col3(PqDotLut(GraftSqlBridge.expression(col("vec")), c)))
      .collect().forall(_.isNullAt(0)))
    // shape mismatch: a 2-code array against a ks=4 LUT of length 8 is
    // consistent, but a WRONG-ks score call (ks=3 ⇒ expected LUT len 6)
    // returns null rather than gathering from wrong offsets
    val good = spark.range(1).select(
      typedLit(Seq(1.0f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)).as("lut"),
      typedLit(Seq(1.toByte, 2.toByte)).as("codes"))
    assert(good.select(col3(PqLutScore(
      GraftSqlBridge.expression(col("lut")),
      GraftSqlBridge.expression(col("codes")), 3))).head().isNullAt(0))
    // out-of-range code (code ≥ ks) → null
    val oob = spark.range(1).select(
      typedLit(Seq(1.0f, 2f, 3f, 4f)).as("lut"),
      typedLit(Seq(1.toByte, 3.toByte)).as("codes"))
    assert(oob.select(col3(PqLutScore(
      GraftSqlBridge.expression(col("lut")),
      GraftSqlBridge.expression(col("codes")), 2))).head().isNullAt(0))
  }
}
