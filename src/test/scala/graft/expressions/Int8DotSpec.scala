package graft.expressions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native int8 dot must equal the declarative HOF formulation it
  * replaces — on every input shape, including negatives, mismatched
  * lengths, empties, and nulls (fixed-seed raw-ScalaCheck sampling,
  * same offline pattern as OpsProperties).
  */
class Int8DotSpec extends SparkSpecBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i =>
      g(Gen.Parameters.default.withSize(20), Seed(seed + i)))

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("int") * y.cast("int")),
      lit(0), (acc, v) => acc + v)

  test("native ≡ HOF on deterministic edge cases; min-length on mismatch") {
    val cases = Seq(
      (Seq[Byte](1, 2, 3), Seq[Byte](4, 5, 6)),          // 4+10+18 = 32
      (Seq[Byte](-128, 127), Seq[Byte](127, -128)),      // extremes
      (Seq[Byte](), Seq[Byte]()),                        // empty → 0
      (Seq[Byte](0, 0), Seq[Byte](0, 0)))
    val df = cases.toDF("a", "b")
    val rows = df.select(
      graft.functions.int8DotNative(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    assert(rows(0).getInt(0) == 32)
    assert(rows(1).getInt(0) == -128 * 127 * 2)
    // INTENTIONAL divergence on mismatched lengths: zip_with null-pads
    // the shorter array, so the HOF sum poisons to NULL; the native
    // kernel walks the shorter length (equal-dim code arrays never hit
    // this in production — min-length is the safer fallback)
    val mm = Seq((Seq[Byte](1, 2, 3), Seq[Byte](7))).toDF("a", "b").select(
      graft.functions.int8DotNative(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()(0)
    assert(mm.getInt(0) == 7)
    assert(mm.isNullAt(1))
  }

  test("native ≡ HOF under randomized byte arrays (fixed seed)") {
    val gen = for {
      n <- Gen.choose(0, 64) // equal lengths: the HOF-equivalence domain
      a <- Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte))
      b <- Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte))
    } yield (a, b)
    val cases = sample(gen, 200, 42L)
    val rows = cases.toDF("a", "b").select(
      graft.functions.int8DotNative(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    assert(rows.length == cases.length)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("null array yields null, and SQL registration works") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT int8_dot(array(CAST(2 AS TINYINT), CAST(3 AS TINYINT)),
        |                array(CAST(5 AS TINYINT), CAST(7 AS TINYINT))) AS d,
        |       int8_dot(CAST(NULL AS ARRAY<TINYINT>),
        |                array(CAST(1 AS TINYINT))) AS n""".stripMargin).collect()(0)
    assert(r.getInt(0) == 31)
    assert(r.isNullAt(1))
  }

  test("plain int array literals implicit-cast to tinyint, not misread") {
    graft.GraftExtensions.register(spark)
    // the natural SQL spelling — array<int> literals — must analyze
    // via implicit ANSI cast to array<tinyint> and compute correctly
    // (an unchecked getByte would read packed int bytes: garbage)
    val r = spark.sql(
      "SELECT int8_dot(array(1, 2, 3), array(4, 5, 6)) AS d").collect()(0)
    assert(r.getInt(0) == 32)
    // out-of-tinyint-range literals fail the ANSI cast loudly
    intercept[Exception] {
      spark.sql("SELECT int8_dot(array(1000), array(1))").collect()
    }
    // wrong arity: clear message, not IndexOutOfBounds
    val e = intercept[Exception] {
      spark.sql("SELECT int8_dot(array(CAST(1 AS TINYINT)))").collect()
    }
    assert(e.getMessage.contains("2 arguments"), e.getMessage)
  }
}
