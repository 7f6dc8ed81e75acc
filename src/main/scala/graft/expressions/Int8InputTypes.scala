package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DoubleType, FloatType, StringType}

/** Input-type declaration for [[graft.expressions.Int8Dot]], hosted in
  * the spark.sql package because `AbstractDataType` is `private[sql]`
  * (same bridge technique as [[GraftSqlBridge]]): both operands are
  * array<tinyint>, with implicit ANSI casts — so the natural SQL
  * spelling `int8_dot(array(1,2,3), ...)` (int literals) analyzes to
  * tinyint arrays instead of getByte misreading packed int elements.
  */
trait Int8ArrayInputTypes extends ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))
}

/** Unary array<float> input declaration for
  * [[graft.expressions.RandomProjection]]: the natural SQL spelling
  * `random_projection(array(0.1, 0.2), 4)` analyzes with
  * array<double> (SQL's default fractional literal type); without
  * this cast `getFloat` would read 4-byte halves of each double —
  * silently wrong projections. With it, any numeric element type is
  * ANSI-cast to float first, matching the declarative arm's
  * cast-to-double-of-float semantics.
  */
trait FloatArrayInputTypes extends ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType))
}

/** Binary variant of [[FloatArrayInputTypes]] for
  * [[graft.expressions.DecimalScaledDot]] — same double-literal
  * misread hazard, two operands.
  */
trait FloatArrayBinaryInputTypes extends ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
}

/** Unary string input declaration for [[graft.expressions.FoldHash]]:
  * non-string arguments (numbers, dates) are ANSI-cast to string
  * rather than misread.
  */
trait StringInputType extends ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
}

/** Binary array<string> input declaration for
  * [[graft.expressions.SubseqStarts]].
  */
trait StringArrayBinaryInputTypes extends ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
}

/** Unary array<double> input declaration for
  * [[graft.expressions.NearestCentroid]]/[[graft.expressions.NearestCells]]:
  * float embedding columns are ANSI-cast to array<double> (exact) so
  * `getDouble` never misreads, mirroring the declarative arm's
  * per-element `cast("double")`.
  */
trait DoubleArrayInputTypes extends ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))
}

/** Unary array<string> input declaration for
  * [[graft.expressions.TermFreqs]].
  */
trait StringArrayInputType extends ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
}

/** (double, long) input declaration for
  * [[graft.expressions.TopKAgg]]: the ranking value ANSI-casts to
  * double and the key to long — the same coercions the legacy udaf's
  * `Entry(value: Double, key: Long)` encoder applied, so integral id
  * columns of any width keep working unchanged.
  */
trait DoubleLongInputTypes extends ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, org.apache.spark.sql.types.LongType)
}

/** (LUT array<float>, codes array<tinyint>) input declaration for
  * [[graft.expressions.PqLutScore]].
  */
trait PqLutScoreInputTypes extends ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(ByteType))
}

/** (vector, packed centroid matrix) input declaration for
  * [[graft.expressions.NearestPackedCells]]: the vector ANSI-casts to
  * array<double> and the packed matrix to array<array<double>>, the
  * same misread guard as [[DoubleArrayInputTypes]] for both operands.
  */
trait PackedCentroidInputTypes extends ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
}
