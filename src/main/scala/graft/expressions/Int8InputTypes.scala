package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType}

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
