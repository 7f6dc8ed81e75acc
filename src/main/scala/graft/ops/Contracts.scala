package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Shared operator input contracts — the reject-loudly guards every id-
  * keyed op applies, in ONE place so a future widening (say, accepting
  * DecimalType(38,0) ids) changes every operator family at once.
  */
object Contracts {

  /** Ops that key rows by a LONG id reject non-integral id columns up
    * front: a silent `cast("long")` of a string/decimal id would null
    * it, dropping pairs or collapsing every such row onto one key with
    * no error (dense-rank or monotonically_increasing_id string ids
    * upstream; avoid raw 64-bit hashes where ids are later composed
    * arithmetically — doc_id·2³² + chunk needs doc_id < 2³¹).
    */
  def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit = {
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$op: id column '$idCol' must be an integral type " +
        s"(byte/short/int/long), got ${dt.simpleString} — cast-to-null " +
        "would silently drop rows or collapse keys; map ids to longs " +
        "explicitly first")
  }
}
