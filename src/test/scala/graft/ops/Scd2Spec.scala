package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpecBase {
  import spark.implicits._

  private val t0 = "1995-01-01"
  private val t1 = "2000-06-15"

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  private def current = Seq(
    // closed historical version + its open successor
    (1L, "alice", "GOLD", Some(ts(t0)), Some(ts("1999-01-01"))),
    (1L, "alice", "PLAT", Some(ts("1999-01-01")), None),
    (2L, "bob", "SILV", Some(ts(t0)), None),
    (3L, "carol", "GOLD", Some(ts(t0)), None),
    (4L, null, "NONE", Some(ts(t0)), None) // null attribute
  ).toDF("id", "name", "tier", "valid_from", "valid_to")

  private def incoming = Seq(
    (1L, "alice", "DIAM"),  // changed -> version
    (2L, "bob", "SILV"),    // identical -> no version
    (4L, null, "NONE"),     // identical incl. null attr -> no version
    (9L, "zoe", "NEW")      // brand-new key
  ).toDF("id", "name", "tier")

  private def merged = Scd2.merge(current, incoming, "id",
    Seq("name", "tier"), lit(t1).cast("timestamp"))

  test("changed key: old version closes, new opens; history untouched") {
    val r1 = merged.where(col("id") === 1)
      .select("tier", "valid_from", "valid_to")
      .as[(String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().sortBy(_._2.getTime)
    assert(r1.map(_._1).toSeq == Seq("GOLD", "PLAT", "DIAM"))
    assert(r1(0)._3.contains(ts("1999-01-01"))) // historical close kept
    assert(r1(1)._3.contains(ts(t1)))           // open row closed at t1
    assert(r1(2)._3.isEmpty)                    // new version open
    assert(r1(2)._2 == ts(t1))
  }

  test("identical incoming rows do not version (incl. null attributes)") {
    for (id <- Seq(2L, 4L)) {
      val rows = merged.where(col("id") === id).collect()
      assert(rows.length == 1, s"id=$id versioned spuriously")
      assert(rows.head.getAs[java.sql.Timestamp]("valid_to") == null)
    }
  }

  test("new key opens at asOf; absent key stays open") {
    val z = merged.where(col("id") === 9).collect()
    assert(z.length == 1 && z.head.getAs[java.sql.Timestamp]("valid_from") == ts(t1))
    val c = merged.where(col("id") === 3).collect()
    assert(c.length == 1 && c.head.getAs[java.sql.Timestamp]("valid_to") == null)
  }

  test("exactly one open row per key after merge") {
    val opens = merged.where(col("valid_to").isNull)
      .groupBy("id").count().where(col("count") > 1).count()
    assert(opens == 0)
  }
}
