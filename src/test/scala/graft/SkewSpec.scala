package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted-join / salted-aggregation equivalence: same results as the
  * plain operations on a deliberately skewed dataset (90% of rows on
  * one key).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    // hot key 1 gets 900 rows, keys 2..11 get 10 each
    val rows = (1 to 900).map(i => (i.toLong, 1L)) ++
      (1 to 100).map(i => (900L + i, 2L + (i % 10)))
    rows.toDF("row_id", "key").repartition(8)
  }

  private lazy val dim = (1L to 11L).map(k => (k, s"name_$k")).toDF("k", "k_name")

  test("salted join equals the plain join on a 90%-skewed key") {
    val plain = skewed.join(dim, col("key") === col("k"))
      .select("row_id", "k_name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "key", "k", "row_id", saltFactor = 8)
      .select("row_id", "k_name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain && plain.size == 1000)
  }

  test("salt is deterministic and spreads the hot key over the salt space") {
    val salts = skewed.filter(col("key") === 1L)
      .select(Skew.salt(col("row_id"), 8).as("s"))
      .groupBy("s").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salts.keySet == (0L to 7L).toSet, s"hot key not spread: $salts")
    assert(salts.values.max < 900L, "one salt bucket still holds everything")
    val again = skewed.filter(col("key") === 1L)
      .select(Skew.salt(col("row_id"), 8).as("s"))
      .groupBy("s").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salts == again)
  }

  test("salted two-phase count equals groupBy count") {
    val plain = skewed.groupBy("key").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, "key", "row_id", saltFactor = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain(1L) == 900L)
  }

  test("snapshot diff: added/removed/changed/unchanged with null-safe value compare") {
    import graft.operators.SnapshotDiff
    val v1 = Seq((1L, Some(10.0), "a"), (2L, Some(20.0), "b"),
      (3L, None: Option[Double], "c"), (4L, Some(40.0), "d"))
      .toDF("k", "v", "tag")
    val v2 = Seq((1L, Some(10.0), "a"),   // unchanged
      (2L, Some(21.0), "b"),              // changed (value)
      (3L, Some(30.0), "c"),              // changed (NULL → value, needs <=>)
      (5L, Some(50.0), "e"))              // added; 4 removed
      .toDF("k", "v", "tag")
    val out = SnapshotDiff.diff(v1, v2, Seq("k"), Seq("v", "tag"))
      .select("k", "change_type")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"), out.toString)
  }
}
