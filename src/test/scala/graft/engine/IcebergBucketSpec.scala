package graft.engine

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{IcebergBucketExprs, IcebergMurmur3}

import graft.{SparkSpec, Tables}

/** The bucket transform must match the PUBLISHED Iceberg spec, not just be
  * self-consistent: these vectors come from the Iceberg table spec's
  * Appendix B hash-result table, so agreement here is what makes the
  * written layout probe-compatible with a real Iceberg reader. */
class IcebergBucketSpec extends SparkSpec {

  test("murmur3 matches the published Iceberg spec vectors") {
    // int/long 34 (both serialize as 8-byte LE long): 2017239379
    assert(IcebergMurmur3.hashLong(34L) === 2017239379)
    // string "iceberg" (UTF-8 bytes): 1210000089
    assert(IcebergMurmur3.hashBytes("iceberg".getBytes("UTF-8")) === 1210000089)
    // date 2017-11-16 = 17486 days since epoch: -653330422
    assert(IcebergMurmur3.hashLong(17486L) === -653330422)
    // bucket = (hash & Integer.MAX_VALUE) % N
    assert(IcebergMurmur3.bucket(2017239379, 16) === 3)
    assert(IcebergMurmur3.bucket(-653330422, 16) ===
      ((-653330422 & Integer.MAX_VALUE) % 16))
  }

  test("icebergBucket column agrees with the scalar impl on int, long and string") {
    import spark.implicits._
    val df = Seq((34, 34L, "iceberg"), (0, 0L, ""), (-7, -7L, "graft"),
      (Int.MaxValue, Long.MaxValue, "日本語")).toDF("i", "l", "s")
    val got = df.select(
      IcebergBucketExprs.icebergBucket(col("i"), 16).as("bi"),
      IcebergBucketExprs.icebergBucket(col("l"), 16).as("bl"),
      IcebergBucketExprs.icebergBucket(col("s"), 16).as("bs"),
      col("i"), col("l"), col("s")).collect()
    got.foreach { r =>
      assert(r.getInt(0) ===
        IcebergMurmur3.bucket(IcebergMurmur3.hashLong(r.getInt(3).toLong), 16))
      assert(r.getInt(1) ===
        IcebergMurmur3.bucket(IcebergMurmur3.hashLong(r.getLong(4)), 16))
      assert(r.getInt(2) ===
        IcebergMurmur3.bucket(IcebergMurmur3.hashBytes(r.getString(5).getBytes("UTF-8")), 16))
    }
    // int and its widened long land in the SAME bucket (the spec's
    // type-widening promise: int→long evolution never moves rows)
    assert(got.forall(r => r.getInt(0) ===
      IcebergMurmur3.bucket(IcebergMurmur3.hashLong(r.getInt(3).toLong), 16)))
  }

  test("bucket lookup finds rows even when the probe literal's type is narrower than the key") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ibucket").toString
    val events = Tables.events(spark, sf0001)
    Layout.writeBucketTransform(events, "user_id", 8, dir) // user_id: bigint
    // probe with a plain Int — previously computed the wrong xxhash bucket
    // and silently returned zero rows; the reader now casts to the key type
    val expected = events.filter(col("user_id") === 7L).count()
    assert(expected > 0)
    assert(Layout.readBucketTransform(spark, dir, "user_id", 8, 7).count() === expected)
    assert(Layout.readBucketTransform(spark, dir, "user_id", 8, 7L).count() === expected)
    // xxhash64 fast mode gets the same cast discipline
    val dirX = java.nio.file.Files.createTempDirectory("graft_xbucket").toString
    Layout.writeBucketTransform(events, "user_id", 8, dirX, mode = "xxhash64")
    assert(Layout.readBucketTransform(spark, dirX, "user_id", 8, 7, mode = "xxhash64")
      .count() === expected)
  }
}
