package graft.ext

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class SkewJoinSpec extends SparkSpec {

  test("saltedInner equals the plain inner join on a skewed key") {
    val spark0 = spark
    import spark0.implicits._
    // heavily skewed fact: 90% of rows hit one key (the boilerplate-dedup /
    // null-FK shape)
    val fact = spark.range(0, 2000)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id") % 7 + 2).as("k"))
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "d"),
      (6L, "e"), (7L, "f"), (8L, "g")).toDF("dk", "label")

    val plain = fact.join(dim, col("k") === col("dk"))
      .select("id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = SkewJoin.saltedInner(fact, dim, "k", "dk", saltSource = "id", salts = 8)
      .select("id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain && plain.nonEmpty)
  }

  test("the hot key's rows spread across salt partitions") {
    val fact = spark.range(0, 1000).select(col("id"), lit(1L).as("k"))
    val salts = fact.withColumn("salt", pmod(xxhash64(col("id")), lit(8)))
      .groupBy("salt").count().collect().map(_.getLong(1))
    assert(salts.length === 8, "all 8 salt values should be hit")
    assert(salts.max < 1000 * 0.3, "no salt bucket should dominate")
  }
}
