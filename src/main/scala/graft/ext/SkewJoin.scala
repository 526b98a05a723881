package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew lever for when AQE's runtime skew
  * splitting isn't available (e.g. the skewed side feeds a broadcast-less
  * sort-merge join inside a larger pipeline) or the skew is known ahead of
  * time (a handful of boilerplate dedup keys, a null-heavy FK).
  *
  * Shape: the skewed (fact) side gets a uniform salt in [0, salts); the
  * small (dim) side is exploded ×salts with every salt value; the join key
  * becomes (key, salt) — a hot key's rows now spread over `salts` reducers
  * instead of one straggler task. Cost: dim side inflates ×salts, so salts
  * stays small (8-32) and the dim side must be the smaller input.
  *
  * The salt is `pmod(xxhash64(fact row id), salts)` — deterministic, so
  * re-runs produce identical partitioning (no rand(), which would break
  * retry idempotency at task granularity).
  */
object SkewJoin {

  def saltedInner(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      saltSource: String, salts: Int = 16): DataFrame = {
    require(salts > 0)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(salts)).cast("int"))
    val exploded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(exploded,
        salted("__salt") === exploded("__salt") && col(factKey) === col(dimKey))
      .drop("__salt")
  }
}
