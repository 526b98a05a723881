package graft.functions

import graft.SparkSpec
import graft.ext.{EntityResolution, TextPrep}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{JaroWinklerImpl, StringSimExprs}

/** [[org.apache.spark.sql.graft.JaroWinkler]] semantics, pinned to probe
  * vectors measured against DuckDB 1.0's `jaro_winkler_similarity` (the
  * oracle function) — the rapidfuzz convention set: max/2−1 match window,
  * integer-halved transpositions, 0.7 Winkler boost threshold, 4-char
  * prefix cap, empty→0 (including both-empty, where rapidfuzz itself
  * says 1 but DuckDB says 0). Plus codegen/eval parity and the
  * [[EntityResolution]] blocking contract.
  */
class StringSimSpec extends SparkSpec {
  import spark.implicits._

  // (a, b, expected) — expected values are DuckDB outputs, verbatim.
  private val duckProbes = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("abcxxxxx", "abcyyyyyyyyyy", 0.5352564102564102), // jaro<0.7: NO boost despite prefix
    ("dwayne", "duane", 0.8400000000000001),
    ("aaa", "aaa", 1.0),
    ("", "abc", 0.0),
    ("ab", "", 0.0),
    ("", "", 0.0), // DuckDB convention (rapidfuzz would say 1.0)
    ("a", "a", 1.0),
    ("abc", "acb", 0.5555555555555555), // window 0: only 'a' matches
    ("goldenrod lavender", "goldenrod lace", 0.9301587301587302), // prefix capped at 4
    ("CRAIG", "CRATE", 0.8133333333333334),
    ("prefix", "prefixxxxxxlong", 0.88),
    ("xz", "zx", 0.0)) // equal-length-2 anagrams: window 0, no matches

  test("scalar impl matches the DuckDB probe vectors bit-for-bit") {
    duckProbes.foreach { case (a, b, exp) =>
      assert(JaroWinklerImpl.sim(a, b) === exp, s"sim($a, $b)")
    }
  }

  test("symmetry") {
    duckProbes.foreach { case (a, b, exp) =>
      assert(JaroWinklerImpl.sim(b, a) === exp, s"sim($b, $a)")
    }
  }

  test("codegen path (DataFrame) ≡ scalar impl, and nulls propagate") {
    val df = duckProbes.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(StringSimExprs.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    assert(got === duckProbes.map(_._3))
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(StringSimExprs.jaroWinkler(col("a"), col("b"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("blocked ER: block-local pairs only, threshold on the rounded score") {
    val ents = Seq((1L, "red plate"), (2L, "red plat"), (3L, "hot plate"),
      (4L, "blue bolt"), (5L, "blue boltt")).toDF("id", "name")
    val got = EntityResolution.fuzzyMatches(ents, "id", "name",
        element_at(TextPrep.tokens(col("name")), -1), threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // "red plat" blocks under "plat", "blue boltt" under "boltt" — the
    // blocking key separates them from their near-identical twins (the
    // standard recall/cost trade every blocked ER scheme makes), while
    // plate-block pairs match.
    assert(got === Set((1L, 3L)))
    // no blocking (constant key) recovers the cross-block near-dups
    val all = EntityResolution.fuzzyMatches(ents, "id", "name",
        lit(1), threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all.contains((1L, 2L)) && all.contains((4L, 5L)))
  }
}
