package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for [[EditJoin]] — exact deletion-neighborhood edit-distance
  * join — and its [[org.apache.spark.sql.graft.DeletionNeighborhood]]
  * candidate expression. The load-bearing claim is EXACTNESS: the join
  * over hashed variant keys must emit precisely the pairs an all-pairs
  * levenshtein filter would.
  */
class EditJoinSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("id", "name")
  }

  private def pairs(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    EditJoin.join(df(rows), "id", "name", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Reference: quadratic all-pairs with a plain DP levenshtein. */
  private def bruteForce(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      l = lev(sa, sb)
      if l <= d
    } yield (ia, ib, l.toLong)).toSet
  }

  test("matches brute force on a crafted typo family (d = 1 and d = 2)") {
    val rows = Seq(
      1L -> "johnson", 2L -> "jonson",    // deletion, d = 1
      3L -> "johnsen",                    // substitution vs 1, d = 1
      4L -> "johnsson",                   // insertion vs 1, d = 1
      5L -> "johnstone",                  // d = 2 from 1 ("t"+"e"? verify by DP)
      6L -> "smith", 7L -> "smyth", 8L -> "smithe",
      9L -> "completely-different")
    for (d <- Seq(1, 2))
      assert(pairs(rows, d) == bruteForce(rows, d), s"d=$d")
  }

  test("matches brute force on a randomized corpus (d = 1, 2)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd" // small alphabet to force many near pairs
    val rows = (1L to 120L).map { i =>
      i -> Array.fill(3 + rnd.nextInt(6))(alphabet(rnd.nextInt(4))).mkString
    }
    for (d <- Seq(1, 2))
      assert(pairs(rows, d) == bruteForce(rows, d), s"d=$d")
  }

  test("prefixBlocks decomposition is exact: blocked == default, bit for bit") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcd" // dense near-pair space: pairs collide in many
    // blocks, exercising the cross-block pair re-dedup
    val rows = (1L to 120L).map { i =>
      i -> Array.fill(3 + rnd.nextInt(6))(alphabet(rnd.nextInt(4))).mkString
    } ++ Seq(200L -> "abca", 201L -> "abca", 202L -> "abca") // dup ids ride too
    for (d <- Seq(1, 2); b <- Seq(2, 4, 7)) {
      val blocked = EditJoin.join(df(rows), "id", "name", d, prefixBlocks = b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(blocked == pairs(rows, d), s"d=$d blocks=$b")
    }
    assert(intercept[IllegalArgumentException] {
      EditJoin.join(df(rows), "id", "name", 1, prefixBlocks = 0)
    }.getMessage.contains("prefixBlocks"))
  }

  test("exact duplicates pair at distance 0; empty and null drop cleanly") {
    val s = spark; import s.implicits._
    val rows = Seq((1L, "abc"), (2L, "abc"), (3L, null: String), (4L, ""))
    val got = EditJoin.join(rows.toDF("id", "name"), "id", "name", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // "" is within distance 1 of nothing here except... lev("", "abc") = 3;
    // null matches nothing; (1, 2) at distance 0 survives
    assert(got == Set((1L, 2L, 0L)))
  }

  test("a hot value shared by 1000+ records collapses: exact output, one verify per distinct pair") {
    // The ER skew bomb: thousands of records share the literal same
    // attribute value (the NORMAL customer/author/site shape). The
    // collapse must (a) keep the output exact — C(c,2) zero-distance
    // pairs within the hot group plus every cross-group pair fanned out
    // over the full id list — while (b) the variant join sees each
    // distinct string once.
    val hot = (1L to 1200L).map(i => i -> "acme corporation")
    val near = Seq(2001L -> "acme corporatio",   // deletion, d = 1
      2002L -> "acme corporation!",              // insertion, d = 1
      2003L -> "acme corpor",                    // d = 5, out
      2004L -> "acme corporation")               // 1201st duplicate
    val rows = hot ++ near
    val got = pairs(rows, 1)
    // within-group: C(1201, 2) zero-distance pairs
    val dupIds = (1L to 1200L) :+ 2004L
    val within = (for {
      a <- dupIds; b <- dupIds; if a < b
    } yield (a, b, 0L)).toSet
    // cross-group: each of the two d=1 neighbors pairs with ALL 1201 dups
    // (2001 vs 2002 is lev 2 — correctly absent at d = 1)
    val cross = (for {
      a <- dupIds; b <- Seq(2001L, 2002L)
    } yield (math.min(a, b), math.max(a, b), 1L)).toSet
    assert(got == within ++ cross)
    assert(got.size == 1201 * 1200 / 2 + 2 * 1201)
  }

  test("distinct-string candidate generation sees each value once (plan-level collapse)") {
    // The variant join's input row count must track DISTINCT strings,
    // not records: measure via the neighborhood expression directly.
    import org.apache.spark.sql.graft.DeletionNeighborhood
    val s = spark; import s.implicits._
    val recs = ((1L to 500L).map(i => i -> "duplicated value") :+ (501L -> "unique value"))
      .toDF("id", "name")
    // re-derive the collapse the operator performs and count expanded keys
    val grouped = recs.groupBy(col("name")).agg(min(col("id")).as("rid"))
    val nKeys = grouped
      .select(explode(DeletionNeighborhood(col("name"), 1)).as("k"))
      .count()
    // 2 distinct strings, len 16/12 → 1 + 16 and 1 + 12 variants
    assert(nKeys == (1 + 16) + (1 + 12))
  }

  test("duplicate ids across different strings keep every cross-group pair") {
    // round-9 advisor item: with a bare min-id representative, id 1
    // appearing with both "abc" and "abd" gave BOTH groups rep 1 and the
    // `a.__rid < b.__rid` triangle condition dropped every cross pair
    // between the two groups. The (min id, string) struct representative
    // keeps them; only the degenerate (x, x) self-pair is dropped (the
    // per-record join's `id_a < id_b` behavior).
    val rows = Seq(1L -> "abc", 1L -> "abd", 2L -> "abc", 3L -> "xbd")
    val got = pairs(rows, 1)
    assert(got == Set((1L, 2L, 0L),  // within "abc"
      (1L, 2L, 1L),                  // "abc"(id 2) x "abd"(id 1)
      (1L, 3L, 1L)))                 // "abd" x "xbd"
  }

  test("duplicate (id, string) rows collapse: no double-emitted pairs") {
    val rows = Seq(1L -> "abc", 1L -> "abc", 2L -> "abd")
    val out = EditJoin.join(df(rows), "id", "name", 1).collect()
    assert(out.length == 1 &&
      (out(0).getLong(0), out(0).getLong(1), out(0).getLong(2)) == (1L, 2L, 1L))
  }

  test("short strings below the deletion budget still join exactly") {
    // len <= d edge: "a" has variants {"a", ""} at d = 1; "" pairs via
    // the empty variant with "b"'s — lev("a","b") = 1 must be found
    val rows = Seq(1L -> "a", 2L -> "b", 3L -> "", 4L -> "ab")
    for (d <- Seq(1, 2))
      assert(pairs(rows, d) == bruteForce(rows, d), s"d=$d")
  }

  test("supplementary-plane characters delete as single code points") {
    // U+1F600 is two UTF-16 chars; a code-point-correct neighborhood pairs
    // these at d = 1 (one substitution), byte/char-level would not
    val rows = Seq(1L -> "a😀b", 2L -> "a😁b")
    assert(pairs(rows, 1).map(p => (p._1, p._2)) == Set((1L, 2L)))
  }

  test("neighborhood size is the closed form on distinct-character strings") {
    import org.apache.spark.sql.graft.DeletionNeighborhood
    val s = spark; import s.implicits._
    val out = Seq("abcdefgh").toDF("s")
      .select(size(DeletionNeighborhood(col("s"), 2)).as("n"))
      .head().getInt(0)
    // all-distinct chars, L = 8: 1 + C(8,1) + C(8,2) = 1 + 8 + 28
    assert(out == 37)
  }
}
