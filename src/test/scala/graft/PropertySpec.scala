package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.bi.{ChartCompiler, ChartSpec, Metric}
import graft.ext.{Dedup, Splits}

/** Property tests (SURVEY.md §5): the reference's own invariants
  * (idempotent seeding), ChartCompiler totality over arbitrary valid
  * specs, dedup idempotence, split totality. Generators are scalacheck
  * `Gen`s sampled with a fixed seed (the scalatest-scalacheck bridge isn't
  * in the offline dependency set, so sampling is driven directly). */
class PropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(42L)
    (1 to n).flatMap { _ =>
      val r = gen.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  private val eventCols = Seq("id", "ts", "event_type", "payload", "user_id", "amount")

  test("ChartCompiler is total over arbitrary valid raw-mode specs") {
    val genSpec = for {
      cols <- Gen.someOf(eventCols)
      limit <- Gen.choose(1, 300)
      asc <- Gen.oneOf(true, false)
    } yield ChartSpec(datasource = "events", queryMode = "raw",
      allColumns = cols.toSeq, orderBy = Seq(("id", asc)), rowLimit = limit)
    samples(genSpec, 12).foreach { spec =>
      val df = ChartCompiler.compile(spark, spec, _ => graft.engine.Seed.events(spark))
      val n = df.count()
      assert(n <= spec.rowLimit && n <= 200)
    }
  }

  test("ChartCompiler agg mode: any metric over any numeric column compiles and runs") {
    val genSpec = for {
      fn <- Gen.oneOf("sum", "avg", "min", "max", "count")
      g <- Gen.oneOf(Seq.empty[String], Seq("event_type"))
    } yield ChartSpec(datasource = "events", queryMode = "aggregate", groupby = g,
      metrics = Seq(Metric(fn, if (fn == "count") None else Some("amount"), "m")),
      rowLimit = 100)
    samples(genSpec, 8).foreach { spec =>
      val rows = ChartCompiler.compile(spark, spec, _ => graft.engine.Seed.events(spark)).collect()
      assert(rows.nonEmpty)
    }
  }

  test("dedup(x ++ x) == dedup(x) for arbitrary keyed data") {
    val genRows = Gen.nonEmptyListOf(for {
      id <- Gen.choose(1L, 50L)
      key <- Gen.alphaStr.map(_.take(4))
    } yield (id, key))
    samples(genRows, 6).foreach { rows =>
      val spark0 = spark
      import spark0.implicits._
      val df = rows.toDF("id", "text")
      val once = Dedup.exactKeepFirst(df, "text", "id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val twice = Dedup.exactKeepFirst(df.unionAll(df), "text", "id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(once === twice)
    }
  }

  test("split assignment is total and respects any positive weights") {
    val genWeights = Gen.nonEmptyListOf(Gen.choose(1, 5)).map(_.take(4))
      .map(_.zipWithIndex.map { case (w, i) => (s"s$i", w) })
    samples(genWeights, 8).filter(_.nonEmpty).foreach { weights =>
      val docs = Tables.documents(spark, sf0001).limit(100)
      val out = Splits.assign(docs, "doc_id", weights)
      val labels = out.select("split").distinct().collect().map(_.getString(0)).toSet
      assert(labels.subsetOf(weights.map(_._1).toSet))
      assert(out.count() === 100)
    }
  }
}
