package graft

import graft.etl.{SteelEda, SteelSchema}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2.4): algebraic laws that must
  * hold for arbitrary data, exercised on generated steel-shaped frames.
  * Raw ScalaCheck generators with fixed seeds (the scalatest-scalacheck
  * bridge is not in the offline dependency cache) — each property runs
  * against several independently drawn frames.
  */
class PropertySpec extends SparkTestBase {

  /** Draw n deterministic samples from a generator. */
  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def forAllSamples[A](g: Gen[A], n: Int = 5, seed: Long = 7L)(body: A => Unit): Unit =
    samples(g, n, seed).foreach(body)

  private val loadTypes = Seq("Light_Load", "Medium_Load", "Maximum_Load")
  private val days = Seq("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")

  private val rowGen: Gen[(Double, Double, Int, String, String, String)] = for {
    usage <- Gen.choose(0.0, 160.0)
    co2 <- Gen.choose(0.0, 0.07)
    nsm <- Gen.oneOf(0 until 96).map(_ * 900)
    day <- Gen.oneOf(days)
    lt <- Gen.oneOf(loadTypes)
    ws <- Gen.oneOf("Weekday", "Weekend")
  } yield (usage, co2, nsm, day, lt, ws)

  private def frame(rows: List[(Double, Double, Int, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("Usage_kWh", "CO2(tCO2)", "NSM", "Day_of_week", "Load_Type", "WeekStatus")
  }

  test("groupBy counts always sum to the total row count") {
    forAllSamples(Gen.listOfN(60, rowGen)) { rows =>
      if (rows.nonEmpty) {
        val df = frame(rows)
        val total = df.count()
        val sumCounts = SteelEda.countBy(df, "Load_Type")
          .agg(sum("count")).collect()(0).getLong(0)
        assert(sumCounts === total)
      }
    }
  }

  test("rename is reversible and composes (P3)") {
    forAllSamples(Gen.listOfN(10, rowGen), n = 3) { rows =>
      if (rows.nonEmpty) {
        val df = frame(rows)
        val there = SteelSchema.renamed(df)
        val back = SteelSchema.renames.foldLeft(there) { case (d, (from, to)) =>
          d.withColumnRenamed(to, from)
        }
        assert(back.schema.fieldNames.toSeq === df.schema.fieldNames.toSeq)
        assert(back.collect().toSeq === df.collect().toSeq)
      }
    }
  }

  test("format_number output always parses back within rounding distance") {
    forAllSamples(Gen.listOfN(40, rowGen)) { rows =>
      if (rows.nonEmpty) {
        val formatted = SteelEda.avgUsageBy(frame(rows), "Load_Type").collect()
        formatted.foreach { case Row(_, s: String) =>
          val parsed = s.replace(",", "").toDouble
          assert(parsed >= 0.0 && parsed <= 160.005)
        }
      }
    }
  }

  test("correlation is symmetric and bounded") {
    forAllSamples(Gen.listOfN(50, rowGen)) { rows =>
      if (rows.map(_._1).distinct.size > 1 && rows.map(_._2).distinct.size > 1) {
        val df = frame(rows)
        val ab = df.select(corr("CO2(tCO2)", "Usage_kWh")).collect()(0).getDouble(0)
        val ba = df.select(corr("Usage_kWh", "CO2(tCO2)")).collect()(0).getDouble(0)
        assert(math.abs(ab - ba) < 1e-12)
        assert(ab >= -1.0000001 && ab <= 1.0000001)
      }
    }
  }

  test("property: TopKBuffer equals sort-desc-take-k for arbitrary inserts and merges") {
    val pairGen = for {
      o <- Gen.choose(-100.0, 100.0)
      p <- Gen.choose(0L, 50L) // small payload range forces ord ties
    } yield (o, p)
    val caseGen = for {
      k <- Gen.choose(1, 8)
      xs <- Gen.listOf(pairGen)
      split <- Gen.choose(0, math.max(xs.size, 1))
    } yield (k, xs, split)
    forAllSamples(caseGen, n = 200, seed = 13L) { case (k, xs, split) =>
      val expected = xs.distinct.sortBy { case (o, p) => (-o, p) }.take(k)
      // distinct: duplicate (ord,payload) pairs are kept by the buffer too,
      // so feed unique pairs to keep the reference order total
      val uniq = xs.distinct
      val (l, r) = uniq.splitAt(math.min(split, uniq.size))
      val bufL = new graft.functions.TopKBuffer(k)
      val bufR = new graft.functions.TopKBuffer(k)
      l.foreach { case (o, p) => bufL.add(o, p) }
      r.foreach { case (o, p) => bufR.add(o, p) }
      // merge r into l the way partial aggregation does
      (0 until bufR.size).foreach(i => bufL.add(bufR.ords(i), bufR.payloads(i)))
      val got = (0 until bufL.size).map(i => (bufL.ords(i), bufL.payloads(i)))
      assert(got == expected, s"k=$k xs=$uniq got=$got want=$expected")
    }
  }
}
