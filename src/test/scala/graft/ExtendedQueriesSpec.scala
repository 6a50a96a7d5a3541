package graft

import graft.operators.ExtendedQueries
import org.apache.spark.sql.functions._

/** Invariant checks for the ExtendedQueries catalog (q45-q54). The DuckDB
  * oracle is the primary correctness gate (all ten are oracle-checked at
  * sf0.01); these specs pin the semantic properties the oracle's hash can't
  * explain on its own — frame membership, null padding, tie-breaks.
  */
class ExtendedQueriesSpec extends SparkTestBase {

  test("q46 full outer covers the union of both sides' keys, padding with zero") {
    val out = ExtendedQueries.q46FullOuterJoin(spark, Sf0001).collect()
    val custNations = Tables.customer(spark, Sf0001)
      .select("c_nationkey").distinct().collect().map(_.getInt(0)).toSet
    val suppNations = Tables.supplier(spark, Sf0001)
      .select("s_nationkey").distinct().collect().map(_.getInt(0)).toSet
    assert(out.map(_.getInt(0)).toSet == (custNations ++ suppNations))
    // padded rows: a nation with no suppliers reports n_supp = 0, not null
    assert(out.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("q47 first <= last timeline order and nth(2) is null only for 1-event users") {
    val out = ExtendedQueries.q47FirstLastNth(spark, Sf0001)
    val counts = Tables.events(spark, Sf0001).groupBy("user_id").count()
    val joined = out.join(counts, "user_id").collect()
    joined.foreach { r =>
      val n = r.getAs[Long]("count")
      val secondNull = r.isNullAt(r.fieldIndex("second_value"))
      assert(secondNull == (n < 2), s"user ${r.get(0)}: n=$n secondNull=$secondNull")
    }
  }

  test("q48 trailing-hour sum always includes the current row's value") {
    val ev = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"), col("value"))
    val out = ExtendedQueries.q48RangeFrame(spark, Sf0001)
    val joined = out.join(ev, Seq("user_id", "event_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val hs = r.getAs[Double]("hour_sum")
      val v = r.getAs[Double]("value")
      assert(hs >= v - 1e-9, s"event ${r.get(1)}: hour_sum $hs < value $v")
    }
  }

  test("q50 HOF formulation equals the plain conditional-aggregate formulation") {
    val hof = ExtendedQueries.q50HigherOrderArrays(spark, Sf0001)
    val plain = Tables.lineitem(spark, Sf0001)
      .groupBy(col("l_orderkey"))
      .agg(
        sum(when(col("l_quantity") > 25.0, 1L).otherwise(0L)).cast("int").as("n_big"),
        sum(col("l_quantity")).as("order_qty"),
        max(when(col("l_quantity") >= 49.0, 1L).otherwise(0L)).as("has_max"))
      .groupBy(col("n_big"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("order_qty")).as("total_qty"),
        sum(col("has_max")).as("n_with_max"))
      .orderBy(col("n_big"))
    assert(hof.collect().toSeq == plain.collect().toSeq)
  }

  test("q51 mode is the argmax of the frequency table with (count desc, value asc) ties") {
    val out = ExtendedQueries.q51MedianMode(spark, Sf0001).collect()
    val freq = Tables.lineitem(spark, Sf0001)
      .groupBy("l_returnflag", "l_quantity").count().collect()
      .groupBy(_.getString(0))
    out.foreach { r =>
      val rf = r.getString(0)
      val best = freq(rf).map(x => (x.getLong(2), x.getDouble(1)))
        .minBy { case (c, v) => (-c, v) }._2
      assert(r.getDouble(2) == best, s"$rf: mode ${r.getDouble(2)} != $best")
    }
  }

  test("q52 stratified rates bound each stratum's sample near rate% of its stratum") {
    val full = Tables.orders(spark, Sf0001)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Map("F" -> 0.10, "O" -> 0.05, "P" -> 0.50)
    ExtendedQueries.q52StratifiedSample(spark, Sf0001).collect().foreach { r =>
      val st = r.getString(0)
      val frac = r.getLong(1).toDouble / full(st)
      // orderkeys are dense-ish, so modulus sampling tracks the rate closely
      assert(math.abs(frac - rates(st)) < 0.05, s"$st: got $frac want ~${rates(st)}")
    }
  }

  test("q54 missing columns are null-padded per tag") {
    val rows = ExtendedQueries.q54UnionByName(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val hv = rows("high_value")
    assert(hv.getAs[Long]("n_with_price") == hv.getAs[Long]("n") &&
      hv.getAs[Long]("n_with_priority") == 0L)
    val ur = rows("urgent")
    assert(ur.getAs[Long]("n_with_priority") == ur.getAs[Long]("n") &&
      ur.getAs[Long]("n_with_price") == 0L)
  }

  test("q59 approx percentiles satisfy the rank-fraction contract per group") {
    val out = ExtendedQueries.q59ApproxPercentiles(spark, Sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val rf = r.getString(0)
      assert(r.getAs[Long]("n_rows") > 0, s"$rf: empty group")
      Seq("p50_ok", "p90_ok", "p99_ok").foreach { c =>
        assert(r.getAs[Boolean](c), s"$rf: $c false — estimate outside rank bound")
      }
    }
  }

  test("q41 segment-filtered fuzzy join equals the brute-force all-pairs formulation") {
    val fast = operators.StarQueries.q41FuzzyNames(spark, Sf0001).collect().toSeq
    val p = Tables.part(spark, Sf0001).select(col("p_partkey"), col("p_brand"), col("p_name"))
    val a = p.select(col("p_brand"), col("p_partkey").as("ka"), col("p_name").as("na"))
    val b = p.select(col("p_brand").as("brand_b"), col("p_partkey").as("kb"), col("p_name").as("nb"))
    val brute = a.join(b, col("p_brand") === col("brand_b") && col("ka") < col("kb"))
      .withColumn("dist", expr("levenshtein(na, nb, 2)"))
      .filter(col("dist") >= 0 && col("dist") <= 2)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_near_pairs"), sum(col("dist")).as("total_dist"))
      .orderBy(col("p_brand")).collect().toSeq
    assert(fast == brute)
  }

  test("q45 bigrams: top-20 bounded by corpus total; 1-token docs don't crash the guard") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
    val nBigramsTotal = docs
      .select(size(split(col("text"), " ")).as("nw"))
      .agg(sum(when(col("nw") >= 2, col("nw") - 1).otherwise(0L))).as[Long].head()
    // sum of the top-20 counts must be <= total bigrams; and on a corpus
    // including a 1-token doc the guarded expression must not crash
    import spark.implicits._
    val single = Seq((999999L, "solo", "en", "srcX", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q45").toString
    docs.unionByName(single).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val guarded = ExtendedQueries.q45ExplodeBigrams(spark, tmp).collect()
    assert(guarded.nonEmpty)
    val top20 = guarded.map(_.getLong(1)).sum
    assert(top20 <= nBigramsTotal)
  }

  test("q71 quartiles are balanced (sizes differ by <= 1) and ranks are monotone") {
    val out = ExtendedQueries.q71NtileRanks(spark, Sf0001).collect()
    out.groupBy(_.getString(0)).foreach { case (seg, rows) =>
      val sizes = rows.groupBy(_.getInt(2)).view.mapValues(_.length).values
      assert(sizes.max - sizes.min <= 1, s"segment $seg quartile sizes $sizes")
      // cume_dist is non-decreasing in (acctbal, custkey) order and ends at 1
      rows.foreach { r =>
        assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
        assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      }
      assert(rows.map(_.getDouble(4)).max === 1.0, s"segment $seg cume_dist max")
    }
  }

  test("q72 SQL EXISTS/NOT EXISTS equals the explicit semi/anti join plan (q10/q11 shape)") {
    val sqlForm = ExtendedQueries.q72ExistsSubquery(spark, Sf0001).collect().toSeq
    val li = Tables.lineitem(spark, Sf0001)
    val semiKeys = li.filter(col("l_returnflag") === "R" && col("l_quantity") <= 2)
      .select(col("l_suppkey")).distinct()
    val antiKeys = li.filter(col("l_quantity") >= 50 && col("l_discount") >= 0.09)
      .select(col("l_suppkey")).distinct()
    val joinForm = Tables.supplier(spark, Sf0001)
      .join(semiKeys, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(antiKeys, col("s_suppkey") === col("l_suppkey"), "left_anti")
      .join(Tables.nation(spark, Sf0001), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n_suppliers"))
      .orderBy(col("n_name")).collect().toSeq
    assert(sqlForm == joinForm)
  }

  test("q73 lateral top-n equals the window rank formulation and caps at 2 per customer") {
    val lateral = ExtendedQueries.q73LateralTopn(spark, Sf0001).collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = Tables.orders(spark, Sf0001)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .join(Tables.customer(spark, Sf0001).filter(col("c_custkey") < 200),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_custkey"), col("o_orderkey")).collect().toSeq
    assert(lateral == windowed)
    assert(lateral.groupBy(_.getLong(0)).values.forall(_.length <= 2))
  }

  test("q74 listagg emits sorted CSVs whose length matches the group count") {
    val out = ExtendedQueries.q74Listagg(spark, Sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val names = r.getString(2).split(',').toSeq
      assert(names.length.toLong === r.getLong(1), s"nation ${r.getString(0)}")
      assert(names == names.sorted, s"nation ${r.getString(0)}: unsorted listagg")
    }
  }
}
