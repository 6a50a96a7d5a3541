package graft

import org.apache.spark.sql.functions._

/** Source/sink format breadth: the same relation must survive round-trips
  * through every bundled file format (parquet is the system of record;
  * csv/json/orc are interchange). Schema fidelity differences are part of
  * the contract being tested: csv/json need explicit schemas on read.
  */
class SourceFormatsSpec extends SparkTestBase {

  lazy val orders = Tables.orders(spark, Sf0001).cache()

  private def digest(df: org.apache.spark.sql.DataFrame): Array[org.apache.spark.sql.Row] =
    df.select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        col("o_orderdate").cast("string").as("od"))
      .orderBy(col("o_orderkey")).collect()

  test("parquet round-trip preserves everything") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    orders.write.mode("overwrite").parquet(s"$dir/o")
    val back = spark.read.parquet(s"$dir/o")
    assert(back.schema === orders.schema)
    assert(digest(back).toSeq === digest(orders).toSeq)
  }

  test("orc round-trip preserves everything") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    orders.write.mode("overwrite").orc(s"$dir/o")
    val back = spark.read.orc(s"$dir/o")
    assert(back.schema === orders.schema)
    assert(digest(back).toSeq === digest(orders).toSeq)
  }

  test("json round-trip with declared schema preserves values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    orders.write.mode("overwrite").json(s"$dir/o")
    val back = spark.read.schema(orders.schema).json(s"$dir/o")
    assert(digest(back).toSeq === digest(orders).toSeq)
  }

  test("csv round-trip with declared schema + timestamp format preserves values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    orders.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(s"$dir/o")
    val back = spark.read.schema(orders.schema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(s"$dir/o")
    assert(digest(back).toSeq === digest(orders).toSeq)
  }

  test("mergeSchema unions evolved parquet schemas, null-padding old files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    orders.select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$dir/t/batch=1")
    orders.select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.mode("overwrite").parquet(s"$dir/t/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.columns.toSet == Set("o_orderkey", "o_totalprice", "o_orderstatus", "batch"))
    val n = orders.count()
    assert(merged.count() == 2 * n)
    // old-batch rows surface the evolved column as null
    assert(merged.filter(col("batch") === 1 && col("o_orderstatus").isNull).count() == n)
    assert(merged.filter(col("batch") === 2 && col("o_orderstatus").isNotNull).count() == n)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    orders.withColumn("yr", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("yr").parquet(s"$dir/o")
    val pruned = spark.read.parquet(s"$dir/o").filter(col("yr") === 1997)
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(yr"), plan.take(600))
    val expected = orders.filter(year(col("o_orderdate")) === 1997).count()
    assert(pruned.count() === expected)
  }

  test("small-files compaction: repartition + maxRecordsPerFile bound output file count and size") {
    // the operational tail of every 100 TB ingest: a directory of many tiny
    // files (here: 64-way write of 1.5k rows) compacted into few bounded
    // files, contents unchanged
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    orders.repartition(64).write.mode("overwrite").parquet(s"$dir/small")
    def parquetFiles(p: String): Array[java.io.File] =
      new java.io.File(p).listFiles().filter(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$dir/small").length === 64)
    // repartition(2) alone bounds the file count exactly (one file per
    // partition); round-robin balance across the 2 partitions is NOT
    // guaranteed to the row, so don't couple the count assertion to it
    spark.read.parquet(s"$dir/small")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/compact")
    assert(parquetFiles(s"$dir/compact").length === 2)
    assert(digest(spark.read.parquet(s"$dir/compact")) === digest(orders))
    // maxRecordsPerFile bounds file SIZE independently of partitioning:
    // a quarter-sized cap must split each partition into >= 2 files
    val n = orders.count()
    spark.read.parquet(s"$dir/small")
      .repartition(2)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", (n / 4).max(1L).toString)
      .parquet(s"$dir/capped")
    assert(parquetFiles(s"$dir/capped").length >= 4)
    assert(digest(spark.read.parquet(s"$dir/capped")) === digest(orders))
  }

  test("binaryFile source ingests raw media files byte-identically, glob-filtered") {
    // the ingestion path a multimodal pipeline starts from: opaque files on
    // disk -> (path, length, content) rows -> join to metadata by filename
    val media = graft.operators.Multimodal.mediaTable(spark, Sf0001)
      .filter(_.kind != "video").collect().take(12)
    val dir = java.nio.file.Files.createTempDirectory("graft_bin").toString
    media.foreach { m =>
      val ext = if (m.kind == "image") "bmp" else "wav"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/media_${m.media_id}.$ext"), m.payload)
    }
    val read = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bmp") // partition-style pruning at listing time
      .load(dir)
      .select(regexp_extract(col("path"), "media_(\\d+)\\.bmp", 1).cast("long").as("media_id"),
        col("length"), col("content"))
      .collect()
    val images = media.filter(_.kind == "image")
    assert(read.length === images.length, "glob filter must keep only the BMPs")
    val byId = images.map(m => m.media_id -> m.payload).toMap
    read.foreach { r =>
      val expect = byId(r.getLong(0))
      assert(r.getLong(1) === expect.length.toLong)
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](2), expect),
        s"media ${r.getLong(0)}: content not byte-identical")
    }
  }
}
