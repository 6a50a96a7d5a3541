package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{GraftLake, LakeStore}

/** Round-10 first wave: the round-9 ADVICE hardening, each pinned at
  * the level a query hash cannot see — on-disk survival of CREATE
  * collisions, manifest serde of datetime/decimal zones across a cold
  * replay, change feeds spanning a schema-evolution boundary, and the
  * streaming retention gate. */
class Round10OpsSpec extends SparkTestBase {

  private def registerCatalog(): Unit =
    if (!spark.conf.getOption("spark.sql.catalog.graft_lake").contains(
        classOf[graft.sources.GraftLakeCatalog].getName))
      spark.conf.set("spark.sql.catalog.graft_lake",
        classOf[graft.sources.GraftLakeCatalog].getName)

  // --------------------------------------------- CREATE vs cold tables

  test("CREATE TABLE refuses to clobber a table that exists only on disk (cold log)") {
    registerCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_lake.coldc")
    spark.sql("CREATE TABLE graft_lake.coldc (id BIGINT)")
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("id").writeTo("graft_lake.coldc").append()
    // simulate a JVM restart over a persistent root: warm cache gone,
    // the on-disk commit log is all that remains
    LakeStore.invalidateCache("graft_lake.coldc")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft_lake.coldc (other STRING)")
    }
    assert(e.getMessage.toLowerCase.contains("already exists"))
    // and the original data survived the attempt
    assert(spark.table("graft_lake.coldc").count() === 3L)
  }

  // ------------------------------------- datetime + decimal manifests

  test("DATE/TIMESTAMP zones round-trip a cold log replay and still skip files") {
    registerCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_lake.dtz")
    spark.sql("CREATE TABLE graft_lake.dtz (id BIGINT, d DATE, ts TIMESTAMP)")
    spark.sql("""INSERT INTO graft_lake.dtz
                |SELECT 1L, DATE'2024-01-01', TIMESTAMP'2024-01-01 00:00:00'""".stripMargin)
    spark.sql("""INSERT INTO graft_lake.dtz
                |SELECT 2L, DATE'2025-06-01', TIMESTAMP'2025-06-01 12:00:00'""".stripMargin)
    // cold replay must decode the datetime zones, not throw or vanish
    LakeStore.invalidateCache("graft_lake.dtz")
    val st = LakeStore.get("graft_lake.dtz").get
    assert(st.current.forall(f => f.zones.contains("d") && f.zones.contains("ts")))
    // and the replayed zones still prune: a 2025 probe opens one file
    assert(spark.table("graft_lake.dtz")
      .filter(col("d") >= lit("2025-01-01").cast("date")).count() === 1L)
    val stats = LakeStore.lastScanStats("graft_lake.dtz")
    assert(stats.filesTotal === 2 && stats.filesScanned === 1)
  }

  test("DECIMAL columns commit without zones (superset-safe) and survive cold replay") {
    registerCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_lake.decz")
    spark.sql("CREATE TABLE graft_lake.decz (id BIGINT, amt DECIMAL(10,2))")
    spark.sql("INSERT INTO graft_lake.decz SELECT 1L, CAST(12.34 AS DECIMAL(10,2))")
    spark.sql("INSERT INTO graft_lake.decz SELECT 2L, CAST(99.99 AS DECIMAL(10,2))")
    LakeStore.invalidateCache("graft_lake.decz")
    val st = LakeStore.get("graft_lake.decz").get
    // no decimal zone recorded — and id zones still present
    assert(st.current.forall(f => !f.zones.contains("amt") && f.zones.contains("id")))
    // an equality probe on the un-zoned column must NOT skip files
    assert(spark.table("graft_lake.decz")
      .filter(col("amt") === lit(BigDecimal("99.99"))).count() === 1L)
    val stats = LakeStore.lastScanStats("graft_lake.decz")
    assert(stats.filesScanned === 2) // superset-safe: nothing pruned on amt
  }

  // ------------------------------------ change feed across an ALTER

  test("changes() spans an ALTER TABLE ADD COLUMN boundary") {
    registerCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_lake.evch")
    spark.sql("CREATE TABLE graft_lake.evch (id BIGINT, v BIGINT)")
    import spark.implicits._
    (0L until 10L).map(i => (i, i)).toDF("id", "v")
      .writeTo("graft_lake.evch").append() // v1
    spark.sql("ALTER TABLE graft_lake.evch ADD COLUMN tag STRING") // v2
    spark.sql("UPDATE graft_lake.evch SET tag = 'hot', v = v + 100 WHERE id < 3") // v3
    // diff v1 -> v3 crosses the schema boundary: pre-ALTER snapshot has
    // no `tag`, post-ALTER rows carry it — must analyze and classify
    val ch = GraftLake.changes(spark, "graft_lake.evch", 1, 3, "id")
      .collect().map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    assert(ch === Map(0L -> "U", 1L -> "U", 2L -> "U"))
    // untouched rows with a padded-null new column are NOT spurious U's
    assert(!ch.contains(5L))
  }

  // ------------------------------------------ streaming retention gate

  test("a stream resuming below the VACUUM horizon fails with the retention message") {
    registerCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_lake.stvac")
    spark.sql("CREATE TABLE graft_lake.stvac (id BIGINT)")
    import spark.implicits._
    Seq(1L, 2L).toDF("id").writeTo("graft_lake.stvac").append() // v1
    Seq(3L).toDF("id").writeTo("graft_lake.stvac").append() // v2
    Seq(4L).toDF("id").writeTo("graft_lake.stvac").append() // v3
    GraftLake.vacuum("graft_lake.stvac", retainLast = 1, graceMs = 0L)
    val ck = java.nio.file.Files.createTempDirectory("graft-stvac-").toString
    val e = intercept[Exception] {
      val q = spark.readStream.table("graft_lake.stvac")
        .writeStream.format("noop")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("vacuumed")))
  }
}
