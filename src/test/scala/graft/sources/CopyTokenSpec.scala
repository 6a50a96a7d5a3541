package graft.sources

import org.apache.spark.sql.functions._

/** The COPY INTO handoff is a SAME-THREAD token: a concurrent plain
  * append to the same table from another thread must commit as an
  * ordinary 'append' and can never consume (or be stamped with) the
  * ingest ledger — the lost-exactly-once race a table-keyed shared map
  * had (a stolen ledger marks files loaded without their rows, so a
  * re-run would skip them forever; an unledgered ingest re-loads them
  * as duplicates). */
class CopyTokenSpec extends graft.SparkTestBase {

  test("a racing thread's append cannot steal another thread's copy ids") {
    if (!spark.conf.getOption("spark.sql.catalog.graft_lake").contains(
        classOf[GraftLakeCatalog].getName))
      spark.conf.set("spark.sql.catalog.graft_lake",
        classOf[GraftLakeCatalog].getName)
    import spark.implicits._
    val key = "graft_lake.cptoken"
    spark.sql(s"DROP TABLE IF EXISTS $key")
    spark.sql(s"CREATE TABLE $key (id BIGINT)")
    // this thread is mid-COPY-INTO: ids staged, append not yet committed
    LakeStore.pendingCopyIds.set((key, Seq("staged.parquet@42")))
    try {
      // a concurrent writer lands a plain append from ANOTHER thread
      val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val racer = new Thread(() => {
        try Seq(7L).toDF("id").writeTo(key).append()
        catch { case e: Throwable => err.set(e) }
      })
      racer.start()
      racer.join(120000)
      assert(err.get() == null, s"racer append failed: ${err.get()}")
      val st = LakeStore.get(key).get
      assert(st.snapshots(st.latestVersion).action === "append",
        "the racer's commit is an ordinary append, not a copyinto")
      assert(st.snapshots(st.latestVersion).copyIds.isEmpty,
        "the racer must not be stamped with this thread's ledger")
      assert(st.copyLedger.isEmpty,
        "nothing is marked loaded until the ingest's OWN commit lands")
      // ... and this thread's own append still carries its ids
      Seq(8L).toDF("id").writeTo(key).append()
      val st2 = LakeStore.get(key).get
      assert(st2.snapshots(st2.latestVersion).action === "copyinto")
      assert(st2.snapshots(st2.latestVersion).copyIds === Seq("staged.parquet@42"))
      assert(st2.copyLedger === Set("staged.parquet@42"))
    } finally LakeStore.pendingCopyIds.remove()
  }

  test("concurrent COPY INTO runs cannot double-ingest the same file") {
    if (!spark.conf.getOption("spark.sql.catalog.graft_lake").contains(
        classOf[GraftLakeCatalog].getName))
      spark.conf.set("spark.sql.catalog.graft_lake",
        classOf[GraftLakeCatalog].getName)
    import spark.implicits._
    val key = "graft_lake.cprace"
    spark.sql(s"DROP TABLE IF EXISTS $key")
    spark.sql(s"CREATE TABLE $key (id BIGINT)")
    // run 1 ingests f1 (simulated: its ids land via the token path)
    LakeStore.pendingCopyIds.set((key, Seq("f1.parquet@10")))
    try Seq(1L).toDF("id").writeTo(key).append()
    finally LakeStore.pendingCopyIds.remove()
    assert(LakeStore.get(key).get.copyLedger === Set("f1.parquet@10"))
    // run 2 ALSO listed f1 before run 1 committed (both saw it
    // unloaded) — its commit must abort under the store lock instead
    // of landing f1's rows a second time
    LakeStore.pendingCopyIds.set((key, Seq("f1.parquet@10", "f2.parquet@20")))
    val e = try intercept[Exception] {
      Seq(1L).toDF("id").writeTo(key).append()
    } finally LakeStore.pendingCopyIds.remove()
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.isInstanceOf[LakeStore.CommitConflictException] &&
        c.getMessage.contains("ConcurrentCopyInto")),
      s"expected a retryable COPY INTO conflict, got $e")
    // nothing landed, nothing new was ledgered: the re-run contract
    assert(LakeStore.get(key).get.copyLedger === Set("f1.parquet@10"))
    assert(spark.table(key).count() === 1L)
  }
}
