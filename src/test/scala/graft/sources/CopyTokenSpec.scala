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
}
