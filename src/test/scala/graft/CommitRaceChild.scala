package graft

import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sources.LakeStore

/** Second-WRITER-PROCESS harness for the cross-process commit-atomicity
  * stress (Round16OpsSpec): a plain JVM (no Spark session — the race is
  * purely in the commit log protocol) pointed at the parent's lake root
  * via -Dgraft.lake.root, appending `n` one-file commits to `key` with
  * the standard lost-race retry (invalidate cache, replay the log,
  * commit on top). Every append uses a unique `<tag>-<i>.parquet`
  * manifest path, so the parent can verify afterwards that EVERY commit
  * both processes believe they landed is present in the replayed live
  * set — a silently-replaced log entry (the POSIX rename hazard) would
  * lose exactly one of them. */
object CommitRaceChild {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val n = args(1).toInt
    val tag = args(2)
    val mode = if (args.length > 3) args(3) else "append"
    mode match {
      case "append" =>
        (0 until n).foreach(i => appendWithRetry(key, s"$tag-$i.parquet"))
      case "rmw" =>
        // group-scoped read-modify-write increments alternating over two
        // groups: each increment PLANS against a snapshot (possibly
        // stale by MANY foreign commits — the other process keeps
        // writing) and commits with a GroupScope claim, so conflict
        // CLASSIFICATION runs cross-process: same-group interleavings
        // abort retryably, disjoint-group ones rebase and land.
        var retries = 0
        (0 until n).foreach { i =>
          retries += incrementWithRetry(key, "g0", tag, i)
          retries += incrementWithRetry(key, "g1", tag, i)
        }
        println(s"[child] rmw retries: $retries")
      case other => sys.error(s"unknown mode $other")
    }
    println(s"[child] committed $n")
  }

  /** One read-modify-write increment of group `g`'s counter (the
    * counter IS the group's single file's manifest row count): read the
    * live state, plan `old + 1`, commit a group-scoped REPLACE with the
    * read version claimed. A concurrent same-group commit between plan
    * and claim makes this writer lose — either as a classified
    * [[LakeStore.CommitConflictException]] (the store advanced and the
    * ConflictChecker saw the overlapping group) or as a raw version-
    * claim loss — and the retry replays the foreign commits and
    * re-plans, which is exactly what makes the final counter equal the
    * serial schedule's. Returns retries used. */
  def incrementWithRetry(key: String, g: String, tag: String, i: Int,
      maxTries: Int = 2000): Int = {
    var tries = 0
    while (true) {
      val st = LakeStore.get(key).getOrElse(sys.error(s"no table $key"))
      val cur = st.current.find(_.group == List(g)).getOrElse(
        sys.error(s"group $g of $key has no counter file"))
      try {
        LakeStore.replace(key,
          Seq(LakeStore.FileEntry(s"$tag-$g-$i.parquet", List(g),
            rows = cur.rows + 1, cols = Seq("id"), zones = Map.empty)),
          groups = Some(Set(List[Any](g))),
          txn = Some(LakeStore.Txn(st.latestVersion,
            LakeStore.GroupScope(_ == List(g)))))
        return tries
      } catch {
        case e: IllegalStateException => // incl. CommitConflictException
          tries += 1
          if (tries >= maxTries) throw e
          LakeStore.invalidateCache(key)
      }
    }
    tries
  }

  /** One append, retried through lost commit races — shared shape with
    * the parent's side of the stress. Returns retries used. */
  def appendWithRetry(key: String, path: String, maxTries: Int = 500): Int = {
    var tries = 0
    while (true) {
      try {
        LakeStore.append(key, Seq(LakeStore.FileEntry(
          path, Nil, rows = 1L, cols = Seq("id"),
          zones = Map.empty)))
        return tries
      } catch {
        case e @ (_: IllegalStateException | _: LakeStore.CommitConflictException) =>
          tries += 1
          if (tries >= maxTries) throw e
          // the other process claimed our version: re-read the log and
          // commit on top of the state it left
          LakeStore.invalidateCache(key)
      }
    }
    tries
  }

  /** Schema of the race table — shared so both processes create/expect
    * the same shape. */
  val schema: StructType = StructType(Seq(StructField("id", LongType)))
}
