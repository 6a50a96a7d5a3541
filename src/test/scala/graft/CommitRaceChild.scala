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
    val Array(key, nStr, tag) = args
    val n = nStr.toInt
    (0 until n).foreach { i =>
      appendWithRetry(key, s"$tag-$i.parquet")
    }
    println(s"[child] committed $n")
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
