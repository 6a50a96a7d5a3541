package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.json4s._
import org.json4s.jackson.JsonMethods

/** EXECUTOR-WRITTEN statistics sidecars for ANALYZE back-fill — the
  * Iceberg puffin shape: the distributed sketch pass lands its per-file
  * NDV sketches (and optional bloom filters) in sidecar files written
  * BY THE TASKS that merged them, and the manifest commit carries only
  * POINTERS (`P:<sidecar>#<fileName>#<slot>`, ~60 B) instead of the
  * 8 KB-per-column blobs themselves. Driver memory per ANALYZE is then
  * bounded by file NAMES collected (pointer assembly), never sketch
  * payloads — and the analyze commit's log entry shrinks by the same
  * factor. Write-time sketches (per-append, O(commit)) stay inline;
  * readers resolve both forms through [[resolve]], so every consumer —
  * CBO statistics, the `.stats` metadata table, bloom skipping — is
  * agnostic to where a sketch physically lives.
  *
  * Sidecar format: one JSON object per file,
  * `{"files": {"<dataFileName>": ["<slot0>", "<slot1>", ...]}}` — the
  * slot order is the ANALYZE call's column order (ndv columns first,
  * then bloom columns), pinned by the pointer's own slot index so the
  * format needs no schema. Sidecars are immutable once written (like
  * data files); a bounded LRU shares one parse across the many files
  * that point into the same sidecar. VACUUM sweeps ORPHAN sidecars: it
  * folds the keep-set versions' pointer slots into a referenced set
  * and deletes unreferenced `.stats.json` files older than the orphan
  * grace window — superseded ANALYZE runs, failed jobs and speculative
  * tasks no longer accumulate garbage forever. */
object LakeStatsSidecar {

  val PointerPrefix = "P:"

  def pointer(sidecarPath: String, fileName: String, slot: Int): String =
    s"$PointerPrefix$sidecarPath#$fileName#$slot"

  def isPointer(enc: String): Boolean = enc.startsWith(PointerPrefix)

  /** Rewrite a pointer's sidecar path to its absolute form — what CLONE
    * does to data paths, applied to stats (a clone's resolveRaw roots
    * relative paths in ITS OWN data dir, which never holds the
    * source's sidecars). */
  def absolutize(srcKey: String, enc: String): String =
    if (!isPointer(enc)) enc
    else {
      val body = enc.substring(PointerPrefix.length)
      val i = body.indexOf('#')
      val p = body.substring(0, i)
      PointerPrefix + LakeStore.resolveRaw(srcKey, p) + body.substring(i)
    }

  /** Task-side write: one sidecar holding this task's (fileName ->
    * slots) map, into the table's data dir. Returns the sidecar's
    * data-dir-relative name. */
  def write(dataDir: String, entries: Map[String, Array[String]]): String = {
    val rel = java.util.UUID.randomUUID().toString + ".stats.json"
    val p = new Path(dataDir, rel)
    val fs = p.getFileSystem(LakeStore.sharedHconf)
    val body = JObject("files" -> JObject(entries.toList.map { case (n, slots) =>
      n -> (JArray(slots.toList.map(JString(_))): JValue)
    }))
    val out = fs.create(p, false)
    try out.write(JsonMethods.compact(JsonMethods.render(body)).getBytes("UTF-8"))
    finally out.close()
    rel
  }

  /** Bounded LRU over parsed sidecars (immutable once written): one
    * open+parse serves every file pointing into the same sidecar. */
  private val cache =
    new java.util.LinkedHashMap[String, Map[String, Array[String]]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Map[String, Array[String]]]): Boolean =
        size() > 64
    }

  private def load(abs: String): Map[String, Array[String]] = {
    cache.synchronized {
      val hit = cache.get(abs)
      if (hit != null) return hit
    }
    val p = new Path(abs)
    val fs = p.getFileSystem(LakeStore.sharedHconf)
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val files = JsonMethods.parse(txt).asInstanceOf[JObject].obj.toMap
      .apply("files").asInstanceOf[JObject].obj.map { case (n, slots) =>
        n -> slots.asInstanceOf[JArray].arr
          .map(_.asInstanceOf[JString].s).toArray
      }.toMap
    cache.synchronized { cache.put(abs, files) }
    files
  }

  /** Resolve an encoded stat: inline forms pass through; pointers load
    * their sidecar (LRU-shared) and index the slot. A missing sidecar
    * or slot fails LOUDLY — a statistics hole must never silently
    * undercount an NDV or skip a bloom. */
  def resolve(tableKey: String, enc: String): String =
    if (!isPointer(enc)) enc
    else {
      val body = enc.substring(PointerPrefix.length)
      val parts = body.split('#')
      require(parts.length == 3,
        s"graft_lake: malformed stats pointer '$enc' on $tableKey")
      val abs = LakeStore.resolveRaw(tableKey, parts(0))
      val slots = load(abs).getOrElse(parts(1),
        throw new IllegalStateException(
          s"graft_lake: stats sidecar ${parts(0)} of $tableKey has no " +
            s"entry for ${parts(1)} — the manifest points at statistics " +
            "that do not exist"))
      slots(parts(2).toInt)
    }
}
