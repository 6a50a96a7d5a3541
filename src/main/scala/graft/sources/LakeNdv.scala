package graft.sources

/** Per-file DISTINCT-VALUE sketches for the manifest — the NDV metric
  * Iceberg stores per column (`ndv` in its puffin/theta stats files,
  * what `ANALYZE TABLE` computes in Delta) re-expressed as a
  * K-MINIMUM-VALUES sketch:
  *
  *   - each value hashes to 64 bits (the same canonical byte form the
  *     bloom index uses, so INT 5 and BIGINT 5 agree);
  *   - a file's sketch is the K unsigned-smallest distinct hashes seen,
  *     plus a SATURATED flag. While the file holds fewer than K
  *     distinct values the sketch holds ALL of them — NDV is EXACT
  *     (the sketch is the distinct hash set itself);
  *   - sketches MERGE by set union (trim to the K unsigned-smallest) —
  *     associative and idempotent, so a table-level NDV is a fold over
  *     the manifest with zero data I/O, and file rewrites compose;
  *   - once saturated, the estimator is the classic KMV bottom-k:
  *     `ndv ~= (K-1) * 2^64 / kth_smallest_hash`, with relative
  *     standard error ~ 1/sqrt(K) (~3.1% at K=1024).
  *
  * Why KMV and not HLL: the exact-below-K property gives HASH-STABLE
  * answers for every low-cardinality column (enums, categories,
  * partitions keys — the columns CBO cares most about for join
  * estimation), and the merge is a set union a reader can verify.
  *
  * At 100 TB the sketch is what makes `ANALYZE`-quality statistics
  * free: every writer task already streams its rows once, the sketch
  * is O(K) memory per (file, column), and the table-level NDV any scan
  * hands to Catalyst ([[LakeScan.estimateStatistics]]) is a manifest
  * fold — never a COUNT(DISTINCT) over the data. */
object LakeNdv {

  /** Table property naming the sketched columns (logical names),
    * mirroring `graft.bloom.columns`. */
  val ColumnsProp = "graft.ndv.columns"

  /** Bottom-k size: 1024 longs = 8 KB per (file, column) before
    * base64; ~3.1% standard error once saturated. */
  val K = 1024

  def columnsOf(props: Map[String, String]): Seq[String] =
    props.get(ColumnsProp).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  /** 64-bit value hash over the bloom's canonical bytes (integral
    * widths collapse, doubles/floats collapse, strings are UTF-8). */
  def hash64(v: Any): Long = {
    val bs = LakeBloom.canonicalBytes(v)
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(bs, 0x2545f491)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(bs, 0x6a09e667)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  private val unsignedOrd: java.util.Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b)

  /** Write-side accumulator: the K unsigned-smallest distinct hashes.
    * Not thread-safe (one per open file per task, like the zone
    * accumulators). */
  final class Sketch {
    private val set = new java.util.TreeSet[java.lang.Long](unsignedOrd)
    private var sat = false
    def add(v: Any): Unit = {
      val h = hash64(v)
      if (set.size < K) { set.add(h); () }
      else if (java.lang.Long.compareUnsigned(h, set.last()) < 0) {
        if (set.add(h)) { set.remove(set.last()); sat = true }
      } else if (!set.contains(h)) sat = true
    }
    def saturated: Boolean = sat
    def encode: String = LakeNdv.encode(
      set.toArray(new Array[java.lang.Long](0)).map(_.longValue()), sat)
  }

  /** Serialized form: `E:`/`K:` prefix (exact / saturated bottom-k)
    * followed by base64 of the big-endian longs in unsigned order. */
  def encode(sorted: Array[Long], saturated: Boolean): String = {
    val bb = java.nio.ByteBuffer.allocate(sorted.length * 8)
    sorted.foreach(bb.putLong)
    (if (saturated) "K:" else "E:") +
      java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  /** (hashes in unsigned order, saturated). */
  def decode(s: String): (Array[Long], Boolean) = {
    val sat = s.startsWith("K:")
    require(sat || s.startsWith("E:"),
      s"graft_lake: unreadable ndv sketch prefix '${s.take(2)}'")
    val bytes = java.util.Base64.getDecoder.decode(s.substring(2))
    val bb = java.nio.ByteBuffer.wrap(bytes)
    (Array.fill(bytes.length / 8)(bb.getLong), sat)
  }

  private def toUnsignedDouble(x: Long): Double =
    if (x >= 0) x.toDouble else x.toDouble + 1.8446744073709552e19

  /** Merge two PARTIAL sketches of the SAME file into one file sketch
    * (the ANALYZE reduce step — executors each saw a slice of the
    * file's rows): bottom-K union, exact iff both inputs were exact AND
    * the union fits under K (a union spilling past K means the file
    * holds > K distinct values — saturated, trimmed to the true bottom
    * K, exactly what the writer's streaming Sketch would have said). */
  def mergeFileSketches(a: String, b: String): String = {
    val (ha, sa) = decode(a)
    val (hb, sb) = decode(b)
    val union = new java.util.TreeSet[java.lang.Long](unsignedOrd)
    ha.foreach(h => union.add(h))
    hb.foreach(h => union.add(h))
    if (!sa && !sb && union.size <= K)
      encode(union.toArray(new Array[java.lang.Long](0)).map(_.longValue()),
        saturated = false)
    else {
      val out = new Array[Long](math.min(K, union.size))
      val it = union.iterator()
      var i = 0
      while (i < out.length) { out(i) = it.next(); i += 1 }
      encode(out, saturated = true)
    }
  }

  /** Merge encoded file sketches into one table-level NDV.
    * Returns (ndv, exact): exact iff EVERY input was exact — their
    * union is then the full distinct hash set and its SIZE is the
    * answer (even above K; nothing is trimmed at merge time). With any
    * saturated input the union's K unsigned-smallest feed the KMV
    * estimator. Empty input = (0, exact). */
  def mergedNdv(encoded: Seq[String]): (Long, Boolean) = {
    if (encoded.isEmpty) return (0L, true)
    val decoded = encoded.map(decode)
    val allExact = decoded.forall(!_._2)
    val union = new java.util.TreeSet[java.lang.Long](unsignedOrd)
    decoded.foreach(_._1.foreach(h => union.add(h)))
    if (allExact) (union.size.toLong, true)
    else {
      // bottom-k of the union: every contributing sketch holds AT
      // LEAST the K smallest of its file, so the union's K smallest
      // are the true K smallest of the combined value set
      val it = union.iterator()
      var kth = 0L
      var i = 0
      while (i < K && it.hasNext) { kth = it.next(); i += 1 }
      if (i < K) (i.toLong, false) // defensive: cannot happen (a saturated input has K)
      else ((((K - 1).toDouble * 1.8446744073709552e19) / toUnsignedDouble(kth))
        .round, false)
    }
  }
}
