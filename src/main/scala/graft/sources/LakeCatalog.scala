package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{Column, Identifier, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource-V2 lakehouse CATALOG whose tables support the SQL
  * maintenance statements the reference surface lacks entirely and
  * every incremental corpus pipeline needs: `MERGE INTO` (p29), `UPDATE`
  * (p31), `DELETE FROM` (p32) — all planned by Catalyst's row-level
  * rewrites — plus snapshot TIME TRAVEL (`VERSION AS OF`, p33) and
  * `ALTER TABLE ADD COLUMN` schema evolution (p37): every committed
  * write pushes an immutable snapshot, Delta/Iceberg-style. Storage is
  * [[LakeStore]] — parquet file groups + a JSON commit log.
  *
  * Why a custom catalog at all: Spark 4 plans MERGE only against a V2
  * table whose [[SupportsRowLevelOperations]] contract it can rewrite
  * into joins + a replacement write (Catalyst's RewriteMergeIntoTable);
  * the built-in session catalog's parquet tables are V1 and reject the
  * statement outright. This catalog implements exactly that contract as
  * GROUP-BASED copy-on-write: the row-level operation's scan reads the
  * affected groups' FILES of the current snapshot, Catalyst's rewritten
  * plan computes carry-over + merged rows DISTRIBUTED (the join, clause
  * routing, and row construction all run as ordinary Spark operators
  * over the scan), the tasks write replacement parquet files, and the
  * commit swaps those groups' files atomically in the log.
  *
  * Group granularity IS the 100 TB scale lever, and both granularities
  * are implemented: an unpartitioned table is one group (every
  * statement rewrites the whole table — the simple correct baseline),
  * while a table created `PARTITIONED BY (identity cols)` gets
  * PARTITION-grouped copy-on-write with runtime group filtering — the
  * row-level scan implements [[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]]
  * on the partition columns, Catalyst's
  * RowLevelOperationRuntimeGroupFiltering derives the touched partitions
  * from the changeset at execution time (a dynamic-pruning subquery),
  * the scan emits only those groups' files, and the commit rewrites ONLY
  * the scanned groups' files (Iceberg's copy-on-write shape). Untouched
  * partitions are neither read nor rewritten — the property that keeps a
  * 10-partition-touching MERGE O(touched), not O(table).
  *
  * The MERGE semantics themselves (clause order, the four action kinds,
  * unmatched-row carry-over) are Catalyst's own — this file adds no
  * merge logic, which is the point: p29's oracle checks SPARK's merge
  * rewrite against DuckDB's relational restatement, not a hand-rolled
  * reimplementation.
  *
  * Supported value types: the atomic types the manifest round-trips
  * (integral/floating/boolean/string); nothing here limits the parquet
  * payload columns beyond what [[ZonePrune]] can skip on.
  */
object LakeTypes // scaladoc anchor only

/** Min/max ZONE-MAP file skipping — the Delta/Iceberg data-skipping
  * core: a comparison predicate over a column can rule a whole file
  * out when the file's value range cannot satisfy it. Skipping is a
  * pure OPTIMIZATION here, never a correctness lever: every pushed
  * predicate is also returned to Spark as residual, so an
  * unrecognized/unevaluable shape simply keeps the file (superset-
  * safe) and Spark's own Filter settles exact semantics. The per-file
  * min/max come from the MANIFEST ([[LakeStore.FileEntry.zones]],
  * recorded by the task that wrote the file) — planning never opens a
  * data file, the file-footer-statistics read path. */
private[sources] object ZonePrune {
  import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}

  /** A single-column compare this pruner understands. */
  final case class ColCompare(col: String, op: String, lits: Seq[Any])

  /** Split a pushed conjunction into its conjuncts (Spark usually
    * splits before pushdown; this keeps pruning live if a planner path
    * offers the AND whole). OR/NOT are left opaque — parse rejects
    * them, which is the superset-safe answer. */
  def conjuncts(p: V2Predicate): Seq[V2Predicate] = p match {
    case a: org.apache.spark.sql.connector.expressions.filter.And =>
      conjuncts(a.left()) ++ conjuncts(a.right())
    case other => Seq(other)
  }

  private val ops = Set("=", "<=>", "<", "<=", ">", ">=", "IN")

  def parse(p: V2Predicate): Option[ColCompare] = {
    if (!ops.contains(p.name())) return None
    val refs = p.children().collect {
      case r: NamedReference if r.fieldNames().length == 1 => r.fieldNames()(0)
    }
    val lits = p.children().collect { case l: Literal[_] => LakeStore.toStored(l.value()) }
    // exactly one bare column + at least one literal, nothing else.
    // Null-safe equality against a non-null literal IS equality for
    // range/bloom purposes — the SQL `INSERT OVERWRITE ... PARTITION
    // (p = v)` clause arrives as `<=>`. Against a NULL literal it is an
    // IS NULL seek: zones/blooms only describe NON-null values (a file
    // whose rows are all null has NO zone), so no file can ever be
    // skipped on it — refuse to parse, keeping every file.
    if (p.name() == "<=>" && lits.contains(null)) return None
    val op = if (p.name() == "<=>") "=" else p.name()
    if (refs.length == 1 && lits.nonEmpty && refs.length + lits.length == p.children().length)
      Some(ColCompare(refs.head, op, lits.toSeq))
    else None
  }

  /** Total order on the stored primitives we skip over; None = don't
    * know how to compare (never prune on it). */
  def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: java.lang.Number, y: java.lang.Number)
        if !x.isInstanceOf[java.lang.Double] && !x.isInstanceOf[java.lang.Float] &&
           !y.isInstanceOf[java.lang.Double] && !y.isInstanceOf[java.lang.Float] =>
      Some(java.lang.Long.compare(x.longValue(), y.longValue()))
    case (x: java.lang.Number, y: java.lang.Number) =>
      Some(java.lang.Double.compare(x.doubleValue(), y.doubleValue()))
    case (x: String, y: String) => Some(x.compareTo(y))
    case _ => None
  }

  /** Can a value in [min, max] satisfy `op lit`? Unknown comparisons
    * answer true (keep the file). */
  private def rangeMaySatisfy(min: Any, max: Any, op: String, lit: Any): Boolean = op match {
    case "=" => cmp(min, lit).forall(_ <= 0) && cmp(max, lit).forall(_ >= 0)
    case "<" => cmp(min, lit).forall(_ < 0)
    case "<=" => cmp(min, lit).forall(_ <= 0)
    case ">" => cmp(max, lit).forall(_ > 0)
    case ">=" => cmp(max, lit).forall(_ >= 0)
    case _ => true
  }

  /** File survival under one parsed compare, given the file's non-null
    * (min, max) zone for the column; None (all-null, or the column is
    * not stored in this file at all) cannot satisfy a null-rejecting
    * comparison, so the file is skipped. */
  def survives(zone: Option[(Any, Any)], cc: ColCompare): Boolean = zone match {
    case None => false
    case Some((mn, mx)) => cc.op match {
      case "IN" => cc.lits.exists(rangeMaySatisfy(mn, mx, "=", _))
      case op => cc.lits.headOption.forall(rangeMaySatisfy(mn, mx, op, _))
    }
  }
}

/** Public incremental-read + maintenance API over the lake's commit
  * log — the library surface a downstream pipeline calls to consume a
  * table INCREMENTALLY (Delta's CDF / Iceberg's incremental scan
  * shape) and to maintain its layout (OPTIMIZE): plan from commit
  * metadata which partitions commits (v1, v2] touched, then diff ONLY
  * those partitions between the two pinned snapshots. Untouched
  * partitions are neither planned nor read — the version-pinned scans
  * carry a partition-column IN predicate that [[ZonePrune]] skips at
  * the source. */
object GraftLake {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions.{coalesce, col, expr, lit, not, when}

  /** Partition tuples touched by DATA commits in (v1, v2], answered from
    * COMMIT METADATA alone (no data read); None = some commit in the
    * range rewrote the whole table, so only a full diff is sound.
    * Layout-only commits (OPTIMIZE) are invisible. */
  def changedPartitions(qualifiedKey: String, v1: Int, v2: Int): Option[Set[List[Any]]] =
    LakeStore.changedGroups(qualifiedKey, v1, v2)

  /** Partition tuples present in the CURRENT snapshot — the manifest's
    * partition listing (driver-side metadata read over the live file
    * set; not a distributed scan). */
  def livePartitions(qualifiedKey: String): Set[List[Any]] =
    LakeStore.get(qualifiedKey).getOrElse(
      throw new NoSuchTableException(qualifiedKey.split('.').toSeq)).liveGroups

  /** The table's commit-log directory — a stream of one JSON document
    * per commit, consumable with `readStream` as a change-data feed
    * (st14): new commits arrive as new files, in version order. */
  def commitLogDir(qualifiedKey: String): String =
    LakeStore.tableDir(qualifiedKey) + "/_log"

  /** Current latest snapshot version (driver-side metadata read). */
  def latestVersion(qualifiedKey: String): Int =
    LakeStore.get(qualifiedKey).getOrElse(
      throw new NoSuchTableException(qualifiedKey.split('.').toSeq)).latestVersion

  /** VACUUM: physically delete data files referenced only by history
    * older than the last `retainLast` versions (plus aborted-task
    * orphans — never-referenced files only once older than `graceMs`,
    * protecting in-flight writes), and gate time travel/diffs before
    * the horizon. Live reads and retained history are untouched — the
    * Delta retention operation. Returns (filesDeleted, horizonVersion). */
  def vacuum(qualifiedKey: String, retainLast: Int,
      graceMs: Long = LakeStore.orphanGraceMs): (Int, Int) =
    LakeStore.vacuum(qualifiedKey, retainLast, graceMs)

  /** RESTORE: roll the table back to `toVersion` as a new data-change
    * commit (Delta's `RESTORE TABLE`). Manifest-only — the old files
    * are re-pointed, never copied — and CDC sees the restore as the
    * row-level undo it is (its commit records exactly the groups whose
    * file sets differ). See [[LakeStore.restore]]. */
  def restore(qualifiedKey: String, toVersion: Int): Unit =
    LakeStore.restore(qualifiedKey, toVersion)

  /** PARTITION EVOLUTION: commit a new identity-partition spec as pure
    * metadata (Iceberg's `ALTER TABLE ... REPLACE PARTITION FIELD`
    * shape) — nothing is rewritten; old files keep their era's group
    * keys as coarser copy-on-write cohorts, new writes group under the
    * new spec, and scans/row-level statements prune BOTH eras through
    * group-envelope zones. See [[LakeStore.alterPartitionSpec]]. */
  def setPartitionSpec(qualifiedKey: String, cols: Seq[String]): Unit =
    LakeStore.alterPartitionSpec(qualifiedKey, cols)

  /** Shallow CLONE: `dstKey` becomes a new table whose first commit
    * references `srcKey`'s current files absolutely — zero bytes
    * copied, stats carried over; both tables then diverge
    * independently. See [[LakeStore.cloneTable]] (incl. the Delta-
    * documented source-VACUUM hazard). */
  def shallowClone(srcKey: String, dstKey: String): Unit =
    LakeStore.cloneTable(srcKey, dstKey)

  /** Create a writable BRANCH at (default) the current main head —
    * Iceberg refs: while the `graft.lake.branch` session conf names it,
    * every read and write of the table is branch-scoped; main is
    * untouched until [[publish]]. Returns the creation version. */
  def createBranch(qualifiedKey: String, name: String,
      at: Option[Int] = None): Int =
    LakeStore.createRef(qualifiedKey, name, "branch", at)

  /** Create an immutable TAG at (default) the current main head —
    * readable forever via `VERSION AS OF '<name>'`, refused as a write
    * target. Returns the creation version. */
  def createTag(qualifiedKey: String, name: String,
      at: Option[Int] = None): Int =
    LakeStore.createRef(qualifiedKey, name, "tag", at)

  /** FAST-FORWARD PUBLISH of a branch into main (write-audit-publish):
    * one data commit moves main to the branch head; refused with a
    * retryable conflict when main advanced past the fork base.
    * Returns (branchHeadVersion, publishVersion). */
  def publish(qualifiedKey: String, branch: String): (Int, Int) =
    LakeStore.publish(qualifiedKey, branch)

  /** Drop a branch or tag: one metadata-only tombstone — the name frees
    * immediately; the lineage's files age out with VACUUM. */
  def dropRef(qualifiedKey: String, name: String): Unit =
    LakeStore.dropRef(qualifiedKey, name)

  /** KEYED UPSERT through the equality-delete write path (Iceberg v2):
    * appends `df`'s rows and, in the SAME commit, an equality delete on
    * `keyCols` referencing those rows' own files — older rows with
    * matching keys die at read time through the sequence gate. Write
    * cost = append cost: nothing is read, nothing is rewritten (the
    * MERGE alternative pays a read of every matched partition). Scans
    * pay a bounded key-set probe until any OPTIMIZE/rewrite migrates
    * the table off the delete. */
  def upsert(df: org.apache.spark.sql.DataFrame, tableRef: String,
      keyCols: Seq[String]): Unit =
    df.writeTo(tableRef).option("graft.upsert.keys", keyCols.mkString(","))
      .append()

  /** Row-level CHANGES between snapshot v1 and v2 of `tableRef`
    * (qualified `catalog.table`, which is also its store key), keyed by
    * the unique `keyCol`: one row per inserted ('I'), deleted ('D'), or
    * updated ('U') key, carrying the key, the partition columns
    * (post-image, pre-image for deletes), and the class. Unchanged rows
    * are not emitted — CDC semantics.
    *
    * The scale contract: when every commit in (v1, v2] recorded its
    * touched groups and the table has a single partition column, both
    * version-pinned scans are filtered to the changed partitions — the
    * IN predicate reaches the scan as a pushed predicate and the zone
    * maps skip every untouched file, making the diff O(changed
    * partitions), not O(2 snapshots). A whole-table commit in the
    * range (or a multi-column partition key) falls back to the full
    * diff, which stays correct. The diff itself is one distributed
    * full-outer join on the key. */
  def changes(s: SparkSession, tableRef: String, v1: Int, v2: Int,
      keyCol: String): DataFrame = {
    val st = LakeStore.get(tableRef).getOrElse(
      throw new NoSuchTableException(tableRef.split('.').toSeq))
    LakeStore.requireReadable(tableRef, v1) // vacuumed history cannot diff
    val changed = changedPartitions(tableRef, v1, v2)
    // a diff can span an ALTER TABLE ADD COLUMN (or a RESTORE that
    // narrowed the schema): align both snapshots on the UNION of their
    // schemas, padding a side's missing columns with typed nulls —
    // exactly what the storage layer itself reports for pre-ALTER files.
    // Column IDENTITY across eras is the PHYSICAL name (column mapping):
    // a diff spanning a RENAME compares the same stored column under its
    // current logical name instead of flagging every carried row as U
    // (the column was dropped-and-added only in name).
    val s1 = st.snapshots(v1).schema
    val s2 = st.snapshots(v2).schema
    val curByPhys: Map[String, String] =
      s2.fields.iterator.map(f => LakeStore.physicalName(f) -> f.name).toMap
    def eraName(f: StructField): String =
      curByPhys.getOrElse(LakeStore.physicalName(f), f.name)
    val unioned = s2.fields ++ s1.fields.collect {
      case f if !s2.fieldNames.contains(eraName(f)) => f.copy(name = eraName(f))
    }
    def snap(v: Int): DataFrame = {
      val sv = st.snapshots(v).schema
      val renames = sv.fields.flatMap(f =>
        Some(eraName(f)).filter(_ != f.name).map(f.name -> _))
      val df = renames.foldLeft(s.sql(s"SELECT * FROM $tableRef VERSION AS OF $v")) {
        case (d, (o, n)) => d.withColumnRenamed(o, n)
      }
      // the changed-partition filter only applies when every touched
      // group key is single-column — a mixed-arity set (groups from
      // before a partition evolution) falls back to the full diff
      val filtered = (changed, st.partitionCols) match {
        case (Some(gs), Seq(pc)) if gs.forall(_.length == 1) &&
            LakeStore.isIdentitySpec(pc) =>
          df.filter(col(pc).isInCollection(gs.map(_.head)))
        case _ => df
      }
      val have = filtered.columns.toSet
      unioned.foldLeft(filtered) { (d, f) =>
        if (have.contains(f.name)) d else d.withColumn(f.name, lit(null).cast(f.dataType))
      }
    }
    val dataCols = unioned.map(_.name).toSeq.filterNot(_ == keyCol)
    val o = snap(v1).alias("o")
    val n = snap(v2).alias("n")
    val same = dataCols.map(c => col(s"o.$c") <=> col(s"n.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, col(s"o.$keyCol") === col(s"n.$keyCol"), "full_outer")
      .withColumn("change",
        when(col(s"n.$keyCol").isNull, lit("D"))
          .when(col(s"o.$keyCol").isNull, lit("I"))
          .when(not(same), lit("U")))
      .filter(col("change").isNotNull)
      .select(
        (coalesce(col(s"n.$keyCol"), col(s"o.$keyCol")).as(keyCol) +:
          st.partitionCols.filter(LakeStore.isIdentitySpec)
            .map(pc => coalesce(col(s"n.$pc"), col(s"o.$pc")).as(pc)) :+
          col("change")): _*)
  }

  /** OPTIMIZE: rewrite the table's live files range-CLUSTERED on
    * `clusterCol` into `nFiles` files (per partition group) — Delta's
    * `OPTIMIZE ... ZORDER BY` for the single-column case. Row data is
    * untouched; the commit is recorded `dataChange=false`, so CDC
    * readers skip it and time travel still sees every prior version.
    * The rewrite is one distributed range-shuffle: `repartitionByRange`
    * makes each output task own a contiguous value range, so the files
    * it writes get TIGHT zones — the property that turns a post-
    * optimize box predicate into an O(matching files) scan (p38 pins
    * this via [[LakeStore.lastScanStats]] before/after). */
  /** COPY INTO — idempotent file-level ingest (Delta's `COPY INTO`):
    * load every source file matching `pattern` that has NOT been
    * loaded before, where "before" is the table's ingest ledger — the
    * union of the per-commit `copyIds` sections every prior ingest
    * commit carries ([[LakeStore.TableState.copyLedger]]). The ledger
    * entry and the rows land in ONE commit: the ids ride the write
    * itself as a DSv2 option ([[LakeStore.CopyIdsOption]]) that the
    * write builder hands to its own commit — explicit plumbing bound
    * to ONE logical write whatever thread Spark commits on, so a
    * concurrent plain append structurally cannot steal it. A crash can
    * never ingest data without recording it, and re-running the same
    * COPY INTO after any failure is always safe. File identity is `name@size`: a re-staged
    * file with new content under the same name and size is (by the
    * Delta contract) the caller's problem — use a new name. At 100 TB
    * each ingest commit's log entry costs O(files in THAT ingest) —
    * commit-log growth is flat in ingest history, not O(all files ever
    * loaded) — and the skip decision is a driver-side set lookup per
    * listed file; the data path is an ordinary parallel parquet read +
    * lake append. Returns (files loaded, rows loaded). */
  def copyInto(s: SparkSession, tableRef: String, srcDir: String,
      pattern: String = "*.parquet"): (Int, Long) = {
    val st = LakeStore.get(tableRef).getOrElse(
      throw new NoSuchTableException(tableRef.split('.').toSeq))
    val fs = new Path(srcDir).getFileSystem(LakeStore.sharedHconf)
    // globStatus returns NULL (not empty) for a nonexistent directory
    val files = Option(fs.globStatus(new Path(srcDir, pattern)))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .filter(_.isFile).sortBy(_.getPath.getName)
    val loaded = st.copyLedger
    def fid(f: org.apache.hadoop.fs.FileStatus): String =
      s"${f.getPath.getName}@${f.getLen}"
    val fresh = files.filterNot(f => loaded(fid(f)))
    if (fresh.isEmpty) return (0, 0L)
    val df = s.read.parquet(fresh.map(_.getPath.toString).toIndexedSeq: _*)
      .select(st.schema.fieldNames.map(org.apache.spark.sql.functions.col(_)).toIndexedSeq: _*)
    val ids = fresh.map(fid).toSeq
    // the ids ride the WRITE itself (a DSv2 option the write builder
    // hands to its own commit) — one logical write owns its ledger from
    // option to commit, whatever thread Spark commits on
    df.writeTo(tableRef)
      .option(LakeStore.CopyIdsOption, LakeStore.encodeCopyIds(ids))
      .append()
    // report THIS ingest's commit — located by its own ledger section,
    // not the table head (a concurrent commit may already sit above it)
    val st2 = LakeStore.get(tableRef).get
    val v = st2.snapshots.lastIndexWhere(_.copyIds == ids)
    require(v >= 0, s"graft_lake: COPY INTO commit not found on $tableRef")
    (fresh.length, st2.addedAt(v).map(_.rows).sum)
  }

  /** ANALYZE — back-fill per-file NDV sketches for `cols` on every live
    * file (Iceberg's `ANALYZE TABLE` writing puffin stats; Delta's
    * ANALYZE computing column statistics): one distributed pass reads
    * ONLY the requested columns (plus the file-path metadata column),
    * folds a [[LakeNdv.Sketch]] per (file, column) on the executors
    * (partial sketches merge by bottom-k union — associative, so the
    * reduce is shuffle-cheap: K longs per file-column cross the wire,
    * never values), the merged sketches land as EXECUTOR-WRITTEN stats
    * sidecars ([[LakeStatsSidecar]] — the Iceberg puffin shape: the
    * driver collects ~60 B pointers, never the 8 KB-per-column
    * payloads), and ONE metadata-only commit attaches the pointers
    * AND sets `graft.ndv.columns`, so history is back-filled and every
    * future append sketches at write time — coverage stays complete,
    * which is what [[LakeScan.estimateStatistics]] requires before
    * reporting distinctCount to CBO (readers resolve pointers and
    * inline write-time sketches identically). Hashing uses the
    * writer's own canonical forms, so back-filled and write-time
    * sketches agree exactly. Returns (files analyzed, columns
    * sketched). */
  def analyzeTable(s: SparkSession, tableRef: String,
      cols: Seq[String], withBlooms: Boolean = false): (Int, Int) = {
    val st = LakeStore.get(tableRef).getOrElse(
      throw new NoSuchTableException(tableRef.split('.').toSeq))
    require(cols.nonEmpty, s"graft_lake: ANALYZE $tableRef needs columns")
    val phys = LakeStore.physicalMap(st.schema)
    cols.foreach { c =>
      require(st.schema.fieldNames.contains(c),
        s"graft_lake: ANALYZE column $c does not exist in $tableRef")
      val dt = st.schema(c).dataType
      // the external Row values this pass reads must hash to the SAME
      // canonical bytes the writer's stored forms do — true for these
      // types verbatim; datetimes/decimals arrive as java.sql/BigDecimal
      // objects whose bytes differ, so they sketch at write time only
      require((dt.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
            !dt.isInstanceOf[org.apache.spark.sql.types.DecimalType]) ||
          dt == org.apache.spark.sql.types.StringType ||
          dt == org.apache.spark.sql.types.BooleanType,
        s"graft_lake: ANALYZE $tableRef column $c has type " +
          s"${dt.simpleString} — only integral/float/string/boolean " +
          "columns back-fill (others sketch at write time via " +
          "graft.ndv.columns)")
    }
    if (st.current.isEmpty) {
      LakeStore.setFileStats(tableRef, Map.empty, cols,
        newBloomCols = if (withBlooms) cols else Nil)
      return (0, cols.length)
    }
    // read only files that physically store >= 1 requested column; a
    // file storing none (pre-ADD-COLUMN era) is all-null there, and an
    // all-null column's exact sketch is EMPTY — attach it driver-side
    // without streaming the file's rows through the scan at all
    val physCols = cols.map(c => phys.getOrElse(c, c))
    val emptySketch = LakeNdv.encode(Array.emptyLongArray, saturated = false)
    val bloomBits = LakeBloom.bitsOf(st.props)
    // the all-zero bloom ("never contains"): correct for a column the
    // file stores only nulls in — an equality probe cannot match null
    val emptyBloom = LakeBloom.encode(LakeBloom.newBits(bloomBits))
    def allNullStats(f: LakeStore.FileEntry) = (
      f.path -> physCols.map(_ -> emptySketch).toMap,
      f.path -> physCols.map(_ -> emptyBloom).toMap)
    val readable = st.current.filter(f => physCols.exists(f.cols.contains))
    if (readable.isEmpty) {
      val (nm, bm) = st.current.map(allNullStats).unzip
      LakeStore.setFileStats(tableRef, nm.toMap, cols,
        bloomsByPath = if (withBlooms) bm.toMap else Map.empty,
        newBloomCols = if (withBlooms) cols else Nil)
      return (st.current.length, cols.length)
    }
    val df = s.read
      .schema(org.apache.spark.sql.types.StructType(
        cols.map(c => st.schema(c).copy(name = phys.getOrElse(c, c)))))
      .parquet(readable.map(f => LakeStore.resolvePath(tableRef, f)): _*)
      .select(org.apache.spark.sql.functions.col("_metadata.file_path")
        .as("__file") +: physCols.map(org.apache.spark.sql.functions.col): _*)
    val nCols = physCols.length
    val blooms = withBlooms // stable capture for the task closure
    // encoded partial per (file): nCols sketch slots, then (optionally)
    // nCols bloom slots — merged slot-wise (bottom-k union / bit OR)
    val partials = df.rdd.mapPartitions { it =>
      val sAcc = scala.collection.mutable.HashMap
        .empty[String, Array[LakeNdv.Sketch]]
      val bAcc = scala.collection.mutable.HashMap
        .empty[String, Array[Array[Long]]]
      it.foreach { r =>
        val f = r.getString(0)
        val sks = sAcc.getOrElseUpdate(f, Array.fill(nCols)(new LakeNdv.Sketch))
        val bts = if (blooms) bAcc.getOrElseUpdate(f,
          Array.fill(nCols)(LakeBloom.newBits(bloomBits))) else null
        var i = 0
        while (i < nCols) {
          val v = r.get(i + 1)
          if (v != null) {
            sks(i).add(v)
            if (blooms) LakeBloom.add(bts(i), v)
          }
          i += 1
        }
      }
      sAcc.iterator.map { case (f, sks) =>
        f -> (sks.map(_.encode) ++
          (if (blooms) bAcc(f).map(LakeBloom.encode) else Array.empty[String]))
      }
    }.reduceByKey((a, b) => a.indices.toArray.map(i =>
      if (i < nCols) LakeNdv.mergeFileSketches(a(i), b(i))
      else LakeBloom.merge(a(i), b(i))),
      // bound the reduce fan-in: one sidecar per REDUCE partition, so a
      // 1,000-split scan must not scatter 1,000 one-file sidecars the
      // reader-side LRU can never hold — 8 sidecars per ANALYZE keeps
      // every later planning pass at <= 8 opens, all cache-resident
      numPartitions = 8)
    // `_metadata.file_path` is a URI (file://...); match manifest
    // entries by data-file NAME — uuid-unique per table, scheme-proof
    def nameOf(p: String): String = p.substring(p.lastIndexOf('/') + 1)
    // the Iceberg-puffin landing: each REDUCE task writes its merged
    // (file -> slots) map as ONE stats sidecar in the table's data dir
    // and ships back only (fileName -> sidecar) pointers — the driver
    // never holds sketch payloads, so its memory per ANALYZE is bounded
    // by file NAMES (assembly) and the commit carries ~60 B pointers
    // instead of 8 KB-per-column blobs
    val dataDir = LakeStore.dataDir(tableRef)
    val pointerPairs = partials.mapPartitions { it =>
      val entries = it.map { case (abs, slots) =>
        abs.substring(abs.lastIndexOf('/') + 1) -> slots }.toMap
      if (entries.isEmpty) Iterator.empty
      else {
        val rel = LakeStatsSidecar.write(dataDir, entries)
        entries.keysIterator.map(n => n -> rel)
      }
    }.collect()
    val sidecarOf: Map[String, String] = pointerPairs.toMap
    LakeStore.lastAnalyzeStats.update(tableRef, LakeStore.AnalyzeStats(
      filesAnalyzed = st.current.length,
      sidecarsWritten = sidecarOf.values.toSet.size,
      driverBytesCollected =
        pointerPairs.iterator.map { case (n, r) => n.length + r.length }.sum.toLong))
    val statsByPath = st.current.iterator.map { f =>
      val side = sidecarOf.get(nameOf(LakeStore.resolvePath(tableRef, f)))
      def slot(i: Int, empty: String): String = side match {
        case Some(rel) => LakeStatsSidecar.pointer(rel,
          nameOf(LakeStore.resolvePath(tableRef, f)), i)
        case None => empty // file contributed no rows: all-null there
      }
      // columns the file does not physically store are all-null THERE:
      // exact empty sketch / zero bloom (never wrong, keeps coverage)
      val ndv = physCols.zipWithIndex.map { case (c, i) =>
        c -> (if (f.cols.contains(c)) slot(i, emptySketch) else emptySketch)
      }.toMap
      val blm =
        if (!withBlooms) Map.empty[String, String]
        else physCols.zipWithIndex.map { case (c, i) =>
          c -> (if (f.cols.contains(c)) slot(nCols + i, emptyBloom) else emptyBloom)
        }.toMap
      (f.path -> ndv, f.path -> blm)
    }.toVector
    LakeStore.setFileStats(tableRef, statsByPath.map(_._1).toMap, cols,
      bloomsByPath =
        if (withBlooms) statsByPath.map(_._2).toMap else Map.empty,
      newBloomCols = if (withBlooms) cols else Nil)
    (st.current.length, cols.length)
  }

  def optimize(s: SparkSession, tableRef: String, clusterCol: String,
      nFiles: Int): Unit =
    optimize(s, tableRef, Seq(clusterCol), nFiles)

  /** Multi-column OPTIMIZE — Delta's `OPTIMIZE ... ZORDER BY (c1, c2,
    * ...)`: rows are clustered along the MORTON (Z-)curve of the
    * cluster columns, so each rewritten file owns a TILE of the
    * multi-dimensional space and a box predicate selective in several
    * dimensions prunes on ALL of them (single-column clustering only
    * ever prunes its own axis — q94 quantifies the gap: the same 2-D
    * box touches 5 z-order tiles vs 17 x-sorted ones at 64 files).
    *
    * Scale shape: each column is normalized to a 16-bit rank with pure
    * integer arithmetic off its MANIFEST-zone global min/max (driver
    * metadata — no planning scan), the interleave is a codegen'd
    * shift/mask fold (q94's spelling), and the rewrite is ONE
    * distributed range-shuffle on the morton value — no global sort,
    * no window, no collect. The commit is dataChange=false: time
    * travel sees every prior version, CDC readers see nothing. */
  def optimize(s: SparkSession, tableRef: String, clusterCols: Seq[String],
      nFiles: Int): Unit = {
    require(clusterCols.nonEmpty, "graft_lake: OPTIMIZE needs >= 1 cluster column")
    require(clusterCols.length <= 4,
      "graft_lake: OPTIMIZE supports at most 4 z-order columns (16 bits each)")
    val sortKey =
      if (clusterCols.length == 1) col(clusterCols.head)
      else {
        val st = LakeStore.get(tableRef).getOrElse(
          throw new NoSuchTableException(tableRef.split('.').toSeq))
        val k = clusterCols.length
        // zones are keyed by PHYSICAL column name (column mapping); the
        // rank expression itself stays on the logical name — that is
        // what the scan serves
        val phys = LakeStore.physicalMap(st.schema)
        clusterCols.zipWithIndex.map { case (c, ci) =>
          val zs = st.current.flatMap(_.zones.get(phys.getOrElse(c, c)))
          val nums = zs.flatMap { case (mn, mx) => Seq(mn, mx) }
            .collect { case n: java.lang.Number => n.longValue() }
          require(nums.nonEmpty,
            s"graft_lake: ZORDER column $c has no numeric zones to normalize against")
          val (mn, mx) = (nums.min, nums.max)
          // integer rank in [0, 65535]: (c - mn) div ceil(span / 2^16) —
          // overflow-free for any Long span
          val div = math.max(1L, (mx - mn) / 65536L + 1L)
          val rank = s"((`$c` - ${mn}L) div ${div}L)"
          (0 until 16).map(i =>
            expr(s"shiftleft(shiftright($rank, $i) & 1, ${i * k + ci})"))
            .reduce(_ + _)
        }.reduce(_ + _)
      }
    val df = s.table(tableRef).repartitionByRange(nFiles, sortKey)
    // the layout-only marker rides THIS write (option -> commit, like
    // COPY INTO's ledger ids) — a table-keyed "next replace" flag was
    // stealable by a concurrent row-level replace, mislabeling it
    // dataChange=false and opening a lost-update window. The value is a
    // minted one-shot nonce: the option is internal, an ordinary write
    // setting it is rejected at the builder.
    df.writeTo(tableRef)
      .option(LakeStore.LayoutOnlyOption, LakeStore.mintLayoutNonce())
      .overwrite(lit(true))
  }

  /** SIZE-AWARE INCREMENTAL COMPACTION — Delta OPTIMIZE's small-file
    * bin-packing shape: pick, from the MANIFEST alone (per-file
    * `bytes`, no filesystem listing), the partition groups holding at
    * least `minInputFiles` files under `maxFileBytes`, and rewrite ONLY
    * those groups through the partition-scoped replaceWhere path. A
    * 100 TB table with a small-file problem in last hour's partitions
    * compacts exactly those partitions — the full-table [[optimize]]
    * would rewrite everything, which is the difference between a
    * maintenance job that scales with the PROBLEM and one that scales
    * with the table. The rewrite is layout-only (dataChange=false: time
    * travel keeps every prior version, the change feed sees nothing),
    * reads resolve deletion vectors and equality deletes for the
    * compacted groups (the commit prunes their entries — compaction
    * pays the delete debt down exactly where it rewrites), and
    * untouched groups' files are not moved, reread, or re-stamped.
    * Returns (groupsCompacted, filesRemoved). Limited to single-column
    * identity specs — the selection must be expressible as the
    * group-exact IN predicate replaceWhere validates; transform or
    * multi-column layouts take the full [[optimize]]. */
  def compact(s: SparkSession, tableRef: String, maxFileBytes: Long,
      minInputFiles: Int = 2): (Int, Int) = {
    require(minInputFiles >= 2,
      "graft_lake: compaction needs minInputFiles >= 2 (one file is already compact)")
    val st = LakeStore.get(tableRef).getOrElse(
      throw new NoSuchTableException(tableRef.split('.').toSeq))
    val pc = st.partitionCols
    require(pc.length == 1 && LakeStore.isIdentitySpec(pc.head),
      s"graft_lake: incremental compaction needs a single identity partition " +
        s"column on $tableRef; use optimize() for other layouts")
    val smallGroups = st.current.groupBy(_.group).collect {
      case (g, fs) if fs.count(f => f.bytes < maxFileBytes) >= minInputFiles => g
    }.toSet
    if (smallGroups.isEmpty) return (0, 0)
    val values = smallGroups.map(_.head).toSeq
    val removedCount = st.current.count(f => smallGroups.contains(f.group))
    val pred = col(pc.head).isin(values: _*)
    // route each compacted group to one task -> one output file per
    // group (the writer opens per-group files within a task)
    val df = s.table(tableRef).where(pred)
      .repartition(smallGroups.size, col(pc.head))
    df.writeTo(tableRef)
      .option(LakeStore.LayoutOnlyOption, LakeStore.mintLayoutNonce())
      .overwrite(pred)
    (smallGroups.size, removedCount)
  }
}

class GraftLakeCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {
  import org.apache.spark.sql.connector.catalog.StagedTable
  private var catalogName: String = _

  /** `CALL graft_lake.system.<proc>(...)` — the maintenance operations
    * as SQL with result sets ([[LakeProcedures]]). */
  override def loadProcedure(ident: Identifier):
      org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    LakeProcedures.load(catalogName, ident)
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    LakeProcedures.identifiers(namespace)

  /** The partition-transform FUNCTION CATALOG ([[LakeFunctions]] —
    * Iceberg's SystemFunctions pattern): Catalyst loads `bucket`/`days`/
    * ... from here to resolve a transform-partitioned scan's
    * `KeyGroupedPartitioning` (storage-partitioned joins over hidden
    * partitioning), and `SELECT graft_lake.bucket(8, id)` makes the
    * writer's routing SQL-auditable. Served at the root namespace. */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) LakeFunctions.names.map(Identifier.of(namespace, _))
    else Array.empty
  override def loadFunction(ident: Identifier):
      org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    (if (ident.namespace().isEmpty) LakeFunctions.load(ident.name()) else None)
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident))

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  /** Opt in to Spark 4's native DDL surface for column DEFAULTs
    * (`c STRING DEFAULT 'x'` — the analyzer fills omitted columns on
    * INSERT from the metadata this catalog persists), GENERATED ALWAYS
    * AS expressions (Spark validates the expression at CREATE; the
    * WRITER computes/enforces it — [[LakeDerivedColumns]]), and
    * IDENTITY columns (writer-assigned, manifest-zone high-water mark). */
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  private def k(ident: Identifier): String = LakeStore.key(catalogName, ident)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    // store keys are catalog.ns1.ns2.name — honor the requested namespace
    // so SHOW TABLES IN graft_lake.ns lists only that namespace's tables
    val prefix = (catalogName +: namespace.toSeq).mkString(".") + "."
    LakeStore.list(catalogName)
      .filter(full => full.startsWith(prefix) &&
        !full.stripPrefix(prefix).contains('.'))
      .map(full => Identifier.of(namespace, full.stripPrefix(prefix)))
      .toArray
  }

  override def loadTable(ident: Identifier): Table =
    LakeStore.get(k(ident)) match {
      case Some(st) => new GraftLakeTable(k(ident), st.schema)
      case None =>
        // Iceberg-style METADATA TABLES: `SELECT * FROM <table>.history`
        // / `<table>.files` — the suffixed identifier resolves here with
        // the real table as its namespace. A real table always shadows
        // (checked above), so a user table literally named `history`
        // still wins.
        val kind = ident.name()
        val suffixed = LakeMetaTable.kinds.contains(kind) || kind == LakeChangesTable.Kind
        if (suffixed && ident.namespace().nonEmpty) {
          val parentKey = (catalogName +: ident.namespace().toSeq).mkString(".")
          if (LakeStore.get(parentKey).isDefined) {
            if (kind == LakeChangesTable.Kind) new LakeChangesTable(parentKey)
            else new LakeMetaTable(parentKey, kind)
          } else throw new NoSuchTableException(
            Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name())
        } else throw new NoSuchTableException(
          Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name())
    }

  /** `VERSION AS OF v` time travel: the same table pinned to snapshot v,
    * read with THAT version's schema (pre-ALTER versions surface their
    * own narrower schema, like Delta). */
  override def loadTable(ident: Identifier, version: String): Table =
    LakeStore.get(k(ident)) match {
      case Some(st) =>
        // a non-numeric version is a NAMED REF: `VERSION AS OF 'audit'`
        // reads a branch or tag head (Iceberg's ref time travel)
        val v = try version.toInt catch {
          case _: NumberFormatException =>
            val h = st.headOf(version)
            require(h >= 0, s"graft_lake: version '$version' of ${k(ident)} " +
              "is neither a snapshot index nor a named ref")
            h
        }
        require(v >= 0 && v <= st.latestVersion,
          s"graft_lake: version $v out of range [0, ${st.latestVersion}] for ${k(ident)}")
        LakeStore.requireReadable(k(ident), v) // vacuumed history is gated loudly
        new GraftLakeTable(k(ident), st.snapshots(v).schema, pinnedVersion = Some(v))
      case None => throw new NoSuchTableException(
        Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name())
    }

  /** `TIMESTAMP AS OF` time travel: resolved against the commit log's
    * own timestamps ([[LakeStore.versionAt]]) to the snapshot live at
    * that instant, then served exactly like `VERSION AS OF`. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val key = k(ident)
    val v = LakeStore.versionAt(key, timestamp)
    LakeStore.requireReadable(key, v)
    val st = LakeStore.get(key).get
    new GraftLakeTable(key, st.snapshots(v).schema, pinnedVersion = Some(v))
  }

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    // v2ColumnsToStructType persists DEFAULT / generation-expression /
    // identity specs as StructField metadata, which the commit log's
    // schema JSON round-trips — the analyzer reads defaults back from
    // there on every INSERT, the writer reads the derived-column specs
    createTable(ident,
      org.apache.spark.sql.connector.catalog.GraftCatalogBridge.v2ColumnsToStructType(columns),
      partitions, properties)

  /** Partition transforms: identity columns, plus Iceberg-style HIDDEN
    * PARTITIONING — `days(ts)` and `bucket(N, col)`; each distinct
    * derived-key tuple is one copy-on-write group; no partitions = one
    * whole-table group. Rendered to the raw spec strings the commit
    * log stores ([[LakeStore.parsePart]] is the inverse). */
  private def identityCols(partitions: Array[Transform]): Seq[String] =
    partitions.toSeq.map { t =>
      def ref(a: org.apache.spark.sql.connector.expressions.Expression): String = a match {
        case r: org.apache.spark.sql.connector.expressions.NamedReference =>
          require(r.fieldNames().length == 1,
            s"graft_lake: nested partition columns unsupported: $r")
          r.fieldNames()(0)
        case other => throw new IllegalArgumentException(
          s"graft_lake: unsupported partition argument $other")
      }
      t.name() match {
        case "identity" =>
          require(t.arguments().length == 1,
            s"graft_lake: bad identity transform $t")
          ref(t.arguments()(0))
        case fn @ ("days" | "hours" | "months" | "years") =>
          require(t.arguments().length == 1,
            s"graft_lake: bad $fn transform $t")
          s"$fn(${ref(t.arguments()(0))})"
        case "truncate" =>
          val w = t.arguments().collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              l.value().toString.toInt
          }.getOrElse(throw new IllegalArgumentException(
            s"graft_lake: truncate transform needs a width: $t"))
          val c = t.arguments().collectFirst {
            case r: org.apache.spark.sql.connector.expressions.NamedReference => ref(r)
          }.getOrElse(throw new IllegalArgumentException(
            s"graft_lake: truncate transform needs a column: $t"))
          s"truncate($w, $c)"
        case "bucket" =>
          val n = t.arguments().collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              l.value().toString.toInt
          }.getOrElse(throw new IllegalArgumentException(
            s"graft_lake: bucket transform needs a bucket count: $t"))
          val c = t.arguments().collectFirst {
            case r: org.apache.spark.sql.connector.expressions.NamedReference => ref(r)
          }.getOrElse(throw new IllegalArgumentException(
            s"graft_lake: bucket transform needs a column: $t"))
          s"bucket($n, $c)"
        case other => throw new IllegalArgumentException(
          s"graft_lake: unsupported partition transform $other (identity, " +
            "days, bucket)")
      }
    }

  /** Keep the user-intent properties (graft.* — merge-on-read switch,
    * constraints); Spark adds bookkeeping keys (provider, owner) that
    * are not table state here. */
  private def keepGraftProps(properties: util.Map[String, String]): Map[String, String] = {
    val it = properties.entrySet().iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next()
      if (e.getKey.startsWith("graft.")) b += e.getKey -> e.getValue }
    b.result()
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (!LakeStore.create(k(ident), schema, identityCols(partitions),
        keepGraftProps(properties)))
      throw new TableAlreadyExistsException(
        Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name())
    new GraftLakeTable(k(ident), schema)
  }

  // --------------------------------------------- staged CREATE/REPLACE

  /** `CREATE OR REPLACE TABLE ... AS SELECT` (and REPLACE / atomic CTAS):
    * the staged query writes its files FIRST, invisible to readers, and
    * [[LakeStagedTable.commitStagedChanges]] lands everything — schema,
    * partition spec, properties, data — as ONE commit. On an existing
    * table that commit is a history-PRESERVING "replace" (time travel to
    * pre-replace versions keeps working — the Delta CREATE OR REPLACE
    * contract); a failed query aborts by sweeping its own files, the
    * table never sees an intermediate state. */
  override def stageCreate(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable =
    staged(ident, info, mustExist = Some(false))
  override def stageReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable =
    staged(ident, info, mustExist = Some(true))
  override def stageCreateOrReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable =
    staged(ident, info, mustExist = None)

  private def staged(ident: Identifier, info: org.apache.spark.sql.connector.catalog.TableInfo,
      mustExist: Option[Boolean]): StagedTable = {
    val key = k(ident)
    val exists = LakeStore.get(key).isDefined
    mustExist match {
      case Some(true) if !exists => throw new NoSuchTableException(
        Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name())
      case Some(false) if exists => throw new TableAlreadyExistsException(
        Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name())
      case _ => ()
    }
    val schema = org.apache.spark.sql.connector.catalog.GraftCatalogBridge
      .v2ColumnsToStructType(info.columns())
    new LakeStagedTable(key, schema, identityCols(info.partitions()),
      keepGraftProps(info.properties()))
  }

  /** Schema evolution: `ALTER TABLE ... ADD COLUMN(S)` appends nullable
    * top-level columns. The commit is metadata-only (dataChange=false,
    * same live files); files written before the ALTER simply lack the
    * column in their manifest `cols`, and the reader pads null — the
    * `mergeSchema` read behavior, resolved from the manifest instead of
    * parquet footers.
    *
    * `SET/UNSET TBLPROPERTIES` is the property-commit path, and
    * `graft.constraints.<name>` properties are CHECK constraints (the
    * Delta shape — `delta.constraints.*`): adding one first validates
    * the expression AGAINST THE TABLE (unknown columns / bad syntax
    * fail analysis; a single distributed count rejects a constraint the
    * existing rows already violate — nothing is committed on failure),
    * and every subsequent write enforces it task-side
    * ([[LakeConstraints]]). Anything else (drop/rename/retype) is
    * rejected loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val key = k(ident)
    val st = LakeStore.get(key).getOrElse(throw new NoSuchTableException(
      Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name()))
    var schema = st.schema
    var props = st.props
    changes.foreach {
      case rn: TableChange.RenameColumn =>
        // COLUMN MAPPING (Delta's `name` mode): the rename touches only
        // the LOGICAL name; the column's physical (parquet) name is
        // pinned at birth in field metadata, so zero data files move
        // and readers of any era translate through the schema itself
        require(rn.fieldNames().length == 1,
          s"graft_lake: nested RENAME COLUMN unsupported: ${rn.fieldNames().mkString(".")}")
        val oldName = rn.fieldNames()(0)
        require(schema.fieldNames.contains(oldName),
          s"graft_lake: column $oldName does not exist")
        require(!schema.fieldNames.contains(rn.newName()),
          s"graft_lake: column ${rn.newName()} already exists")
        require(!st.partitionCols.exists(r => LakeStore.parsePart(r).col == oldName),
          s"graft_lake: cannot rename partition column $oldName (evolve the " +
            "partition spec first)")
        // stored EXPRESSION TEXTS (constraints, generation expressions)
        // reference logical names; a rename would silently break them
        val exprTexts =
          props.collect { case (pk, pv) if pk.startsWith(LakeConstraints.prefix) => pv } ++
            props.get(LakeBloom.ColumnsProp).toSeq ++
            props.get(LakeNdv.ColumnsProp).toSeq ++
            schema.fields.flatMap(f => org.apache.spark.sql.catalyst.util
              .GeneratedColumn.getGenerationExpression(f))
        val word = ("(?i)(?<![A-Za-z0-9_`])" +
          java.util.regex.Pattern.quote(oldName) + "(?![A-Za-z0-9_])").r
        require(!exprTexts.exists(t => word.findFirstIn(t).isDefined),
          s"graft_lake: cannot rename $oldName — a CHECK constraint, " +
            "generation expression, or bloom/ndv index references it; " +
            "drop/recreate that first")
        val i = schema.fieldIndex(oldName)
        val f = schema(i)
        val newMeta = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putString(LakeStore.PhysicalKey, LakeStore.physicalName(f))
          .build()
        schema = StructType(schema.fields.updated(i,
          f.copy(name = rn.newName(), metadata = newMeta)))
      case del: TableChange.DeleteColumn =>
        // DROP COLUMN as pure metadata (the operation Delta gates on
        // column mapping): the field leaves the LOGICAL schema, data
        // files keep the physical column untouched — readers simply
        // never request it again, and time travel to a pre-drop version
        // still reads it through that era's own snapshot schema
        require(del.fieldNames().length == 1,
          s"graft_lake: nested DROP COLUMN unsupported: ${del.fieldNames().mkString(".")}")
        val name = del.fieldNames()(0)
        if (!schema.fieldNames.contains(name)) {
          require(del.ifExists(), s"graft_lake: column $name does not exist")
        } else {
          require(schema.fields.length > 1,
            s"graft_lake: cannot drop $name — it is the table's only column")
          require(!st.partitionCols.exists(r => LakeStore.parsePart(r).col == name),
            s"graft_lake: cannot drop partition column $name (evolve the " +
              "partition spec first)")
          // stored EXPRESSION TEXTS name logical columns; a drop that a
          // constraint / OTHER column's generation expression / bloom
          // config still references would break them silently
          val exprTexts =
            props.collect { case (pk, pv) if pk.startsWith(LakeConstraints.prefix) => pv } ++
              props.get(LakeBloom.ColumnsProp).toSeq ++
              schema.fields.filterNot(_.name == name)
                .flatMap(f => org.apache.spark.sql.catalyst.util
                  .GeneratedColumn.getGenerationExpression(f))
          val word = ("(?i)(?<![A-Za-z0-9_`])" +
            java.util.regex.Pattern.quote(name) + "(?![A-Za-z0-9_])").r
          require(!exprTexts.exists(t => word.findFirstIn(t).isDefined),
            s"graft_lake: cannot drop $name — a CHECK constraint, generation " +
              "expression or bloom config references it; drop that first")
          schema = StructType(schema.fields.filterNot(_.name == name))
        }
      case up: TableChange.UpdateColumnType =>
        // TYPE WIDENING (Delta's type-widening feature): lossless
        // promotions only, metadata-only — old files keep their narrow
        // physical type and the reader up-casts (zones compare
        // numerically across boxes; blooms canonicalize every integral
        // to long bytes and floats through double bits, so both
        // skipping levers stay exact across the widening)
        import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType,
          IntegerType, LongType, ShortType}
        require(up.fieldNames().length == 1,
          s"graft_lake: nested ALTER COLUMN unsupported: ${up.fieldNames().mkString(".")}")
        val upName = up.fieldNames()(0)
        require(schema.fieldNames.contains(upName),
          s"graft_lake: column $upName does not exist")
        val from = schema(upName).dataType
        val to = up.newDataType()
        val widens = (from, to) match {
          case (ByteType, ShortType | IntegerType | LongType) => true
          case (ShortType, IntegerType | LongType) => true
          case (IntegerType, LongType) => true
          case (FloatType, DoubleType) => true
          case _ => false
        }
        require(widens,
          s"graft_lake: cannot change $upName from ${from.simpleString} to " +
            s"${to.simpleString} — only lossless widenings " +
            "(byte->short->int->long, float->double) are metadata-safe")
        require(!st.partitionCols.exists(r => LakeStore.parsePart(r).col == upName),
          s"graft_lake: cannot widen partition column $upName — group keys " +
            "are typed per era (evolve the partition spec first)")
        val ui = schema.fieldIndex(upName)
        schema = StructType(schema.fields.updated(ui,
          schema(ui).copy(dataType = to)))
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          s"graft_lake: nested ADD COLUMN unsupported: ${add.fieldNames().mkString(".")}")
        require(add.position() == null,
          "graft_lake: positioned ADD COLUMN unsupported (columns append at the end)")
        require(add.isNullable,
          "graft_lake: added columns must be nullable (existing files pad null)")
        val addName = add.fieldNames()(0)
        require(!schema.fieldNames.contains(addName),
          s"graft_lake: column $addName already exists")
        // column-mapping re-add safety: the new column's PHYSICAL name
        // must collide with nothing a live file already stores and no
        // current field already claims — re-adding a dropped column (or
        // a renamed column's birth name) must read NULL everywhere, not
        // resurrect the old column's stale bytes
        val takenPhysical = schema.fields.map(LakeStore.physicalName).toSet
        val inLiveFiles = (c: String) => st.current.exists(_.cols.contains(c))
        val field = StructField(addName, add.dataType(), add.isNullable)
        schema = schema.add(
          if (!takenPhysical.contains(addName) && !inLiveFiles(addName)) field
          else {
            val fresh = Iterator.from(st.latestVersion + 1)
              .map(v => s"${addName}_g$v")
              .find(c => !takenPhysical.contains(c) && !inLiveFiles(c)).get
            field.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
              .putString(LakeStore.PhysicalKey, fresh).build())
          })
      case set: TableChange.SetProperty =>
        if (set.property().startsWith(LakeConstraints.prefix))
          LakeConstraints.validateNew(key, set.property(), set.value())
        props = props.updated(set.property(), set.value())
      case rm: TableChange.RemoveProperty =>
        props = props - rm.property() // DROP CONSTRAINT when prefixed
      case other => throw new UnsupportedOperationException(
        s"graft_lake: unsupported ALTER TABLE change $other")
    }
    if (schema ne st.schema) LakeStore.alterSchema(key, schema)
    if (props != st.props) LakeStore.setProperties(key, props)
    new GraftLakeTable(key, schema)
  }

  override def dropTable(ident: Identifier): Boolean = LakeStore.drop(k(ident))

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft_lake: RENAME TABLE not supported")
}

/** The staging handle behind atomic CTAS / REPLACE / CREATE OR REPLACE:
  * the query's tasks write real parquet through the SAME task-side
  * writer as every other lake write (constraints, derived columns,
  * blooms all enforced — compiled from the STATEMENT's definition, not
  * the store's), into the table's data dir, but NO manifest references
  * them until [[commitStagedChanges]] — staged data is invisible by
  * construction, and an abort sweeps exactly the staged files. */
class LakeStagedTable(key: String, stagedSchema: StructType,
    partitionCols: Seq[String], tableProps: Map[String, String])
    extends org.apache.spark.sql.connector.catalog.StagedTable with SupportsWrite {

  // staged task outputs, collected driver-side at batch commit
  private val stagedFiles = scala.collection.mutable.ArrayBuffer.empty[LakeStore.FileEntry]

  locally { // tasks need the data dir before the first write
    val p = new Path(LakeStore.dataDir(key))
    p.getFileSystem(LakeStore.sharedHconf).mkdirs(p)
  }

  override def name(): String = s"$key (staged)"
  override def schema(): StructType = stagedSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      // the staged table is empty by construction: truncate = append
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
            new LakeWriterFactory(LakeStore.dataDir(key), info.schema(), partitionCols,
              LakeConstraints.compileProps(tableProps, info.schema(), key),
              LakeDerivedColumns.compile(key, stagedSchema),
              LakeBloom.columnsOf(tableProps), LakeBloom.bitsOf(tableProps),
              LakeStore.physicalMap(stagedSchema),
              ndvCols = LakeNdv.columnsOf(tableProps))
          override def commit(messages: Array[WriterCommitMessage]): Unit =
            stagedFiles ++= messages.iterator.filter(_ != null)
              .map(_.asInstanceOf[LakeCommit]).flatMap(_.files.iterator)
          override def abort(messages: Array[WriterCommitMessage]): Unit =
            sweep(messages.iterator.filter(_ != null)
              .map(_.asInstanceOf[LakeCommit]).flatMap(_.files.iterator).toSeq)
        }
      }
    }

  override def commitStagedChanges(): Unit =
    LakeStore.commitStaged(key, stagedSchema, partitionCols, tableProps,
      stagedFiles.toSeq)

  override def abortStagedChanges(): Unit = sweep(stagedFiles.toSeq)

  private def sweep(files: Seq[LakeStore.FileEntry]): Unit = {
    val fs = new Path(LakeStore.dataDir(key)).getFileSystem(LakeStore.sharedHconf)
    files.foreach(f => fs.delete(new Path(LakeStore.dataDir(key), f.path), false))
  }
}

object GraftLakeTable {
  import org.apache.spark.sql.connector.catalog.MetadataColumn
  import org.apache.spark.sql.types.{LongType, StringType}

  val FileMetaCol = "_file"
  val PosMetaCol = "_pos"

  /** Raw spec strings -> connector `Transform`s — the ONE rendering
    * shared by `Table.partitioning()` and the scan's
    * `outputPartitioning()` (Catalyst resolves both against
    * [[LakeFunctions]], so the two reports must agree verbatim). */
  def specTransforms(spec: Seq[String]): Array[org.apache.spark.sql.connector.expressions.Transform] =
    spec.map { raw =>
      import org.apache.spark.sql.connector.expressions.Expressions
      val p = LakeStore.parsePart(raw)
      p.fn match {
        case "" => Expressions.identity(p.col)
        case "days" => Expressions.days(p.col)
        case "hours" => Expressions.hours(p.col)
        case "months" => Expressions.months(p.col)
        case "years" => Expressions.years(p.col)
        case "bucket" => Expressions.bucket(p.arg, p.col)
        case "truncate" => Expressions.apply("truncate",
          Expressions.literal(p.arg), Expressions.column(p.col))
      }
    }.toArray

  /** `_file` (absolute data-file path) and `_pos` (physical row position
    * in that file) — the merge-on-read rowId, and generally useful scan
    * metadata (the input_file_name of the lake). */
  val MetaCols: Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = FileMetaCol
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "data file backing this row"
    },
    new MetadataColumn {
      override def name(): String = PosMetaCol
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String = "physical row position within _file"
    })
}

class GraftLakeTable(val key: String, val tableSchema: StructType,
    pinnedVersion: Option[Int] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsDeleteV2 {

  /** METADATA-ONLY DELETE gate (Catalyst's
    * OptimizeMetadataOnlyDeleteFromTable asks through
    * [[canDeleteWhere]] after planning the row-level rewrite): the
    * answer is yes exactly when every conjunct is an `=`/`IN` against
    * an IDENTITY partition column of the CURRENT spec with non-null
    * literals, and every live file carries a current-era group key —
    * then predicate truth is UNIFORM per file and dropping whole files
    * from the manifest is the same rows as the rewrite, for O(metadata)
    * cost. Anything else (non-partition column, range, transform specs
    * like days()/bucket() where source-column predicates are not
    * group-decidable, pre-evolution files) answers no and the planned
    * row-level path runs unchanged. */
  private def metadataDeleteMatcher(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Option[List[Any] => Boolean] = {
    val st = LakeStore.get(key).getOrElse(return None)
    if (st.current.exists(_.era != st.specEra)) return None
    val spec = st.partitionCols
    val compares = predicates.flatMap(ZonePrune.conjuncts).map { c =>
      ZonePrune.parse(c) match {
        case Some(cc) if (cc.op == "=" || cc.op == "IN") &&
            !cc.lits.contains(null) =>
          val idx = spec.indexWhere(raw =>
            LakeStore.isIdentitySpec(raw) && LakeStore.parsePart(raw).col == cc.col)
          if (idx < 0) return None
          (idx, cc.lits.toSet)
        case _ => return None
      }
    }
    Some(g => compares.forall { case (i, lits) =>
      i < g.length && lits.contains(g(i)) })
  }

  override def canDeleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Boolean =
    pinnedVersion.isEmpty && predicates.nonEmpty &&
      metadataDeleteMatcher(predicates).isDefined

  override def deleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    val matcher = metadataDeleteMatcher(predicates).getOrElse(
      throw new IllegalStateException(
        s"graft_lake: deleteWhere called on $key with predicates the " +
          "canDeleteWhere gate refuses"))
    LakeStore.deleteGroups(key, matcher)
  }

  /** `TRUNCATE TABLE` — one history-PRESERVING whole-table replace
    * commit (Delta's shape): the files leave the live set but stay on
    * disk, so time travel to pre-truncate versions keeps working and
    * the change feed sees the truncate as the row-level delete it is. */
  override def truncateTable(): Boolean = {
    require(pinnedVersion.isEmpty,
      s"graft_lake: cannot TRUNCATE a time-travel view of $key")
    LakeStore.replace(key, Nil, None)
    true
  }

  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    GraftLakeTable.MetaCols

  override def name(): String =
    key + pinnedVersion.map(v => s"@v$v").getOrElse("")
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] =
    GraftLakeTable.specTransforms(
      LakeStore.get(key).map(_.partitionCols).getOrElse(Nil))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE,
      // MERGE WITH SCHEMA EVOLUTION (p60): the analyzer's
      // ResolveMergeIntoSchemaEvolution computes the source-only columns
      // as TableChange.AddColumn and drives this catalog's alterTable —
      // the same metadata-only ADD COLUMN path as p37, now auto-applied
      // inside the one MERGE statement (Delta's withSchemaEvolution)
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  /** Surfaced to `SHOW TBLPROPERTIES`; a time-travel view shows the
    * properties AS OF its pinned version. */
  override def properties(): util.Map[String, String] = {
    val props = LakeStore.get(key) match {
      case Some(st) => pinnedVersion.fold(st.props)(v => st.snapshots(v).props)
      case None => Map.empty[String, String]
    }
    val m = new util.HashMap[String, String]()
    props.foreach { case (pk, pv) => m.put(pk, pv) }
    m
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeScanBuilder(key, tableSchema, pinnedVersion, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty, "graft_lake: cannot write to a time-travel view")
    // `option("graft.upsert.keys", "k1,k2")` turns the append into a
    // KEYED UPSERT (equality-delete write path): same files, plus one
    // EqDelete entry in the same commit. Keys translate to PHYSICAL
    // names here — the manifest's own naming.
    val upsertCols = Option(info.options.get("graft.upsert.keys"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val upsertPhys = if (upsertCols.isEmpty) Nil else {
      val st = LakeStore.get(key).getOrElse(
        throw new NoSuchTableException(key.split('.').toSeq))
      upsertCols.map { c =>
        require(st.schema.fieldNames.contains(c),
          s"graft_lake: upsert key column $c does not exist in $key")
        require(LakeStore.zoneSerializable(st.schema(c).dataType),
          s"graft_lake: upsert key column $c of $key has a type the " +
            "manifest cannot compare")
        LakeStore.physicalName(st.schema(c))
      }
    }
    // COPY INTO's ledger ids arrive as a write option (JSON array) and
    // thread explicitly to the commit — see LakeStore.CopyIdsOption
    val copyIds = Option(info.options.get(LakeStore.CopyIdsOption))
      .map(LakeStore.decodeCopyIds)
    require(copyIds.isEmpty || upsertPhys.isEmpty,
      s"graft_lake: COPY INTO cannot combine with upsert keys on $key")
    // OPTIMIZE's layout-only marker rides the write the same way — but
    // the option alone is NOT the authority: its value must be a
    // one-shot nonce this JVM's maintenance entry points minted.
    // dataChange=false is a correctness label (invisible to CDF readers
    // and to other writers' WholeTable conflict checks); honoring a
    // user-settable "true" would let any ordinary overwrite relabel
    // itself and reopen the lost-update / CDC-skip class the
    // ride-the-write marker exists to close.
    val layoutOnly = Option(info.options.get(LakeStore.LayoutOnlyOption)) match {
      case None => false
      case Some(n) =>
        require(LakeStore.claimLayoutNonce(n),
          s"graft_lake: ${LakeStore.LayoutOnlyOption} is an internal " +
            "maintenance marker (OPTIMIZE/compaction mint a one-shot " +
            "token per rewrite); ordinary writes cannot label " +
            "themselves layout-only")
        true
    }
    new LakeWriteBuilder(key, info.schema(), LakeWriteBuilder.AppendMode,
      info.queryId(), upsertPhys, copyIds, layoutOnly)
  }

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(pinnedVersion.isEmpty, "graft_lake: cannot mutate a time-travel view")
    val mor = LakeStore.get(key)
      .exists(_.props.get("graft.merge-on-read").contains("true"))
    () =>
      if (mor) new LakeDeltaOperation(key, tableSchema, info)
      else new LakeRowLevelOperation(key, tableSchema, info)
  }
}

/** What the row-level scan reports back to its operation: the group set
  * it actually emitted (copy-on-write commits replace exactly this;
  * merge-on-read records it only as audit metadata). */
trait LakeRowLevelScanHost {
  /** Groups the row-level scan emitted; None until planned. */
  @volatile private[sources] var scannedGroups: Option[Set[List[Any]]] = None
}

/** Group-based row-level operation. Unpartitioned table: whole table =
  * the one group — the scan hands Catalyst every live file and the
  * commit swaps in the rewritten plan's full output (carry-over rows
  * included — Catalyst's rewrite produces them for copy-on-write).
  * Partitioned table: the scan is runtime-group-filterable on the
  * partition columns; whatever group set it actually EMITS (recorded at
  * plan time, after Catalyst's dynamic group-filter pruned it) is
  * exactly the set the commit replaces — scan and write communicate
  * through this operation instance, the same lifecycle Iceberg uses. */
class LakeRowLevelOperation(key: String, schema: StructType,
    info: RowLevelOperationInfo) extends RowLevelOperation with LakeRowLevelScanHost {

  override def command(): RowLevelOperation.Command = info.command()
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeGroupScanBuilder(key, schema, this)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LakeWriteBuilder(key, info.schema(),
      LakeWriteBuilder.RowLevelMode(() => scannedGroups))
}

/** MERGE-ON-READ row-level operation ([[org.apache.spark.sql.connector.write.SupportsDelta]]):
  * Catalyst plans WriteDelta instead of ReplaceData — the scan reads
  * only MATCHING rows (no carry-over), each row arrives at the writer
  * as an INSERT/UPDATE/DELETE op carrying the `(_file, _pos)` rowId,
  * and the commit adds position-delete sidecars + new data files while
  * every existing data file stays untouched. This inverts the cost
  * model: a 3-row DELETE against a 1 TB group costs 3 positions instead
  * of a group rewrite; scans pay the (bounded) merge. Enabled per table
  * with `TBLPROPERTIES ('graft.merge-on-read' = 'true')` — the
  * Iceberg `write.delete.mode=merge-on-read` / Delta deletion-vector
  * switch. */
class LakeDeltaOperation(key: String, schema: StructType,
    info: RowLevelOperationInfo)
    extends org.apache.spark.sql.connector.write.SupportsDelta
    with LakeRowLevelScanHost {
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}

  override def command(): RowLevelOperation.Command = info.command()

  /** MoR matrix toggle (`graft.update-as-delete-insert` = 'true'):
    * Catalyst then REPRESENTS updates as a DELETE + INSERT row pair
    * before the writer instead of a single UPDATE op — the other
    * SupportsDelta planning mode. Either representation lands
    * identically here (the delta writer's update() is delete+insert
    * anyway), which Round10OpsSpec pins: same final state, same
    * deletion-vector totals, under both modes. */
  override def representUpdateAsDeleteAndInsert(): Boolean =
    LakeStore.get(key)
      .exists(_.props.get("graft.update-as-delete-insert").contains("true"))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeGroupScanBuilder(key, schema, this)
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(GraftLakeTable.FileMetaCol),
      Expressions.column(GraftLakeTable.PosMetaCol))
  override def newWriteBuilder(info: LogicalWriteInfo):
      org.apache.spark.sql.connector.write.DeltaWriteBuilder =
    new LakeDeltaWriteBuilder(key, info.schema())
}

/** Row-level scan builder: STATIC partition pruning for DELETE/UPDATE/
  * MERGE — Catalyst's row-level scan planning pushes the statement's
  * condition here, and any partition-column compares narrow the group
  * set at build time (a `DELETE ... WHERE source = 'srcN'` rewrites one
  * group, not the table), composing with the RUNTIME group filtering
  * LakeGroupScan already does for changeset-derived predicates. All
  * predicates stay residual; pruning is superset-safe, and extra kept
  * groups merely ride through the rewrite as carry-over. Column pruning
  * is accepted so Catalyst can request the `_file`/`_pos` rowId
  * metadata columns for merge-on-read plans (for copy-on-write plans it
  * simply requests every column — ReplaceData needs full rows). */
class LakeGroupScanBuilder(key: String, schema: StructType, op: LakeRowLevelScanHost)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownV2Filters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}

  private var pushed: Array[V2Predicate] = Array.empty
  private var required: StructType = schema

  override def pushPredicates(predicates: Array[V2Predicate]): Array[V2Predicate] = {
    // any zone-serializable column participates: group-envelope pruning
    // ([[LakeGroupScan.envelopes]]) is superset-safe on data columns too,
    // and non-partition compares are what let a statement skip a
    // PRE-EVOLUTION cohort whose envelope excludes them (the partition
    // columns' own envelopes are the exact keys, so this strictly
    // subsumes the partition-only pruning)
    pushed = predicates.flatMap(ZonePrune.conjuncts).filter(p =>
      ZonePrune.parse(p).exists(cc => schema.fieldNames.contains(cc.col) &&
        LakeStore.zoneSerializable(schema(cc.col).dataType)))
    predicates // ALL residual
  }
  override def pushedPredicates(): Array[V2Predicate] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new LakeGroupScan(key, schema, op, pushed, required)
}

/** The row-level operation's scan: the live-file scan plus runtime
  * group filtering on the partition columns. Catalyst's
  * RowLevelOperationRuntimeGroupFiltering executes the changeset side
  * first and pushes the touched partition values here as predicates
  * BEFORE planInputPartitions — so only affected groups' files are
  * read, and the groups actually emitted are recorded for the commit. */
class LakeGroupScan(key: String, schema: StructType,
    op: LakeRowLevelScanHost,
    staticPushed: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = Array.empty,
    required: StructType = null)
    extends LakeScan(key, schema, None, Array.empty, required)
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}

  private def state = LakeStore.get(key)
  private def partitionCols: Seq[String] = state.map(_.partitionCols).getOrElse(Nil)

  /** Group-envelope pruning (shared [[LakeScan.envelopeSurvivors]]).
    * Group (not file) granularity is a correctness requirement here:
    * the commit swaps whole groups, so a kept group must contribute
    * ALL its files' rows as scan input. */
  private def surviving(st: LakeStore.TableState,
      compares: Seq[ZonePrune.ColCompare]): Set[List[Any]] =
    envelopeSurvivors(st.current, compares)

  /** Static prune from the statement's own condition (build time),
    * before any runtime filter arrives. */
  private def staticKept: Option[Set[List[Any]]] = {
    val st = state.getOrElse(return None)
    if (st.partitionCols.isEmpty || staticPushed.isEmpty) return None
    val compares = staticPushed.flatMap(ZonePrune.parse).toSeq
    if (compares.isEmpty) return None
    Some(surviving(st, compares))
  }

  @volatile private var kept: Option[Set[List[Any]]] = None

  override def filterAttributes(): Array[NamedReference] =
    partitionCols.map(r => Expressions.column(LakeStore.parsePart(r).col))
      .distinct.toArray

  override def filter(predicates: Array[V2Predicate]): Unit = {
    val st = state.getOrElse(return)
    if (st.partitionCols.isEmpty) return
    // Interpret the IN/= predicates Catalyst derives from the changeset;
    // any predicate shape we don't recognize is IGNORED (keeping a
    // superset of groups is always sound — extra groups' rows ride
    // through the rewrite as carry-over and land back unchanged).
    val compares = predicates.flatMap(ZonePrune.parse).toSeq
    if (compares.nonEmpty) kept = Some(surviving(st, compares))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    state match {
      case Some(st) =>
        // static (statement-condition) and runtime (changeset-derived)
        // prunings compose by intersection; either may be absent
        val effective: Option[Set[List[Any]]] = (staticKept, kept) match {
          case (Some(a), Some(b)) => Some(a intersect b)
          case (a, b) => a.orElse(b)
        }
        val files = effective match {
          case Some(gs) => st.current.filter(f => gs.contains(f.group))
          case None => st.current
        }
        // record what this scan EMITS: exactly the groups the commit
        // must replace (filtered set if pruning ran, else every live
        // group — for an unpartitioned table the group is the empty
        // tuple, i.e. "the whole table" as one group)
        op.scannedGroups = Some(effective.getOrElse(st.liveGroups))
        // deletion vectors apply here too: a row hidden by a previous
        // merge-on-read commit must not match again
        LakeFilePartition.pack(files.map(toChunk(st)))
      case None => Array.empty
    }
  }
}

/** Plain-read scan builder: min/max zone-map FILE SKIPPING
  * ([[ZonePrune]]) plus column pruning. Every predicate Spark offers is
  * returned as residual — the scan only ever narrows WHICH FILES and
  * WHICH COLUMNS flow, never final row semantics. */
class LakeScanBuilder(key: String, schema: StructType, pinnedVersion: Option[Int],
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownV2Filters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}

  private var pushed: Array[V2Predicate] = Array.empty
  private var required: StructType = schema
  private var limit: Option[Int] = None
  private var aggAnswer: Option[(StructType, Seq[Any])] = None

  /** AGGREGATE PUSHDOWN (Iceberg parity): COUNT(*) / COUNT(col) /
    * MIN(col) / MAX(col) answered ENTIRELY from the manifest — row
    * counts, write-time null counts and zone min/max — so the query
    * opens ZERO data files at any scale. Complete-pushdown only: the
    * scan emits the one final row, or the whole attempt is refused and
    * Spark computes normally. Spark itself only offers the aggregate
    * when no residual Filter sits above the scan (every predicate we
    * accept stays residual), so a WHERE clause disables this for free.
    *
    * Refusal gates — each names the wrong answer it prevents:
    *  - GROUP BY anything: group keys would have to come from the
    *    manifest's group tuples, which pre-evolution files key by an
    *    OLDER spec (the SPJ era lesson) — refused, like Iceberg.
    *  - live deletion vectors / equality deletes: manifest row counts
    *    include rows those hide.
    *  - COUNT(DISTINCT), AVG, SUM, anything else: not derivable from
    *    (rows, nulls, min, max).
    *  - COUNT(col) when any live file containing the column predates
    *    null-count manifests: its non-null count is unknown.
    *  - MIN/MAX on float/double (a NaN never enters a zone: zones
    *    order by cmp, so a file of NaNs would report a finite extreme),
    *    on strings (zones hold JVM UTF-16 code-unit order; Catalyst
    *    compares UTF-8 bytes — they disagree beyond the BMP), or on
    *    any type the manifest doesn't zone.
    *  - MIN/MAX when a file has no zone for the column and its null
    *    count cannot PROVE the column all-null there. */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    resolveAggregation(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    // partial pushdown (supportComplete false, push true) is never
    // taken: we either answer exactly or let Spark read the data
    val r = resolveAggregation(agg)
    aggAnswer = r.orElse(aggAnswer)
    r.isDefined
  }

  private def singleCol(
      e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference
          if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
      case _ => None
    }

  private def resolveAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Seq[Any])] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    import org.apache.spark.sql.types._
    if (agg.groupByExpressions.nonEmpty || pushed.nonEmpty) return None
    val st = LakeStore.get(key).getOrElse(return None)
    val snap = pinnedVersion.map(st.snapshots(_))
    val files = pinnedVersion.fold(st.current)(st.filesAt)
    if (pinnedVersion.fold(st.deletes)(st.deletesAt).nonEmpty ||
        pinnedVersion.fold(st.eqDeletes)(st.eqDeletesAt).nonEmpty) return None
    val phys = LakeStore.physicalMap(schema)
    def exactOrdered(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }
    // The winning zone value is boxed at its file's WRITE-TIME width
    // (metadata-only type widening, p56: pre-widening files replay
    // Integer zones under a now-LongType column). The answer row is
    // typed by the CURRENT schema, so coerce to its Catalyst primitive
    // — an Integer in a LongType slot would throw ClassCastException
    // at the first downstream getLong.
    def coerce(v: Any, dt: DataType): Any = (v, dt) match {
      case (null, _) => null
      case (n: java.lang.Number, LongType | TimestampType | TimestampNTZType) =>
        java.lang.Long.valueOf(n.longValue())
      case (n: java.lang.Number, IntegerType | DateType) =>
        java.lang.Integer.valueOf(n.intValue())
      case (n: java.lang.Number, ShortType) => java.lang.Short.valueOf(n.shortValue())
      case (n: java.lang.Number, ByteType) => java.lang.Byte.valueOf(n.byteValue())
      case _ => v
    }
    // per-file MIN/MAX contribution: None = proven no non-null values
    def minMaxOf(c: String): Option[Seq[(Any, Any)]] = {
      val p = phys.getOrElse(c, c)
      val per = files.map { f =>
        if (!f.cols.contains(p)) Some(None) // column added after: all null
        else f.zones.get(p) match {
          case Some(z) => Some(Some(z))
          case None if f.nulls.get(p).contains(f.rows) => Some(None)
          case None => None // no zone, nulls unknown: cannot answer
        }
      }
      if (per.exists(_.isEmpty)) None else Some(per.flatMap(_.flatten))
    }
    val resolved: Seq[Option[(StructField, Any)]] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        Some(StructField("agg_count_star", LongType, nullable = false) ->
          java.lang.Long.valueOf(files.map(_.rows).sum))
      case cnt: Count if !cnt.isDistinct =>
        singleCol(cnt.column()).filter(schema.fieldNames.contains).flatMap { c =>
          val p = phys.getOrElse(c, c)
          val per = files.map { f =>
            if (!f.cols.contains(p)) Some(0L)
            else f.nulls.get(p).map(f.rows - _)
          }
          if (per.exists(_.isEmpty)) None
          else Some(StructField(s"agg_count_$c", LongType, nullable = false) ->
            java.lang.Long.valueOf(per.flatten.sum))
        }
      case mn: Min =>
        singleCol(mn.column()).filter(c => schema.fieldNames.contains(c) &&
            exactOrdered(schema(c).dataType)).flatMap { c =>
          minMaxOf(c).map { zs =>
            val v = if (zs.isEmpty) null
              else zs.map(_._1).reduce((a, b) =>
                if (ZonePrune.cmp(a, b).exists(_ <= 0)) a else b)
            StructField(s"agg_min_$c", schema(c).dataType, nullable = true) ->
              coerce(v, schema(c).dataType)
          }
        }
      case mx: Max =>
        singleCol(mx.column()).filter(c => schema.fieldNames.contains(c) &&
            exactOrdered(schema(c).dataType)).flatMap { c =>
          minMaxOf(c).map { zs =>
            val v = if (zs.isEmpty) null
              else zs.map(_._2).reduce((a, b) =>
                if (ZonePrune.cmp(a, b).exists(_ >= 0)) a else b)
            StructField(s"agg_max_$c", schema(c).dataType, nullable = true) ->
              coerce(v, schema(c).dataType)
          }
        }
      case _ => None // AVG/SUM/DISTINCT/...: not derivable from the manifest
    }
    if (resolved.exists(_.isEmpty)) None
    else Some(StructType(resolved.flatten.map(_._1)) -> resolved.flatten.map(_._2))
  }

  override def pushPredicates(predicates: Array[V2Predicate]): Array[V2Predicate] = {
    // only columns the manifest zone-records are skippable; a compare on
    // an un-zoned type (DECIMAL/BINARY/...) must not reach the pruner —
    // its files carry no zone and would be wrongly skipped as "all-null"
    pushed = predicates.flatMap(ZonePrune.conjuncts).filter(p =>
      ZonePrune.parse(p).exists(cc => schema.fieldNames.contains(cc.col) &&
        LakeStore.zoneSerializable(schema(cc.col).dataType)))
    predicates // ALL residual: skipping must stay superset-safe
  }
  override def pushedPredicates(): Array[V2Predicate] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  /** PARTIAL limit push (returns false — Spark keeps its global Limit):
    * the scan stops planning files once the manifest guarantees enough
    * rows, and each reader early-exits — `LIMIT 10` against a 100 TB
    * table opens one file. */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); false }
  override def build(): Scan = aggAnswer match {
    case Some((out, values)) => new LakeAggScan(key, out, values)
    case None => new LakeScan(key, schema, pinnedVersion, pushed, required, limit,
      streamMaxFiles = Option(options.get("maxFilesPerTrigger")).map(_.toInt),
      streamMaxBytes = Option(options.get("maxBytesPerTrigger")).map(_.toLong),
      streamStartVersion = Option(options.get("startingVersion")),
      streamSkipChangeCommits =
        Option(options.get("skipChangeCommits")).exists(_.toBoolean),
      streamStartTimestamp = Option(options.get("startingTimestamp")),
      streamMergeSchema =
        Option(options.get("mergeSchema")).exists(_.toBoolean))
  }
}

/** The scan a completely-pushed aggregate builds: ONE input partition
  * whose reader emits the single pre-computed row. The values were
  * resolved from the manifest at pushdown time (the same plan-time
  * snapshot semantics every LakeScan has) — executors receive literals,
  * never file lists. Stored forms are already Catalyst-internal for
  * every type the pushdown admits (integrals; DATE as Int days,
  * TIMESTAMP as Long micros). */
class LakeAggScan(key: String, out: StructType, values: Seq[Any])
    extends Scan with Batch with Serializable {
  override def readSchema(): StructType = out
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftLakeAgg $key manifest-only aggregate [${out.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(LakeAggScan.AggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new LakeAggScan.AggReaderFactory
}

object LakeAggScan {
  final case class AggPartition(values: Seq[Any]) extends InputPartition

  final class AggReaderFactory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] =
      new PartitionReader[InternalRow] {
        private val vals = p.asInstanceOf[AggPartition].values
        private var emitted = false
        override def next(): Boolean =
          if (emitted) false else { emitted = true; true }
        override def get(): InternalRow = {
          val r = new GenericInternalRow(vals.length)
          vals.indices.foreach(i => r.update(i, vals(i)))
          r
        }
        override def close(): Unit = ()
      }
  }
}

/** Snapshot scan: the live (or version-pinned) FILE LIST is captured at
  * plan time from the manifest (driver-side metadata only), so a MERGE
  * that reads and replaces the same table sees the pre-merge files for
  * the whole query and the swap is atomic at commit. With pushed
  * predicates, files whose manifest zones cannot satisfy them are
  * skipped before anything is opened; with a pruned schema, only the
  * required columns are read from parquet (true columnar projection).
  * Surviving files are PACKED into input partitions by manifest row
  * count ([[LakeFilePartition.pack]]) so small-file ingest layouts do
  * not turn into one task per tiny file; the executor-side reader opens
  * exactly its bin's files, in order. */
class LakeScan(key: String, schema: StructType,
    pinnedVersion: Option[Int] = None,
    pushed: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = Array.empty,
    required: StructType = null,
    limit: Option[Int] = None,
    streamMaxFiles: Option[Int] = None,
    streamMaxBytes: Option[Long] = None,
    streamStartVersion: Option[String] = None,
    streamSkipChangeCommits: Boolean = false,
    streamStartTimestamp: Option[String] = None,
    streamMergeSchema: Boolean = false) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
  private val readCols: StructType = Option(required).getOrElse(schema)
  /** logical -> physical for THIS scan's schema era (column mapping):
    * zones, blooms, and manifest column lists are keyed physically. */
  protected val physNames: Map[String, String] = LakeStore.physicalMap(schema)
  private def toPhysical(cc: ZonePrune.ColCompare): ZonePrune.ColCompare =
    cc.copy(col = physNames.getOrElse(cc.col, cc.col))
  override def readSchema(): StructType = readCols
  override def toBatch: Batch = this

  /** Manifest-driven statistics AFTER pushdown (zone-pruned file set,
    * deletion vectors subtracted) — what lets Catalyst/AQE auto-pick a
    * broadcast join when the lake side is small, with zero file I/O:
    * the numbers come from the same write-time manifest the scan plans
    * from. Row width is a type-based estimate (the manifest records
    * rows and zones, not byte sizes). */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val st = LakeStore.get(key)
    val files = st.map(s => pinnedVersion.fold(s.current)(s.filesAt))
      .getOrElse(Vector.empty)
    val compares = pushed.flatMap(ZonePrune.parse).map(toPhysical)
    val surviving =
      if (compares.isEmpty) files
      else files.filter(f => compares.forall(cc => ZonePrune.survives(f.zones.get(cc.col), cc)))
    val dvRows = st.map(s =>
      pinnedVersion.fold(s.deletes)(s.deletesAt))
      .getOrElse(Vector.empty)
      .groupBy(_.dataFile).map { case (df, es) => df -> es.map(_.rows).sum }
    val rows = surviving.map(f => f.rows - dvRows.getOrElse(f.path, 0L)).sum
    val width = readCols.fields.map(_.dataType.defaultSize.toLong).sum.max(1L)
    // COLUMN statistics from the same write-time zones (numeric/datetime
    // columns; min/max = the pruned file set's zone envelope) — what
    // CBO's filter-selectivity and join estimation consume, with zero
    // file I/O. Strings are skipped: their stored form is not the
    // Catalyst value the estimator compares with.
    val colStats = new java.util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    readCols.fields.foreach { f =>
      val numericLike = f.dataType match {
        case _: org.apache.spark.sql.types.NumericType => true
        case org.apache.spark.sql.types.DateType |
             org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => true
        case _ => false
      }
      val phys = physNames.getOrElse(f.name, f.name)
      val zs = if (numericLike) surviving.flatMap(_.zones.get(phys)) else Vector.empty
      // NDV from the manifest's KMV sketches (any type, strings too) —
      // what join-size estimation actually keys on. Only reported when
      // EVERY surviving file carries a sketch: a partial fold is an
      // undercount, and an optimizer trusts what it is given.
      val sketches = surviving.flatMap(_.ndv.get(phys))
        .map(LakeStatsSidecar.resolve(key, _))
      val ndvOpt: Option[Long] =
        if (surviving.nonEmpty && sketches.length == surviving.length)
          Some(LakeNdv.mergedNdv(sketches)._1)
        else None
      // NULL counts from the manifest (Iceberg's null_value_counts),
      // reported only when every surviving file recorded one — Catalyst
      // REQUIRES nullCount next to distinctCount before its join
      // estimator will consume either (JoinEstimation's
      // columnStatsWithCountsExist gate): without it, a 3-table reorder
      // silently degrades to size-product costs and NDV goes unread.
      // Suppressed whenever row-level deletes hide rows in the scanned
      // snapshot: numRows already subtracts them, and a raw per-file
      // null count can then EXCEED the reported row count — a
      // nullCount > rowCount ColumnStat drives the estimator's
      // non-null fraction negative, worse than reporting nothing.
      val deletesHideRows = dvRows.nonEmpty ||
        st.exists(s => pinnedVersion.fold(s.eqDeletes)(s.eqDeletesAt).nonEmpty)
      val nullsOpt: Option[Long] = {
        val ns = surviving.flatMap(_.nulls.get(phys))
        if (!deletesHideRows && surviving.nonEmpty &&
            ns.length == surviving.length) Some(ns.sum)
        else None
      }
      if (zs.nonEmpty || ndvOpt.isDefined) {
        val mnOpt = if (zs.isEmpty) None else Some(zs.map(_._1).reduce((a, b) =>
          if (ZonePrune.cmp(a, b).exists(_ <= 0)) a else b))
        val mxOpt = if (zs.isEmpty) None else Some(zs.map(_._2).reduce((a, b) =>
          if (ZonePrune.cmp(a, b).exists(_ >= 0)) a else b))
        colStats.put(
          org.apache.spark.sql.connector.expressions.Expressions.column(f.name),
          new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
            override def min(): java.util.Optional[Object] =
              mnOpt.fold(java.util.Optional.empty[Object]())(v =>
                java.util.Optional.of(v.asInstanceOf[Object]))
            override def max(): java.util.Optional[Object] =
              mxOpt.fold(java.util.Optional.empty[Object]())(v =>
                java.util.Optional.of(v.asInstanceOf[Object]))
            override def distinctCount(): java.util.OptionalLong =
              ndvOpt.fold(java.util.OptionalLong.empty())(
                java.util.OptionalLong.of)
            override def nullCount(): java.util.OptionalLong =
              nullsOpt.fold(java.util.OptionalLong.empty())(
                java.util.OptionalLong.of)
          })
      }
    }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows * width)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = colStats
    }
  }

  override def description(): String =
    s"GraftLake $key${pinnedVersion.map(v => s"@v$v").getOrElse("")} " +
      s"readCols=[${readCols.fieldNames.mkString(",")}] " +
      s"skipPredicates=[${pushed.map(_.toString).mkString(", ")}]"

  /** Deletion vectors of the scanned snapshot, keyed by manifest data
    * path: (absolute sidecar paths, total hidden positions). */
  protected def dvOf(st: LakeStore.TableState): Map[String, (Seq[String], Long)] = {
    val ds = pinnedVersion.fold(st.deletes)(st.deletesAt)
    ds.groupBy(_.dataFile).map { case (df, es) =>
      df -> (es.map(e => LakeStore.resolveRaw(key, e.path)), es.map(_.rows).sum)
    }
  }

  /** Live equality deletes of the scanned snapshot, in chunk form
    * (physical cols + types resolved through the snapshot schema,
    * file paths absolute). */
  protected def eqOf(st: LakeStore.TableState): Seq[(Int, LakeEqDel)] = {
    val snap = pinnedVersion.fold(st.active)(v => st.snapshots(v))
    val eqs = pinnedVersion.fold(st.eqDeletes)(st.eqDeletesAt)
    if (eqs.isEmpty) return Nil
    val typeByPhysical: Map[String, org.apache.spark.sql.types.DataType] =
      snap.schema.fields.iterator
        .map(f => LakeStore.physicalName(f) -> f.dataType).toMap
    eqs.map { d =>
      d.seq -> LakeEqDel(d.cols, d.cols.map(typeByPhysical), 
        d.files.map(LakeStore.resolveRaw(key, _)))
    }
  }

  /** Chunk builder over a PRE-COMPUTED dv map (compute [[dvOf]] once per
    * plan, not once per file). Each chunk carries the equality deletes
    * whose sequence POST-DATES the file — the Iceberg v2 apply rule. */
  protected def toChunk(st: LakeStore.TableState): LakeStore.FileEntry => LakeFileChunk = {
    val dvMap = dvOf(st)
    val eqs = eqOf(st)
    f => {
      val (dv, dvRows) = dvMap.getOrElse(f.path, (Nil, 0L))
      LakeFileChunk(LakeStore.resolvePath(key, f), f.cols, f.rows, dv, dvRows,
        eqDel = eqs.collect { case (seq, e) if f.seq < seq => e })
    }
  }

  /** Zone + bloom pruning over the scanned snapshot's live set — shared
    * by partition planning and the key-grouped partitioning report so
    * the two always agree on the surviving group count. */
  private def survivingFiles(files: Vector[LakeStore.FileEntry]): Vector[LakeStore.FileEntry] = {
    val compares = pushed.flatMap(ZonePrune.parse).map(toPhysical)
    // equality probes additionally consult the per-file bloom filters
    // (when the file carries one for the column): zones cannot skip a
    // point lookup on an id that interleaves across every file — the
    // bloom can. Absence keeps the file; both levers are superset-safe.
    val eqProbes = compares.filter(cc => cc.op == "=" || cc.op == "IN")
    if (compares.isEmpty) files
    else files.filter(f =>
      compares.forall(cc => ZonePrune.survives(f.zones.get(cc.col), cc)) &&
        eqProbes.forall(cc => f.blooms.get(cc.col)
          .forall(enc => LakeBloom.mayMatch(
            LakeStatsSidecar.resolve(key, enc), cc.lits))))
  }

  private def snapshotFiles: Vector[LakeStore.FileEntry] =
    LakeStore.get(key)
      .map(s => pinnedVersion.fold(s.current)(s.filesAt))
      .getOrElse(Vector.empty)

  /** Per-group column ENVELOPES from the member files' manifest zones:
    * the group's (min, max) per column when every member records one
    * (absent = unknown = never prune on it). For a current-spec
    * identity group the partition column's envelope IS the exact key
    * value; for files written under an OLDER partition spec (partition
    * evolution) the envelope still bounds the new partition columns,
    * so pruning works across the spec boundary — superset-safe either
    * way. Group (not file) granularity matters wherever whole groups
    * are the unit of work (row-level commits swap groups; runtime
    * pruning keeps or drops groups). */
  protected def envelopeSurvivors(files: Vector[LakeStore.FileEntry],
      compares: Seq[ZonePrune.ColCompare]): Set[List[Any]] = {
    // envelope keys are PHYSICAL zone names (column mapping)
    val mapped = compares.map(toPhysical)
    files.groupBy(_.group).collect { case (g, fs) =>
      val cols = fs.map(_.zones.keySet).reduce(_ intersect _)
      val env = cols.iterator.map { c =>
        val zs = fs.map(_.zones(c))
        val mn = zs.map(_._1).reduce((a, b) =>
          if (ZonePrune.cmp(a, b).exists(_ <= 0)) a else b)
        val mx = zs.map(_._2).reduce((a, b) =>
          if (ZonePrune.cmp(a, b).exists(_ >= 0)) a else b)
        c -> ((mn, mx))
      }.toMap
      (g, env)
    }.collect { case (g, env) if mapped.forall(cc =>
      env.get(cc.col).forall(z => ZonePrune.survives(Some(z), cc))) => g
    }.toSet
  }

  /** RUNTIME PARTITION FILTERING on plain reads (Iceberg's runtime
    * filtering / the DSv2 face of dynamic partition pruning): declaring
    * the partition SOURCE columns filterable makes Catalyst plan a
    * DynamicPruningSubquery from a join's other side — the dim-side
    * filter executes first (usually reusing the join's own broadcast),
    * its distinct join-key values arrive here as IN predicates BEFORE
    * planInputPartitions, and whole partition groups prune via their
    * manifest envelopes. A star join reads only the fact groups the
    * filtered dimension touches — at 100 TB the difference between
    * scanning everything and scanning the week that matters.
    * Unrecognized predicate shapes are ignored (keeping a superset of
    * groups is always sound); SPJ mode skips runtime pruning because
    * outputPartitioning() already promised the full group roster. */
  @volatile private var runtimeKept: Option[Set[List[Any]]] = None

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val spec = LakeStore.get(key)
      .map(s => pinnedVersion.fold(s.partitionCols)(v => s.snapshots(v).spec))
      .getOrElse(Nil)
    // only columns that SURVIVED pruning: Spark resolves these against
    // the scan's output, and a pruned-away partition column (a query
    // that never reads it cannot join on it) would fail resolution
    spec.map(r => LakeStore.parsePart(r).col)
      .filter(readCols.fieldNames.contains)
      .distinct
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray
  }

  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    val compares = predicates.flatMap(ZonePrune.parse).toSeq
    if (compares.nonEmpty)
      runtimeKept = Some(envelopeSurvivors(snapshotFiles, compares))
    LakeStore.lastRuntimeFilter.update(key,
      s"predicates=${predicates.map(p => p.name() + "(" + p.children().length + ")").mkString(",")} " +
      s"parsed=${compares.mkString(";")} kept=${runtimeKept.map(_.size)}")
  }

  /** STORAGE-PARTITIONED JOIN eligibility (the Iceberg/Delta SPJ shape):
    * when `spark.sql.sources.v2.bucketing.enabled` is on, the table has
    * a partition spec, every live file belongs to the CURRENT spec's era
    * (a pre-evolution cohort has keys of another arity — co-location
    * cannot be promised across eras), all spec SOURCE columns survive
    * column pruning, and no pushed LIMIT truncates planning, the scan
    * reports `KeyGroupedPartitioning` and emits ONE keyed partition per
    * group — two lake tables partitioned the same way then join with
    * ZERO exchanges, the decisive shuffle elimination at 100 TB.
    * TRANSFORM specs qualify too (`bucket(8, id)`, `days(ts)`, ...):
    * Catalyst resolves the reported transform through this catalog's
    * [[LakeFunctions]] and aligns on the derived keys — bucketing is
    * the co-location layout for high-cardinality keys, where identity
    * would make one group per value.
    *
    * TWO confs gate it, exactly Iceberg's shape: Spark's
    * `spark.sql.sources.v2.bucketing.enabled` (default TRUE since
    * Spark 4 — reading it with a false fallback would silently diverge
    * from Spark's documented default the moment anyone materializes
    * the session value) AND this source's own
    * `spark.sql.graft.preserve-data-grouping` (default FALSE, the
    * analogue of Iceberg's `preserve-data-grouping`): reporting
    * KeyGroupedPartitioning makes one partition PER GROUP, which
    * destroys bin-packing on ordinary scans — a small-file table would
    * schedule a task per partition value even when no join can use the
    * grouping. SPJ is a join-time layout promise, so the user opts a
    * query into it; everything else keeps packed bins AND runtime
    * filtering (which composes with SPJ mode too — see
    * [[planInputPartitions]]). */
  private def keyGroupedSpec: Option[Seq[String]] = {
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val enabled = conf
      .getConfString("spark.sql.sources.v2.bucketing.enabled", "true").toBoolean
    val preserve = conf
      .getConfString("spark.sql.graft.preserve-data-grouping", "false").toBoolean
    if (!enabled || !preserve || limit.isDefined) None
    else LakeStore.get(key).flatMap { st =>
      val spec = pinnedVersion.fold(st.partitionCols)(v => st.snapshots(v).spec)
      val files = pinnedVersion.fold(st.current)(st.filesAt)
      val era = pinnedVersion.fold(st.specEra)(v => st.snapshots(v).specEra)
      // era equality is the exact current-spec test: a SAME-ARITY
      // partition evolution (identity(a) -> identity(b)) leaves old
      // files whose keys pass any shape check but mean a different
      // column — treating them as current-spec keys would promise false
      // co-location and return silently wrong join results
      if (spec.nonEmpty &&
          spec.forall(r => readCols.fieldNames.contains(LakeStore.parsePart(r).col)) &&
          files.forall(f => f.era == era && f.group.length == spec.length))
        Some(spec)
      else None
    }
  }

  /** Surviving groups in a deterministic order (both the partitioning
    * report and the plan enumerate them identically). */
  private def survivingGroups(spec: Seq[String]): Vector[(List[Any], Vector[LakeStore.FileEntry])] =
    survivingFiles(snapshotFiles).groupBy(_.group).toVector
      .sortBy { case (g, _) => g.map(String.valueOf).mkString("\u0000") }

  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    keyGroupedSpec match {
      // an empty surviving set reports Unknown — a 0-partition
      // KeyGroupedPartitioning has nothing to align on
      case Some(spec) if survivingGroups(spec).nonEmpty =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          GraftLakeTable.specTransforms(spec)
            .map(t => t: org.apache.spark.sql.connector.expressions.Expression),
          survivingGroups(spec).length)
      case _ =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }

  override def planInputPartitions(): Array[InputPartition] = {
    val stOpt = LakeStore.get(key)
    val files = snapshotFiles
    // zone/bloom file skipping and runtime group pruning compose: a
    // file survives only if its own stats allow it AND its group was
    // kept by any runtime (DPP) filter that arrived
    val surviving = runtimeKept match {
      case Some(gs) => survivingFiles(files).filter(f => gs.contains(f.group))
      case None => survivingFiles(files)
    }

    keyGroupedSpec match {
      case Some(spec) =>
        // SPJ mode: one UNSPLITTABLE partition per group, carrying its
        // key in Catalyst form for Spark's key-grouped alignment — the
        // key's type is the TRANSFORM's result type (bucket id / day
        // ordinal INT, identity/truncate keep the source type).
        // Runtime (DPP) filters COMPOSE: outputPartitioning() promised
        // a group ROSTER (Spark verifies the key set is unchanged after
        // runtime filtering), so a pruned group keeps its keyed
        // partition but carries ZERO files — the roster survives, the
        // I/O disappears
        val types = spec.map { r =>
          val p = LakeStore.parsePart(r)
          LakeStore.partKeyType(p, schema(p.col).dataType)
        }
        val grouped = survivingGroups(spec).map { case (g, fs) =>
          if (runtimeKept.forall(_.contains(g))) (g, fs)
          else (g, Vector.empty[LakeStore.FileEntry])
        }
        val toC = stOpt.map(toChunk).getOrElse((f: LakeStore.FileEntry) =>
          LakeFileChunk(LakeStore.resolvePath(key, f), f.cols, f.rows, Nil, 0L))
        val parts = grouped.map { case (g, fs) =>
          val keyRow = new GenericInternalRow(
            g.zip(types).map { case (v, dt) => LakeStore.toCatalyst(v, dt) }.toArray)
          LakeKeyedFilePartition(fs.map(toC), keyRow): InputPartition
        }
        LakeStore.lastScanStats.update(key, LakeStore.ScanStats(
          files.map(_.group).distinct.length, grouped.count(_._2.nonEmpty),
          files.length, grouped.map(_._2.length).sum,
          parts.flatMap(_.asInstanceOf[LakeBin].chunks.map(_.deliveredRows)).sum,
          readCols.fieldNames.toSeq))
        return parts.toArray
      case None => ()
    }
    // pushed LIMIT with no predicates in play: stop planning files once
    // the manifest guarantees enough rows — LIMIT 10 opens one file of a
    // 100 TB table. (Spark only pushes a limit when no filter sits
    // between it and the scan, so every planned row is a delivered row.)
    // Live EQUALITY deletes disable the fast path: their row impact is
    // key-resolved at read time, so manifest counts cannot guarantee
    // delivery — plan every surviving file and let the limit exec stop.
    val eqLive = stOpt.exists(st => eqOf(st).nonEmpty)
    val planned = limit.filter(_ => pushed.isEmpty && !eqLive) match {
      case Some(n) =>
        val dv = stOpt.map(dvOf).getOrElse(Map.empty)
        var cum = 0L
        surviving.takeWhile { f =>
          val need = cum < n
          cum += f.rows - dv.get(f.path).map(_._2).getOrElse(0L)
          need
        }
      case None => surviving
    }
    val chunks = stOpt.map(st => planned.map(toChunk(st))).getOrElse(Vector.empty)
    LakeStore.lastScanStats.update(key, LakeStore.ScanStats(
      files.map(_.group).distinct.length,
      planned.map(_.group).distinct.length,
      files.length, planned.length,
      chunks.map(_.deliveredRows).sum, readCols.fieldNames.toSeq))
    LakeFilePartition.pack(chunks)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeReaderFactory(readCols, physNames)

  /** `readStream.table(...)`: the commit log consumed as a STREAMING
    * SOURCE (Delta's streaming-source shape) — see [[LakeMicroBatchStream]]. */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(pinnedVersion.isEmpty,
      "graft_lake: cannot stream from a time-travel view")
    new LakeMicroBatchStream(key, readCols, physNames, streamMaxFiles,
      streamMaxBytes, streamStartVersion, streamSkipChangeCommits,
      streamStartTimestamp, tableSchema = schema,
      mergeSchema = streamMergeSchema)
  }
}

/** The lake table as a STREAMING SOURCE (Delta's `readStream.table`
  * shape): offsets are commit VERSIONS, each micro-batch delivers the
  * files APPENDED by the data commits in `(start, end]` — planned from
  * commit metadata alone, so a batch costs O(new files), never a table
  * scan, and the checkpoint guarantees exactly-once delivery across
  * restarts (a resumed stream continues from the last committed
  * version). Layout-only commits (OPTIMIZE) and metadata commits
  * (ALTER, properties) deliver nothing — the dataChange=false contract.
  * Non-append DATA commits (copy-on-write or merge-on-read rewrites,
  * RESTORE) fail the stream LOUDLY: an append-only reader silently
  * skipping a rewrite would miss rows, and a consumer who needs
  * row-level deltas should read the change feed (st14 / GraftLake
  * .changes) instead — the same contract Delta's source enforces
  * without ignoreChanges. */
class LakeMicroBatchStream(key: String, required: StructType,
    physicalOf: Map[String, String] = Map.empty,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None,
    startingVersion: Option[String] = None,
    skipChangeCommits: Boolean = false,
    startingTimestamp: Option[String] = None,
    tableSchema: StructType = null,
    mergeSchema: Boolean = false)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset,
    ReadLimit, ReadMaxFiles}

  private case class VersionOffset(v: Int) extends V2Offset {
    override def json: String = s"""{"version":$v}"""
  }
  private def versionOf(o: V2Offset): Int = o match {
    case VersionOffset(v) => v
    case other => // a checkpointed offset arrives as serialized JSON
      val s = other.json
      val i = s.indexOf(':')
      s.substring(i + 1, s.indexOf('}')).trim.toInt
  }

  private def state = LakeStore.get(key).getOrElse(
    throw new NoSuchTableException(key.split('.').toSeq))

  /** `startingVersion` (Delta's option): where a FRESH stream begins.
    * Default replays the whole commit history as the initial load;
    * `"latest"` starts from NOW (the first batch delivers only commits
    * after query start — on a 100 TB table the difference between an
    * initial load that rereads everything and a tail-follow); a number
    * N delivers from commit N inclusive. Checkpointed restarts ignore
    * this — the checkpoint owns the position. */
  override def initialOffset(): V2Offset = {
    require(startingVersion.isEmpty || startingTimestamp.isEmpty,
      s"graft_lake: startingVersion and startingTimestamp are mutually " +
        s"exclusive on $key")
    startingTimestamp match {
      // `startingTimestamp` (Delta's option): deliver from the earliest
      // commit AT OR AFTER the instant — epoch millis or
      // 'yyyy-MM-dd HH:mm:ss[.SSS]' (local clock, same as the log's
      // mtimes that answer the lookup). Checkpointed restarts ignore
      // this like startingVersion — the checkpoint owns the position.
      case Some(ts) =>
        val ms = ts.toLongOption.getOrElse {
          val fmt = new java.text.SimpleDateFormat(
            if (ts.contains('.')) "yyyy-MM-dd HH:mm:ss.SSS"
            else "yyyy-MM-dd HH:mm:ss")
          fmt.parse(ts).getTime
        }
        VersionOffset(math.max(0, LakeStore.versionAtOrAfter(key, ms) - 1))
      case None => startingVersion match {
        case None => VersionOffset(0)
        case Some("latest") => VersionOffset(state.latestVersion)
        case Some(n) =>
          val v = n.toInt
          require(v >= 1 && v <= state.latestVersion + 1,
            s"graft_lake: startingVersion $v out of range [1, ${state.latestVersion + 1}] for $key")
          VersionOffset(v - 1)
      }
    }
  }
  override def latestOffset(): V2Offset = VersionOffset(state.latestVersion)
  override def deserializeOffset(json: String): V2Offset =
    VersionOffset(json.split(':')(1).stripSuffix("}").trim.toInt)

  /** RATE LIMITING (Delta's `maxFilesPerTrigger` — DSv2 admission
    * control): a micro-batch admits whole COMMITS while their
    * cumulative appended-file count stays within the cap, always
    * admitting at least one data commit so the stream can never stall
    * behind a single oversized append. Commit granularity keeps the
    * source's exactly-once contract untouched (offsets stay versions;
    * a commit is never split across batches), and the decision is
    * O(admitted commits) manifest arithmetic — no file listing. A
    * 100 TB backfill then drains as bounded batches instead of one
    * giant first batch that overwhelms the sink. */
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  /** `maxBytesPerTrigger` composes with the file cap (Delta's pair):
    * Spark's ReadLimit vocabulary has no bytes variant, so the bytes
    * cap is applied directly from the option inside [[latestOffset]] —
    * the same place Delta enforces its own. Manifest `bytes` make the
    * decision O(admitted commits), no filesystem stat. */
  private def admits(files: Int, bytes: Long, capFiles: Option[Int]): Boolean =
    capFiles.forall(files <= _) && maxBytesPerTrigger.forall(bytes <= _)

  /** `Trigger.AvailableNow` + a read limit = a BOUNDED DRAIN in several
    * batches: the cliff is pinned HERE at query start (without this
    * hook Spark falls back to one all-available batch, defeating the
    * rate limit), then each batch admits up to the limit until the
    * pinned version is reached. */
  @volatile private var availableNowCap: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(state.latestVersion)

  /** (files, bytes) a commit appended — 0 for metadata/layout/branch,
    * and for skipped change commits (they deliver nothing, so they
    * must not consume the rate-limit budget). Read straight off the
    * commit's own add-list: O(files in THIS commit) driver work, never
    * the O(table) full-list set-diff — the planning cost a long-running
    * ingest stream pays per delivered commit must not grow with the
    * table it tails. */
  private def appendedAt(st: LakeStore.TableState, v: Int): (Int, Long) = {
    val snap = st.snapshots(v)
    if (!snap.dataChange || snap.ref != "main") (0, 0L)
    else if (skipChangeCommits &&
        snap.action != "append" && snap.action != "clone" &&
        snap.action != "copyinto") (0, 0L)
    else {
      val added = st.addedAt(v)
      (added.length, added.map(_.bytes).sum)
    }
  }

  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
    val st = state
    val s0 = versionOf(start)
    val cliff = availableNowCap.getOrElse(st.latestVersion)
    val capFiles = limit match {
      case m: ReadMaxFiles => Some(m.maxFiles())
      case _ => None
    }
    if (capFiles.isEmpty && maxBytesPerTrigger.isEmpty)
      return VersionOffset(cliff)
    var v = s0
    var files = 0
    var bytes = 0L
    var progressed = false
    var stop = false
    while (v < cliff && !stop) {
      val (addF, addB) = appendedAt(st, v + 1)
      // metadata/layout commits (addF == 0) ride along free; the
      // first data commit always admits (progress guarantee)
      if (addF == 0 || !progressed || admits(files + addF, bytes + addB, capFiles)) {
        v += 1
        files += addF
        bytes += addB
        if (addF > 0) progressed = true
      } else stop = true
    }
    VersionOffset(v)
  }

  /** SCHEMA EVOLUTION across a RUNNING stream (Delta's contract): an
    * ALTER commit whose schema carries a column this stream does not
    * know fails the stream LOUDLY at exactly that commit — silently
    * continuing would drop the new column's data from every subsequent
    * batch with no trace. The failure is lossless: the offset did not
    * advance, and a RESTART (which re-reads the table's now-current
    * schema) resumes from the checkpoint with the evolved schema —
    * Delta's restart semantics. `mergeSchema=true` is the documented
    * opt-in to continue under the stream's own schema (the added
    * column stays invisible until a restart). Alters the stream's
    * schema already covers — every historical ALTER a fresh stream
    * replays over, and the very ALTER a restarted stream re-crosses —
    * pass: files written under a narrower schema null-pad, the
    * standing lake read contract. A historically-added column the
    * table has SINCE dropped or renamed away also passes: its data is
    * equally invisible at the table's own head, and failing there
    * would poison full-history replay with a restart that can never
    * succeed (the restart message below must always be a true fix). */
  private def requireSchemaCompatible(st: LakeStore.TableState,
      snap: LakeStore.Snapshot, v: Int): Unit = {
    // keyed on the schema actually CHANGING across the commit (vs its
    // parent snapshot), not on the action tag: a staged REPLACE that
    // retypes or adds columns crosses a running stream exactly like an
    // ALTER does, and under skipChangeCommits its successor appends
    // would otherwise deliver under the stream's stale schema — the
    // silent-drop failure this guard exists to refuse. Delta fails a
    // stream on any schema-changing commit for the same reason.
    if (mergeSchema || tableSchema == null || snap.parent < 0 ||
        snap.schema == st.snapshots(snap.parent).schema) return
    val known = tableSchema.fields.iterator
      .map(f => (f.name, f.dataType)).toSet
    val currentNames = state.schema.fieldNames.toSet
    val novel = snap.schema.fields.filterNot(f => known((f.name, f.dataType)))
      .filter(f => currentNames.contains(f.name))
    if (novel.nonEmpty) throw new UnsupportedOperationException(
      s"graft_lake: schema of $key evolved at commit $v — " +
        s"column(s) ${novel.map(f => s"${f.name} ${f.dataType.simpleString}")
          .mkString(", ")} were added after this stream started, and " +
        "delivering under the stream's schema would silently drop them. " +
        "Restart the stream to adopt the new schema (it resumes from the " +
        "checkpoint), or set mergeSchema=true to continue under the " +
        "current schema until a restart")
  }

  override def planInputPartitions(start: V2Offset, end: V2Offset): Array[InputPartition] = {
    val st = state
    val (s0, e0) = (versionOf(start), versionOf(end))
    // retention gate: a stream starting (or resuming from a checkpoint)
    // below the VACUUM horizon must fail with the clear retention error
    // batch readers get, not a FileNotFoundException inside tasks
    if (s0 + 1 <= e0) LakeStore.requireReadable(key, s0 + 1)
    val chunks = ((s0 + 1) to e0).flatMap { v =>
      val snap = st.snapshots(v)
      if (snap.ref == "main") requireSchemaCompatible(st, snap, v)
      // branch commits are not main's rows (they surface at PUBLISH);
      // layout/metadata commits deliver nothing
      if (!snap.dataChange || snap.ref != "main") Nil
      else if (snap.action == "append" || snap.action == "clone" ||
          snap.action == "copyinto") {
        // the commit's own add-list IS the delivery (append-family
        // commits never re-add a live path): O(commit size), no
        // full-file-list reconstruction anywhere on the stream path
        st.addedAt(v).map(f =>
          LakeFileChunk(LakeStore.resolvePath(key, f), f.cols, f.rows))
      } else if (skipChangeCommits) Nil
      // Delta's contract: fail LOUDLY by default on a non-append data
      // commit — re-delivering a rewrite's re-landed files would
      // DUPLICATE every carried-over row downstream, and silently
      // skipping would hide updates/deletes the consumer may need.
      // `skipChangeCommits=true` (above) is the documented opt-out:
      // the stream delivers appends only and change commits pass
      // through invisibly.
      else throw new UnsupportedOperationException(
        s"graft_lake: streaming source requires append-only history, but " +
          s"commit $v of $key is '${snap.action}' — set skipChangeCommits=true " +
          "to stream appends only, or consume the change feed " +
          "(GraftLake.changes) for row-level deltas instead")
    }
    LakeFilePartition.pack(chunks)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeReaderFactory(required, physicalOf)
  override def commit(end: V2Offset): Unit = ()
  override def stop(): Unit = ()
}

/** CHANGE-FEED planning shared by the batch and streaming readers of
  * `<table>.changes` — Delta CDF's `readChangeFeed` shape, answered
  * from COMMIT METADATA + the files the commit itself touched (never a
  * table scan):
  *
  *  - files ADDED by a data commit deliver their rows tagged `I`
  *    (minus positions the commit's own deletion vectors hide);
  *  - files REMOVED by a copy-on-write commit deliver their rows
  *    tagged `D` (minus positions ALREADY hidden at the prior
  *    version — those rows were dead before this commit);
  *  - a merge-on-read commit's NEW deletion-vector positions deliver
  *    tagged `D` straight out of the untouched data file
  *    (include-mode read: O(deleted positions), the exact inverse of
  *    the scan's skip).
  *
  * Merge-on-read deltas are therefore EXACT row-level changes; a
  * copy-on-write rewrite is file-granular — carry-over rows appear as
  * a (D, I) pair with identical payload, and a consumer that wants
  * Delta-CDF net semantics nets per key: D-only = delete, I-only =
  * insert, D+I differing = update, D+I identical = carry-over (drop).
  * That netting is a bounded aggregation over the TOUCHED files only,
  * the same cost class as the batch diff ([[GraftLake.changes]]);
  * layout-only commits (OPTIMIZE) and metadata commits deliver
  * nothing — the dataChange=false contract. */
object LakeCdf {
  /** Probe counter: how many times a range read had to SEED its
    * path-keyed live map with a full live-list build (the range entry
    * point — O(chain) once per range; contiguous main lineage inside
    * the range folds each commit's own delta instead). The Round16 spec
    * pins this at ONE per range read, with zero per-commit full-list
    * materializations. */
  val rangeSeeds = new java.util.concurrent.atomic.AtomicLong

  /** Probe counters for the upsert-CDF fan-out: across all [[chunksFor]]
    * calls, how many delete-side/resurrect-side chunks the per-file key
    * STATISTICS pruned vs emitted. What they pin (Round17 spec): with
    * blooms (or disjoint zones) on the key column, an upsert commit's
    * change-feed plan emits O(files-that-can-contain-the-deleted-keys)
    * chunks, not O(live files) — the read-amplification bound that
    * makes CDC-of-upserts consumable at 800k files. */
  val upsertFanoutEmitted = new java.util.concurrent.atomic.AtomicLong
  val upsertFanoutPruned = new java.util.concurrent.atomic.AtomicLong

  /** Plan-time key statistics of ONE equality delete, folded from the
    * manifest entries of the delete's OWN data files (the upsert's key
    * source): per key column, may-the-keys-be-NULL, are-there-any-
    * non-null-keys, a min/max envelope over the key files' zones, and
    * an OR-fold of their bloom filters. [[mayHold]] is the sound prune:
    * a candidate file is skipped from the fan-out exactly when some key
    * column PROVES value-disjointness between the file and every key
    * file (bloom bit-intersection when both sides carry filters of one
    * width, zone-range disjointness otherwise) AND the null case cannot
    * match (the reader's probe is exact stored-tuple membership, so a
    * NULL key only matches a NULL cell; zones/blooms describe non-null
    * values only). Any absent statistic answers "may hold" — emission
    * is always the safe side. `resolved = None` (a key file not found
    * in the parent live set or the commit's own add-list — compacted
    * away, or foreign) disables pruning for this delete entirely. */
  /** Per-delete bound on plan-time key loading: a delete whose key
    * files hold at most this many rows has its key VALUES read at
    * planning (one bounded columnar read, LRU-shared with the scan's
    * own probe sets) so candidate blooms are probed per-value — the
    * tight, membership-grade test. Above the bound the planner keeps
    * the statistics-only pruning (zone envelope + bloom
    * bit-intersection), which stays sound but admits more files: a
    * bit-intersection between a 50-value filter and a 5-value filter
    * goes non-empty by collision ~13% of the time at the default width,
    * where a per-value probe's false-positive rate is (density)^K. */
  private val MaxProbeKeys = 4096L

  private final class EqKeyStats(key: String, d: LakeStore.EqDelete,
      resolved: Option[Seq[LakeStore.FileEntry]], chunk: LakeEqDel) {
    private def noNulls(e: LakeStore.FileEntry, c: String): Boolean =
      e.nulls.get(c).contains(0L)
    private def allNull(e: LakeStore.FileEntry, c: String): Boolean =
      e.nulls.get(c).contains(e.rows)
    // (has-null, distinct non-null stored values) per key column, when
    // the delete is small enough to read its keys at plan time
    private val valuesByCol: Map[String, (Boolean, Array[Any])] =
      resolved.filter(_.iterator.map(_.rows).sum <= MaxProbeKeys) match {
        case None => Map.empty
        case Some(_) =>
          import scala.jdk.CollectionConverters._
          val ts = LakeEqKeys.load(chunk).asScala.toVector
          d.cols.zipWithIndex.map { case (c, i) =>
            val vs = ts.map(_(i))
            c -> ((vs.contains(null), vs.filter(_ != null).distinct.toArray))
          }.toMap
      }
    private val byCol: Map[String, (Boolean, Boolean, Option[(Any, Any)], Option[Array[Long]])] =
      resolved match {
        case None => Map.empty
        case Some(fs) => d.cols.iterator.map { c =>
          val mayNull = valuesByCol.get(c).map(_._1)
            .getOrElse(fs.exists(e => !noNulls(e, c)))
          // a key file whose column is ALL null contributes no values —
          // exact via the per-file null counts, so it neither blocks the
          // envelope nor requires a bloom
          val valued = fs.filterNot(allNull(_, c))
          val env =
            if (valued.nonEmpty && valued.forall(_.zones.contains(c))) {
              val zs = valued.map(_.zones(c))
              val mn = zs.map(_._1).reduce((a, b) =>
                if (ZonePrune.cmp(a, b).exists(_ <= 0)) a else b)
              val mx = zs.map(_._2).reduce((a, b) =>
                if (ZonePrune.cmp(a, b).exists(_ >= 0)) a else b)
              Some((mn, mx))
            } else None
          val bloom =
            if (valued.nonEmpty && valued.forall(_.blooms.contains(c))) {
              val bs = valued.map(e => LakeBloom.decode(
                LakeStatsSidecar.resolve(key, e.blooms(c))))
              if (bs.map(_.length).distinct.lengthCompare(1) == 0)
                Some(bs.reduce { (a, b) =>
                  val r = a.clone(); var i = 0
                  while (i < r.length) { r(i) |= b(i); i += 1 }
                  r
                })
              else None
            } else None
          c -> ((mayNull, valuesByCol.get(c).map(_._2.isEmpty)
            .getOrElse(valued.isEmpty), env, bloom))
        }.toMap
      }

    // can stored value v fall inside the file's zone for c? (absent or
    // incomparable zone = yes — only a proven miss skips)
    private def zoneAdmits(f: LakeStore.FileEntry, c: String, v: Any): Boolean =
      f.zones.get(c) match {
        case Some((mn, mx)) =>
          !(ZonePrune.cmp(v, mn).exists(_ < 0) || ZonePrune.cmp(v, mx).exists(_ > 0))
        case None => true
      }

    /** Can data file `f` hold any of this delete's keys? */
    def mayHold(f: LakeStore.FileEntry): Boolean =
      byCol.isEmpty || !d.cols.exists { c =>
        val (delMayNull, delEmpty, env, delBloom) = byCol(c)
        if (delMayNull && !noNulls(f, c)) false // NULL may match NULL
        else if (delEmpty || allNull(f, c)) true // a side has no values
        else {
          val zoneDisjoint = (f.zones.get(c), env) match {
            case (Some((fmn, fmx)), Some((dmn, dmx))) =>
              ZonePrune.cmp(fmx, dmn).exists(_ < 0) ||
                ZonePrune.cmp(dmx, fmn).exists(_ < 0)
            case _ => false
          }
          if (zoneDisjoint) true
          else {
            lazy val fBits = f.blooms.get(c).map(enc =>
              LakeBloom.decode(LakeStatsSidecar.resolve(key, enc)))
            val bitDisjoint = (fBits, delBloom) match {
              case (Some(fb), Some(db)) => !LakeBloom.mayIntersect(fb, db)
              case _ => false
            }
            if (bitDisjoint) true
            else valuesByCol.get(c) match {
              // the tight test: some actual deleted key must survive
              // BOTH the file's zone and its bloom to keep the file
              case Some((_, vals)) if fBits.isDefined || f.zones.contains(c) =>
                !vals.exists(v => zoneAdmits(f, c, v) &&
                  fBits.forall(LakeBloom.maybeContains(_, v)))
              case _ => false
            }
          }
        }
      }
  }

  /** CDF over a version range with an INCREMENTAL live-set fold: one
    * path-keyed map of main's live files is seeded at the range's entry
    * point (the single O(live files) step) and then advanced by each
    * commit's OWN delta — layout-only commits included, so an OPTIMIZE
    * between two data commits never forces a re-seed. Per-delivered-
    * commit driver work is O(commit delta), never O(live files): at
    * 800k live files a 100-commit range pays ~Σ deltas, not ~80M
    * set inserts. */
  def chunksForRange(key: String, st: LakeStore.TableState,
      from: Int, to: Int): Seq[LakeFileChunk] = {
    val live = new java.util.LinkedHashMap[String, LakeStore.FileEntry]()
    var mapV = -2
    def seed(p: Int): Unit = {
      rangeSeeds.incrementAndGet()
      live.clear()
      if (p >= 0) st.filesAt(p).foreach(f => live.put(f.path, f))
      mapV = p
    }
    (from to to).flatMap { v =>
      val snap = st.snapshots(v)
      // the change feed is MAIN's row history: branch commits surface
      // as one delta at PUBLISH (whose parent is the prior main head),
      // never earlier — the write-audit-publish contract. Branch/tag
      // commits also never move main's live set, so the map skips them.
      if (snap.ref != "main") Nil
      else {
        val p = if (snap.parent >= 0) snap.parent else v - 1
        if (p != mapV) seed(p)
        val added = st.addedAt(v)
        val removed = st.removedAt(v)
        val chunks =
          if (!snap.dataChange) Nil
          else chunksFor(key, st, v, live, added, removed)
        // advance to v by this commit's own delta (dataChange or
        // layout-only alike — both move the file set)
        removed.foreach(live.remove)
        added.foreach(f => live.put(f.path, f))
        mapV = v
        chunks
      }
    }
  }

  /** Change chunks of ONE main data commit `v`, planned from the
    * commit's own delta (`added` entries / `removed` paths) against
    * `prevLive`, the parent version's live files keyed by path — the
    * caller-maintained map [[chunksForRange]] folds. No full live-list
    * set is built here: I chunks come straight from the add-list, D
    * chunks resolve removed paths through the map (O(delta) lookups),
    * and only a commit that CHANGED equality-delete state walks the
    * live map (inherent: a keyed delete can hide rows in any pre-dating
    * file). */
  def chunksFor(key: String, st: LakeStore.TableState, v: Int,
      prevLive: java.util.Map[String, LakeStore.FileEntry],
      added: Vector[LakeStore.FileEntry],
      removed: Vector[String]): Seq[LakeFileChunk] = {
    val snap = st.snapshots(v)
    if (!snap.dataChange || snap.ref != "main") return Nil
    val pIdx = if (snap.parent >= 0) snap.parent else v - 1
    val prev = st.snapshots(pIdx)
    // delete state through the paged accessors: a CDF range can reach
    // versions whose inline delete lists paged out with their deltas
    val snapDeletes = st.deletesAt(v)
    val prevDeletes = st.deletesAt(pIdx)
    val snapEq = st.eqDeletesAt(v)
    val prevEq = st.eqDeletesAt(pIdx)
    val removedSet = removed.toSet // O(commit delta)
    def dvMap(ds: Vector[LakeStore.DeleteEntry]): Map[String, (Seq[String], Long)] =
      ds.groupBy(_.dataFile).map { case (df, es) =>
        df -> (es.map(e => LakeStore.resolveRaw(key, e.path)), es.map(_.rows).sum)
      }
    val dvAtV = dvMap(snapDeletes)
    val dvAtPrev = dvMap(prevDeletes)
    // equality deletes in chunk form: the rows of a file are dead at a
    // version exactly when a delete with a LATER sequence names their
    // key — D chunks must not resurrect them, and an upsert commit's
    // implicit deletes are the include-mode inverse
    def eqChunk(d: LakeStore.EqDelete, schema: StructType): LakeEqDel = {
      val typeByPhys = schema.fields.iterator
        .map(f => LakeStore.physicalName(f) -> f.dataType).toMap
      LakeEqDel(d.cols, d.cols.map(typeByPhys),
        d.files.map(LakeStore.resolveRaw(key, _)))
    }
    def priorEq(f: LakeStore.FileEntry): Seq[LakeEqDel] =
      prevEq.filter(_.seq > f.seq).map(eqChunk(_, prev.schema))
    // an ADDED file can arrive with rows ALREADY dead by equality
    // deletes carried in the same commit: a PUBLISH fast-forwards a
    // branch whose upserts killed keys in branch-added files, and a
    // RESTORE re-adds files with their old seqs under re-introduced
    // deletes. An ordinary append's own files have seq == v, so no
    // delete's seq exceeds it and the probe set is empty — this costs
    // nothing on the hot path. I chunks are exactly the commit's own
    // add-list (a commit never adds an already-live path; the map
    // lookup guards the invariant cheaply).
    val iChunks = added.filterNot(f => prevLive.containsKey(f.path)).map { f =>
      val (dv, n) = dvAtV.getOrElse(f.path, (Nil, 0L))
      LakeFileChunk(LakeStore.resolvePath(key, f), f.cols, f.rows, dv, n,
        change = "I", version = v.toLong,
        eqDel = snapEq.filter(_.seq > f.seq).map(eqChunk(_, snap.schema)))
    }
    // D chunks: the commit's removed paths resolved to their manifest
    // entries through the parent live map — O(delta) lookups
    val dChunks = removed.flatMap(p => Option(prevLive.get(p))).map { f =>
      val (dv, n) = dvAtPrev.getOrElse(f.path, (Nil, 0L))
      LakeFileChunk(LakeStore.resolvePath(key, f), f.cols, f.rows, dv, n,
        change = "D", version = v.toLong, eqDel = priorEq(f))
    }
    // implicit deletes: every pre-dating live file emits exactly its
    // rows whose keys a NEW delete names (include mode), minus rows
    // already dead before this commit. "New" means new RELATIVE TO THE
    // PARENT, not seq == v: a PUBLISH delivers a branch's upsert
    // deletes in one commit (their seqs are branch versions), and a
    // RESTORE re-introduces deletes from the target snapshot — both
    // must emit the row-level D side of the batch they land.
    // "live at both versions" = in the parent map and not removed by
    // this commit — O(1) per probe, no current-version set build
    def carried(f: LakeStore.FileEntry): Boolean = !removedSet.contains(f.path)
    import scala.jdk.CollectionConverters._
    def prevLiveIter: Iterator[LakeStore.FileEntry] =
      prevLive.values().iterator().asScala
    val prevEqSet = prevEq.toSet
    val newEq = snapEq.filterNot(prevEqSet)
    // key-stats pruning of the fan-outs: a delete's own data files (the
    // key source) resolve through this commit's add-list or the parent
    // live map — their zones/blooms/null-counts bound which carried
    // files can possibly contain the deleted keys, so the plan emits
    // O(files-admitting-the-keys) chunks, not O(live files). Dropping a
    // provably-key-free delete from a chunk's include list is sound for
    // the same reason the chunk itself can be skipped: include-mode
    // emits only rows whose key the probe set names, and the stats
    // prove there are none in this file.
    val addedByPath = added.iterator.map(f => f.path -> f).toMap
    def statsOf(eqs: Vector[LakeStore.EqDelete],
        schema: StructType): Vector[(LakeStore.EqDelete, EqKeyStats)] =
      eqs.map { d =>
        val es = d.files.flatMap(p =>
          addedByPath.get(p).orElse(Option(prevLive.get(p))))
        d -> new EqKeyStats(key, d,
          if (es.length == d.files.length) Some(es) else None,
          eqChunk(d, schema))
      }
    def fanOut(eqs: Vector[LakeStore.EqDelete], schema: StructType,
        emit: (LakeStore.FileEntry, Vector[LakeStore.EqDelete]) => LakeFileChunk): Seq[LakeFileChunk] =
      if (eqs.isEmpty) Nil
      else {
        val pruners = statsOf(eqs, schema)
        prevLiveIter.filter(f => carried(f) && eqs.exists(_.seq > f.seq))
          .flatMap { f =>
            val hitting = pruners.collect {
              case (d, pr) if d.seq > f.seq && pr.mayHold(f) => d }
            if (hitting.isEmpty) { upsertFanoutPruned.incrementAndGet(); None }
            else { upsertFanoutEmitted.incrementAndGet(); Some(emit(f, hitting)) }
          }.toSeq
      }
    val upserted = fanOut(newEq, snap.schema, { (f, hitting) =>
      val (dv, n) = dvAtPrev.getOrElse(f.path, (Nil, 0L))
      LakeFileChunk(LakeStore.resolvePath(key, f), f.cols, f.rows, dv, n,
        change = "D", version = v.toLong, eqDel = priorEq(f),
        eqIncl = hitting.map(eqChunk(_, snap.schema)))
    })
    // the inverse: equality deletes GONE relative to the parent (a
    // RESTORE rolling back an upsert) resurrect the rows they hid —
    // emit them as I, include-mode on the vanished probes, minus rows
    // still dead under the commit's remaining deletes or its DVs.
    val snapEqSet = snapEq.toSet
    val goneEq = prevEq.filterNot(snapEqSet)
    val resurrected = fanOut(goneEq, prev.schema, { (f, hitting) =>
      val (dv, n) = dvAtV.getOrElse(f.path, (Nil, 0L))
      LakeFileChunk(LakeStore.resolvePath(key, f), f.cols, f.rows, dv, n,
        change = "I", version = v.toLong,
        eqDel = snapEq.filter(_.seq > f.seq).map(eqChunk(_, snap.schema)),
        eqIncl = hitting.map(eqChunk(_, prev.schema)))
    })
    // merge-on-read: sidecars NEW at v over files that were ALREADY
    // live at v-1 — each is O(positions deleted), read include-mode.
    // A file ADDED at v arrives with its DVs already subtracted from
    // its own I chunk (a CLONE carries the source's vectors in its
    // first commit); those positions were never visible here, so they
    // are part of the insert shape, not deletions.
    val prevEntries = prevDeletes.toSet
    val newDv = snapDeletes.filterNot(prevEntries).groupBy(_.dataFile)
    val morDeletes = newDv.iterator.collect {
      case (df, es) if prevLive.containsKey(df) && !removedSet.contains(df) =>
        val f = prevLive.get(df)
        LakeFileChunk(LakeStore.resolvePath(key, f), f.cols, f.rows,
          es.map(e => LakeStore.resolveRaw(key, e.path)), es.map(_.rows).sum,
          dvInclude = true, change = "D", version = v.toLong)
    }.toSeq
    // the position-vector inverse of `resurrected`: DVs GONE relative
    // to the parent (a RESTORE rolling back a merge-on-read DELETE)
    // resurrect exactly their positions out of the still-carried data
    // file — include-mode on the vanished vector, O(restored
    // positions). Equality deletes still live at v keep their gate
    // (a resurrected position whose key a post-dating upsert names
    // stays dead); overlapping vectors on one position cannot occur
    // (a DELETE only ever records then-visible positions).
    val snapEntrySet = snapDeletes.toSet
    val goneDv = prevDeletes.filterNot(snapEntrySet).groupBy(_.dataFile)
    val dvResurrected = goneDv.iterator.collect {
      case (df, es) if prevLive.containsKey(df) && !removedSet.contains(df) =>
        val f = prevLive.get(df)
        LakeFileChunk(LakeStore.resolvePath(key, f), f.cols, f.rows,
          es.map(e => LakeStore.resolveRaw(key, e.path)), es.map(_.rows).sum,
          dvInclude = true, change = "I", version = v.toLong,
          eqDel = snapEq.filter(_.seq > f.seq).map(eqChunk(_, snap.schema)))
    }.toSeq
    iChunks ++ dChunks ++ morDeletes ++ dvResurrected ++ upserted ++ resurrected
  }
}

/** `<table>.changes` — the change feed as a TABLE (resolved by
  * identifier suffix like the p41 metadata tables): batch-readable
  * (the full feed over a version range) and STREAMABLE
  * (`readStream.table("cat.t.changes")`), which is what makes a lake
  * table with row-level deletes consumable incrementally at all — the
  * plain streaming source ([[LakeMicroBatchStream]]) correctly poisons
  * on non-append history, and this is the documented fallback. Schema =
  * the parent's columns + `_change` (I/D) + `_commit_version`. */
object LakeChangesTable {
  val Kind = "changes"
  val ChangeCol = "_change"
  val VersionCol = "_commit_version"

  def schemaOf(parent: StructType): StructType = StructType(
    parent.fields.toSeq :+
      StructField(ChangeCol, org.apache.spark.sql.types.StringType, nullable = false) :+
      StructField(VersionCol, org.apache.spark.sql.types.LongType, nullable = false))
}

class LakeChangesTable(parentKey: String) extends Table with SupportsRead {
  private def st = LakeStore.get(parentKey).getOrElse(
    throw new NoSuchTableException(parentKey.split('.').toSeq))
  override def name(): String = s"$parentKey.${LakeChangesTable.Kind}"
  override def schema(): StructType = LakeChangesTable.schemaOf(st.schema)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeChangesScanBuilder(parentKey, schema(), options)
}

/** Column pruning only — the feed's per-commit file sets are already
  * minimal; predicates stay with Spark. `startingVersion` /
  * `endingVersion` options bound the BATCH read (defaults: the vacuum
  * horizon's first diffable version, resp. latest). */
class LakeChangesScanBuilder(parentKey: String, full: StructType,
    options: CaseInsensitiveStringMap) extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new LakeChangesScan(parentKey, required,
    Option(options.get("startingVersion")).map(_.toInt),
    Option(options.get("endingVersion")).map(_.toInt))
}

class LakeChangesScan(parentKey: String, required: StructType,
    startingVersion: Option[Int], endingVersion: Option[Int])
    extends Scan with Batch {
  private def st = LakeStore.get(parentKey).getOrElse(
    throw new NoSuchTableException(parentKey.split('.').toSeq))
  private def phys: Map[String, String] = LakeStore.physicalMap(st.schema)
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"GraftLakeChanges($parentKey)"

  override def planInputPartitions(): Array[InputPartition] = {
    val s0 = st
    // a diff of version v needs v-1 readable: the first deliverable
    // version after a VACUUM is earliest+1
    val from = startingVersion.getOrElse(s0.earliest + 1)
    val to = endingVersion.getOrElse(s0.latestVersion)
    if (from <= to) LakeStore.requireReadable(parentKey, from - 1)
    LakeFilePartition.pack(LakeCdf.chunksForRange(parentKey, s0, from, to))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new LakeReaderFactory(required, phys)

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new LakeCdfMicroBatchStream(parentKey, required, phys)
}

/** The change feed as a STREAMING SOURCE: offsets are commit versions
  * (same shape as [[LakeMicroBatchStream]]), each micro-batch delivers
  * the per-commit change chunks of `(start, end]` — and unlike the
  * plain source, EVERY data commit streams: copy-on-write rewrites,
  * merge-on-read deltas, RESTOREs. Exactly-once across restarts via
  * the checkpointed version offset; a resume below the vacuum horizon
  * fails with the retention error, not a task FileNotFound. */
class LakeCdfMicroBatchStream(key: String, required: StructType,
    physicalOf: Map[String, String] = Map.empty)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset}

  private case class VersionOffset(v: Int) extends V2Offset {
    override def json: String = s"""{"version":$v}"""
  }
  private def versionOf(o: V2Offset): Int = o match {
    case VersionOffset(v) => v
    case other =>
      val s = other.json
      s.substring(s.indexOf(':') + 1, s.indexOf('}')).trim.toInt
  }
  private def state = LakeStore.get(key).getOrElse(
    throw new NoSuchTableException(key.split('.').toSeq))

  override def initialOffset(): V2Offset = VersionOffset(0)
  override def latestOffset(): V2Offset = VersionOffset(state.latestVersion)
  override def deserializeOffset(json: String): V2Offset =
    VersionOffset(json.split(':')(1).stripSuffix("}").trim.toInt)

  override def planInputPartitions(start: V2Offset, end: V2Offset): Array[InputPartition] = {
    val st = state
    val (s0, e0) = (versionOf(start), versionOf(end))
    // the diff of version s0+1 reads against snapshot s0
    if (s0 + 1 <= e0) LakeStore.requireReadable(key, s0)
    LakeFilePartition.pack(LakeCdf.chunksForRange(key, st, s0 + 1, e0))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeReaderFactory(required, physicalOf)
  override def commit(end: V2Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One file's slice of an input partition: absolute path, the columns
  * the file physically stores (pre-ALTER files lack later columns), its
  * manifest row count (serves metadata-only scans without opening the
  * file), and the absolute paths + total positions of the
  * position-delete sidecars over this file (merge-on-read — empty for
  * copy-on-write tables). `dvInclude=false` (the scan default) SKIPS
  * the sidecar positions; `dvInclude=true` inverts it and emits ONLY
  * those positions — how the change feed reads "the rows a
  * merge-on-read commit deleted" straight out of the untouched data
  * file. `change`/`version` tag every row of a change-feed chunk
  * (null/-1 for plain scans). */
case class LakeFileChunk(path: String, cols: Seq[String], rows: Long,
    dv: Seq[String] = Nil, dvRows: Long = 0L, dvInclude: Boolean = false,
    change: String = null, version: Long = -1L,
    eqDel: Seq[LakeEqDel] = Nil, eqIncl: Seq[LakeEqDel] = Nil) {
  /** Rows this chunk delivers, from manifest counts alone — EXACT for
    * position vectors; callers gate the count-only fast paths off when
    * equality deletes are in play (their row impact is key-resolved at
    * read time, not manifest-known). */
  def deliveredRows: Long = if (dvInclude) dvRows else rows - dvRows
}

/** One equality-delete obligation attached to a scanned chunk: the key
  * COLUMNS (physical names + types) and the upsert data files (absolute
  * paths) whose key sets define the deleted keys. In `eqDel` position a
  * matching row is SKIPPED (the scan default); in `eqIncl` position the
  * chunk emits ONLY matching rows — how the change feed reads "the rows
  * an upsert implicitly deleted" straight out of the old files. */
case class LakeEqDel(cols: Seq[String],
    dts: Seq[org.apache.spark.sql.types.DataType], files: Seq[String])

/** An input partition = a BIN of file chunks. Small files are packed
  * together (the file source's maxPartitionBytes move, done on manifest
  * row counts): a 500-tiny-file table becomes ~16 tasks instead of 500,
  * so per-task overhead never dominates a scan of a freshly-ingested
  * unCOMPACTed table, while large files still get one task each. */
sealed trait LakeBin extends InputPartition { def chunks: Seq[LakeFileChunk] }

case class LakeFilePartition(chunks: Seq[LakeFileChunk]) extends LakeBin

/** One input partition per PARTITION-GROUP KEY (storage-partitioned
  * join mode): carrying the key lets Spark align two identically-keyed
  * lake scans side by side and join them with ZERO exchanges — the
  * Iceberg/Delta SPJ shape. Unsplittable by contract: the key is the
  * co-location guarantee. */
case class LakeKeyedFilePartition(chunks: Seq[LakeFileChunk], key: InternalRow)
    extends LakeBin
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

object LakeFilePartition {
  /** Pack files into bins: close a bin at `maxRows` accumulated manifest
    * rows or `maxFiles` chunks, whichever first. Order-preserving. */
  def pack(chunks: Seq[LakeFileChunk], maxRows: Long = 1L << 18,
      maxFiles: Int = 32): Array[InputPartition] = {
    val bins = Seq.newBuilder[LakeFilePartition]
    var cur = Vector.empty[LakeFileChunk]
    var rows = 0L
    chunks.foreach { c =>
      if (cur.nonEmpty && (rows + c.rows > maxRows || cur.length >= maxFiles)) {
        bins += LakeFilePartition(cur); cur = Vector.empty; rows = 0L
      }
      cur :+= c; rows += c.rows
    }
    if (cur.nonEmpty) bins += LakeFilePartition(cur)
    bins.result().toArray
  }
}

/** Equality-delete key sets, loaded from the upsert data files' key
  * COLUMNS (a columnar read of just those columns) — bounded by the
  * upserted row count since the last compaction, never by table size.
  * Shared by the EXECUTOR-side reader (row-level probes during the
  * scan's merge) and the DRIVER-side change-feed planner (probing
  * candidate files' bloom filters with the actual deleted key values
  * to bound the upsert fan-out): one JVM-wide bounded LRU, since the
  * key sets are immutable once written, exactly like stats sidecars. */
object LakeEqKeys {
  private val cache =
    new java.util.LinkedHashMap[LakeEqDel, java.util.HashSet[Seq[Any]]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[LakeEqDel, java.util.HashSet[Seq[Any]]]): Boolean =
        size() > 64
    }

  def load(e: LakeEqDel): java.util.HashSet[Seq[Any]] = {
    cache.synchronized {
      val hit = cache.get(e)
      if (hit != null) return hit
    }
    val set = new java.util.HashSet[Seq[Any]]()
    val keySchema = StructType(e.cols.zip(e.dts).map { case (c, dt) =>
      StructField(c, dt) })
    e.files.foreach { f =>
      val conf = new Configuration(LakeStore.sharedHconf)
      conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, keySchema.json)
      conf.setBoolean("spark.sql.parquet.binaryAsString", false)
      conf.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
      conf.setBoolean("spark.sql.caseSensitive", false)
      conf.setBoolean("spark.sql.parquet.fieldId.read.enabled", false)
      conf.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
      conf.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
      conf.setBoolean("spark.sql.parquet.variant.annotateLogicalType.enabled", true)
      conf.setBoolean("spark.sql.parquet.ignoreVariantAnnotation", false)
      conf.setBoolean("spark.sql.parquet.reader.respectUnknownTypeAnnotation.enabled", false)
      val spec = org.apache.spark.sql.catalyst.util.RebaseDateTime
        .RebaseSpec(org.apache.spark.sql.internal.LegacyBehaviorPolicy.CORRECTED)
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder[InternalRow](
          new ParquetReadSupport(None, enableVectorizedReader = false, spec, spec),
          new Path(f))
        .withConf(conf).build()
      try {
        var row = reader.read()
        while (row != null) {
          set.add(e.dts.indices.map(i =>
            if (row.isNullAt(i)) null
            else LakeStore.toStored(row.get(i, e.dts(i)))))
          row = reader.read()
        }
      } finally reader.close()
    }
    cache.synchronized { cache.put(e, set) }
    set
  }
}

/** Executor-side parquet reader: opens the file group with Spark's own
  * ParquetReadSupport (the same record materializer the file source
  * uses), requests only the columns that are BOTH required and present
  * in the file, and pads required-but-absent columns (added by a later
  * ALTER) with null. A fully-pruned read (count(*)) never opens the
  * file at all — the manifest row count answers it. */
class LakeReaderFactory(required: StructType,
    physicalOf: Map[String, String] = Map.empty) extends PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.util.RebaseDateTime.RebaseSpec
  import org.apache.spark.sql.internal.LegacyBehaviorPolicy

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val bin = partition.asInstanceOf[LakeBin]

    if (required.isEmpty && bin.chunks.forall(c =>
        c.eqDel.isEmpty && c.eqIncl.isEmpty)) {
      // metadata-only read: the manifest row count, minus rows hidden by
      // deletion vectors, answers without opening anything (equality
      // deletes force a key-column read even for count(*))
      return new PartitionReader[InternalRow] {
        private var remaining = bin.chunks.map(_.deliveredRows).sum
        private val empty = new GenericInternalRow(0)
        override def next(): Boolean = { remaining -= 1; remaining >= 0 }
        override def get(): InternalRow = empty
        override def close(): Unit = ()
      }
    }

    // chain the bin's files: open one at a time, advance on exhaustion
    new PartitionReader[InternalRow] {
      private val it = bin.chunks.iterator
      private var cur: PartitionReader[InternalRow] = _
      override def next(): Boolean = {
        while (true) {
          if (cur == null) {
            if (!it.hasNext) return false
            cur = openFile(it.next())
          }
          if (cur.next()) return true
          cur.close(); cur = null
        }
        false
      }
      override def get(): InternalRow = cur.get()
      override def close(): Unit = if (cur != null) cur.close()
    }
  }

  private def loadEqKeys(e: LakeEqDel): java.util.HashSet[Seq[Any]] =
    LakeEqKeys.load(e)

  /** Load a chunk's position-delete sidecars into one membership set —
    * bounded by the rows DELETED from this file, not the file size. */
  private def loadDv(p: LakeFileChunk): java.util.HashSet[java.lang.Long] = {
    val set = new java.util.HashSet[java.lang.Long]()
    p.dv.foreach { dvPath =>
      val path = new Path(dvPath)
      val fs = path.getFileSystem(LakeStore.sharedHconf)
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(fs.open(path)))
      try {
        val n = in.readInt()
        var i = 0
        while (i < n) { set.add(in.readLong()); i += 1 }
      } finally in.close()
    }
    set
  }

  private def openFile(p: LakeFileChunk): PartitionReader[InternalRow] = {
    // metadata + change-feed columns are computed, never read from parquet
    val computed = Set(GraftLakeTable.FileMetaCol, GraftLakeTable.PosMetaCol,
      LakeChangesTable.ChangeCol, LakeChangesTable.VersionCol)
    val metaIdx = required.fields.zipWithIndex.collect {
      case (f, i) if f.name == GraftLakeTable.FileMetaCol => (i, true)
      case (f, i) if f.name == GraftLakeTable.PosMetaCol => (i, false)
    }
    // change-feed tags: constant per chunk (the commit's change class
    // and version), so resolved once here
    val chunkIdx: Array[(Int, Any)] = required.fields.zipWithIndex.collect {
      case (f, i) if f.name == LakeChangesTable.ChangeCol =>
        (i, org.apache.spark.unsafe.types.UTF8String.fromString(p.change): Any)
      case (f, i) if f.name == LakeChangesTable.VersionCol => (i, p.version: Any)
    }
    // column mapping: files store PHYSICAL names — membership tests and
    // the parquet read request translate through the schema's mapping
    // (a renamed column reads its birth-name data from every era's file)
    val availIdx = required.fields.zipWithIndex
      .filter { case (f, _) =>
        p.cols.contains(physicalOf.getOrElse(f.name, f.name)) &&
          !computed.contains(f.name) }
    val fileSchema = StructType(availIdx.map { case (f, _) =>
      f.copy(name = physicalOf.getOrElse(f.name, f.name),
        metadata = org.apache.spark.sql.types.Metadata.empty) })

    // EQUALITY deletes: key columns must be read even when pruned from
    // `required` — appended to the parquet request (physical names, like
    // every file read), never copied to the output row. A file that
    // physically lacks a key column probes null for it.
    val eqExtra: Seq[StructField] = (p.eqDel ++ p.eqIncl)
      .flatMap(e => e.cols.zip(e.dts)).distinct
      .collect { case (c, dt)
        if !fileSchema.fieldNames.contains(c) && p.cols.contains(c) =>
          StructField(c, dt) }
    val readSchema = StructType(fileSchema.fields ++ eqExtra)

    val conf = new Configuration(LakeStore.sharedHconf)
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, readSchema.json)
    conf.setBoolean("spark.sql.parquet.binaryAsString", false)
    conf.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
    conf.setBoolean("spark.sql.caseSensitive", false)
    conf.setBoolean("spark.sql.parquet.fieldId.read.enabled", false)
    conf.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
    conf.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    conf.setBoolean("spark.sql.parquet.variant.annotateLogicalType.enabled", true)
    conf.setBoolean("spark.sql.parquet.ignoreVariantAnnotation", false)
    conf.setBoolean("spark.sql.parquet.reader.respectUnknownTypeAnnotation.enabled", false)

    val spec = RebaseSpec(LegacyBehaviorPolicy.CORRECTED)
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder[InternalRow](
        new ParquetReadSupport(None, enableVectorizedReader = false, spec, spec),
        new Path(p.path))
      .withConf(conf)
      .build()

    val dts = fileSchema.fields.map(_.dataType)
    val targetIdx = availIdx.map(_._2) // position of each read column in `required`
    val dv = if (p.dv.isEmpty) null else loadDv(p)
    def eqProbe(es: Seq[LakeEqDel]): Array[(java.util.HashSet[Seq[Any]], Array[Int], Array[org.apache.spark.sql.types.DataType])] =
      es.map { e =>
        val ords = e.cols.map(c =>
          if (readSchema.fieldNames.contains(c)) readSchema.fieldIndex(c) else -1).toArray
        (loadEqKeys(e), ords, e.dts.toArray)
      }.toArray
    val eqDelProbes = eqProbe(p.eqDel)
    val eqInclProbes = eqProbe(p.eqIncl)
    val filePathUtf8 = org.apache.spark.unsafe.types.UTF8String.fromString(p.path)

    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      private var pos: Long = -1L // physical position in the file
      override def next(): Boolean = {
        while (true) {
          cur = reader.read()
          if (cur == null) return false
          pos += 1
          // position-based deletion vectors: the scan SKIPS hidden rows;
          // a change-feed D chunk INVERTS it and emits only the
          // positions the commit deleted
          val hit = dv != null && dv.contains(pos)
          val posOk = if (p.dvInclude) hit else !hit
          // equality deletes: a row whose key matches any post-dating
          // upsert is dead (eqDel); an include-mode chunk (change feed)
          // emits ONLY the rows a new upsert killed (eqIncl)
          val eqOk = posOk && (eqDelProbes.isEmpty ||
              !eqDelProbes.exists(pr => pr._1.contains(keyAt(pr._2, pr._3)))) &&
            (eqInclProbes.isEmpty ||
              eqInclProbes.exists(pr => pr._1.contains(keyAt(pr._2, pr._3))))
          if (eqOk) return true
        }
        false
      }
      private def keyAt(ords: Array[Int],
          kdts: Array[org.apache.spark.sql.types.DataType]): Seq[Any] =
        ords.indices.map { i =>
          val o = ords(i)
          if (o < 0 || cur.isNullAt(o)) null
          else LakeStore.toStored(cur.get(o, kdts(i)))
        }
      override def get(): InternalRow = {
        // copy out of the materializer's (reusable) row, padding columns
        // the file predates with null; metadata columns are computed
        val out = new GenericInternalRow(required.length)
        var j = 0
        while (j < dts.length) {
          out.update(targetIdx(j), if (cur.isNullAt(j)) null else cur.get(j, dts(j)))
          j += 1
        }
        metaIdx.foreach { case (i, isFile) =>
          out.update(i, if (isFile) filePathUtf8 else pos)
        }
        chunkIdx.foreach { case (i, v) => out.update(i, v) }
        out
      }
      override def close(): Unit = reader.close()
    }
  }
}

/** CHECK constraints, Delta-shaped: stored as `graft.constraints.<name>`
  * table properties, validated at ALTER time against existing rows, and
  * enforced at WRITE time inside every task — appends, INSERT OVERWRITE,
  * and the row-level rewrites (UPDATE/DELETE/MERGE) all funnel through
  * the same writer, so no path can slip an invalid row in. SQL CHECK
  * semantics: a row passes when the expression is TRUE or NULL; only
  * definite FALSE violates (the standard's UNKNOWN-passes rule).
  *
  * The expression text is parsed and analyzer-resolved ON THE DRIVER
  * against the write schema (type coercion included), bound to ordinals,
  * and shipped to tasks as a Catalyst expression; each task compiles it
  * once with [[org.apache.spark.sql.catalyst.expressions.Predicate]]
  * (codegen with interpreted fallback) and evaluates per row — no
  * per-row driver involvement, so enforcement scales with the write. */
object LakeConstraints {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.expressions.{BindReferences, EqualNullSafe, Expression, Literal}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
  import org.apache.spark.sql.catalyst.types.DataTypeUtils
  import org.apache.spark.sql.types.BooleanType

  val prefix = "graft.constraints."

  /** Reject a new constraint whose expression fails analysis over the
    * table (bad syntax, unknown column) or that EXISTING rows violate —
    * Delta's add-constraint validation, one distributed count. */
  def validateNew(key: String, property: String, expr: String): Unit = {
    val name = property.stripPrefix(prefix)
    val bad =
      try SparkSession.active.table(key).where(s"NOT coalesce(($expr), true)").count()
      catch { case e: Exception => throw new IllegalArgumentException(
        s"graft_lake: CHECK constraint '$name' ($expr) does not analyze " +
          s"against $key: ${e.getMessage}", e) }
    require(bad == 0L,
      s"graft_lake: cannot add CHECK constraint '$name' ($expr) to $key — " +
        s"$bad existing row(s) violate it; nothing was committed")
  }

  /** Compile the table's constraints into (name, bound VIOLATION
    * expression) pairs over `schema`'s ordinals: the expression is true
    * iff the row definitely violates (constraint <=> false). */
  def compile(key: String, schema: StructType): Seq[(String, Expression)] =
    compileProps(LakeStore.get(key).map(_.props).getOrElse(Map.empty), schema, key)

  /** Same, from an explicit property map — the staged-table path, where
    * the constraints to enforce are the STATEMENT's, not the store's. */
  def compileProps(props: Map[String, String], schema: StructType,
      key: String): Seq[(String, Expression)] = {
    val cs = props
      .collect { case (pk, pv) if pk.startsWith(prefix) =>
        pk.stripPrefix(prefix) -> pv }
      .toSeq.sortBy(_._1)
    if (cs.isEmpty) return Nil
    val spark = SparkSession.active
    val attrs = DataTypeUtils.toAttributes(schema)
    cs.map { case (name, sql) =>
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
      val analyzed = spark.sessionState.analyzer.execute(
        Filter(parsed, LocalRelation(attrs))).asInstanceOf[Filter]
      val cond = analyzed.condition
      require(cond.resolved && cond.dataType == BooleanType,
        s"graft_lake: CHECK constraint '$name' ($sql) is not a boolean " +
          s"expression over ${key}'s columns")
      // bind against the SAME attribute instances the analyzer resolved
      // to — toAttributes mints fresh exprIds per call
      name -> BindReferences.bindReference(
        EqualNullSafe(cond, Literal(false)), attrs)
    }
  }
}

/** Per-file BLOOM FILTERS — manifest-carried, like the zones: min/max
  * zones cannot skip an EQUALITY probe on a high-cardinality id whose
  * values interleave across every file (each file's range spans the
  * table), which is exactly the "find one document by id in 100 TB"
  * lookup. A table opts columns in with `TBLPROPERTIES
  * ('graft.bloom.columns' = 'c1,c2')` (bits per file per column via
  * `graft.bloom.bits`, default 2^16 ≈ 8 KB → ~1e-8 false-positive rate
  * at 1k keys/file); the TASK that writes a file folds every non-null
  * value into the filter as the rows stream past (same single pass as
  * the zones — statistics are never recomputed by a scan), and
  * [[LakeScan.planInputPartitions]] consults it for pushed `=` / `IN`
  * compares: a file is skipped when NO probe value can be present.
  * Classic double hashing (two Murmur3 seeds, k=6 derived indexes)
  * over the value's canonical bytes; absence of a filter keeps the
  * file — superset-safe like every other skipping lever here. */
object LakeBloom {
  val K = 6
  val ColumnsProp = "graft.bloom.columns"
  val BitsProp = "graft.bloom.bits"

  def columnsOf(props: Map[String, String]): Seq[String] =
    props.get(ColumnsProp).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
  def bitsOf(props: Map[String, String]): Int = {
    val m = props.get(BitsProp).map(_.toInt).getOrElse(1 << 16)
    require(m >= 64 && (m & (m - 1)) == 0,
      s"graft_lake: $BitsProp must be a power of two >= 64, got $m")
    m
  }

  /** Canonical byte form shared with the NDV sketches ([[LakeNdv]]):
    * both indexes must agree that INT 5 and BIGINT 5 are one value. */
  private[sources] def canonicalBytes(v: Any): Array[Byte] = bytesOf(v)

  private def bytesOf(v: Any): Array[Byte] = v match {
    case s: String => s.getBytes("UTF-8")
    case b: java.lang.Boolean => Array(if (b) 1.toByte else 0.toByte)
    case d: java.lang.Double => longBytes(java.lang.Double.doubleToLongBits(d))
    case f: java.lang.Float => longBytes(java.lang.Double.doubleToLongBits(f.doubleValue()))
    case n: java.lang.Number => longBytes(n.longValue())
    case other => other.toString.getBytes("UTF-8")
  }
  private def longBytes(l: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(l).array()

  private def indexes(v: Any, m: Int): Array[Int] = {
    val bs = bytesOf(v)
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(bs, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(bs, 0x85ebca6b) | 1
    Array.tabulate(K)(i => ((h1 + i * h2) & Int.MaxValue) & (m - 1))
  }

  def newBits(m: Int): Array[Long] = new Array[Long](m / 64)
  def add(bits: Array[Long], v: Any): Unit =
    indexes(v, bits.length * 64).foreach(ix => bits(ix >> 6) |= 1L << (ix & 63))
  def maybeContains(bits: Array[Long], v: Any): Boolean =
    indexes(v, bits.length * 64).forall(ix => (bits(ix >> 6) & (1L << (ix & 63))) != 0L)

  def encode(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  /** Merge two encoded partial blooms of the SAME file (the ANALYZE
    * back-fill reduce step): plain bit OR — the same fold the writer
    * does as rows stream. */
  def merge(a: String, b: String): String = {
    val (ba, bb) = (decode(a), decode(b))
    require(ba.length == bb.length,
      s"graft_lake: bloom merge arity mismatch (${ba.length} vs ${bb.length})")
    encode(ba.indices.toArray.map(i => ba(i) | bb(i)))
  }
  def decode(s: String): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(java.util.Base64.getDecoder.decode(s))
    Array.fill(bb.remaining() / 8)(bb.getLong())
  }

  /** Does the encoded filter admit ANY of the probe values? (absent
    * filter = keep — handled by the caller). */
  def mayMatch(encoded: String, lits: Seq[Any]): Boolean = {
    val bits = decode(encoded)
    lits.exists(maybeContains(bits, _))
  }

  /** Can two same-shape filters share ANY value? Bit-intersection
    * emptiness is a SOUND disjointness proof: a value present in both
    * underlying sets sets the same K bits in both filters (same hash
    * family, same width), so those bits survive the AND — an all-zero
    * intersection means no common value exists. A non-empty
    * intersection proves nothing (collisions), and mismatched widths
    * (the table's `graft.bloom.bits` changed between writes) make the
    * bit positions incomparable — both answer "may", the keep-side
    * default. */
  def mayIntersect(a: Array[Long], b: Array[Long]): Boolean =
    a.length != b.length || a.indices.exists(i => (a(i) & b(i)) != 0L)
}

/** GENERATED and IDENTITY columns — Spark 4's native DDL, computed and
  * enforced at WRITE time inside every task (the Delta shape: Spark
  * validates the generation expression at CREATE and persists it as
  * column metadata; the connector owns the values):
  *
  *  - `GENERATED ALWAYS AS (expr)`: an omitted/NULL incoming value is
  *    COMPUTED from the row; an explicitly provided value is VALIDATED
  *    against the expression (null-safe equality) and a mismatch
  *    aborts the write — Delta's exact contract, enforced through the
  *    same bound-Catalyst-expression path as CHECK constraints (p42):
  *    compiled once on the driver, codegen'd once per task, zero
  *    per-row driver involvement. ROW-LEVEL rewrites (UPDATE/MERGE,
  *    copy-on-write and merge-on-read alike) RECOMPUTE instead of
  *    validating — Delta's recompute-on-update: the rewrite carries the
  *    stale value past a changed dependency, and recomputing is what
  *    keeps `gen = expr(deps)` true on every path; identity values are
  *    CARRIED through rewrites (assigned once, never reassigned).
  *  - `GENERATED ALWAYS AS IDENTITY (START WITH s INCREMENT BY k)`:
  *    values are writer-assigned from a HIGH-WATER MARK read off the
  *    manifest's own column zones (driver-side metadata — no data
  *    scan, no extra commit): task `p` assigns
  *    `hwm + (p * 2^20 + rowIdx) * step`, giving per-job uniqueness
  *    with Delta's same stated caveats — values are unique and
  *    direction-monotonic but NOT contiguous, and concurrent jobs
  *    from separate drivers can collide (Delta serializes via its
  *    transaction log; here in-process commits are serialized by the
  *    store lock). Explicit inserts require BY DEFAULT mode
  *    (`isAllowExplicitInsert`), as in the standard. */
object LakeDerivedColumns {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.expressions.{Alias, BindReferences, Cast, Expression}
  import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
  import org.apache.spark.sql.catalyst.types.DataTypeUtils
  import org.apache.spark.sql.catalyst.util.{GeneratedColumn, IdentityColumn}

  final case class Gen(ordinal: Int, name: String, expr: Expression)
  final case class Ident(ordinal: Int, name: String, step: Long,
      allowExplicit: Boolean, base: Long)
  final case class Spec(gens: Seq[Gen], idents: Seq[Ident]) {
    def isEmpty: Boolean = gens.isEmpty && idents.isEmpty
  }
  val empty: Spec = Spec(Nil, Nil)

  def compile(key: String, schema: StructType): Spec = {
    val genFields = schema.fields.zipWithIndex
      .filter { case (f, _) => GeneratedColumn.isGeneratedColumn(f) }
    val identFields = schema.fields.zipWithIndex
      .filter { case (f, _) => IdentityColumn.isIdentityColumn(f) }
    if (genFields.isEmpty && identFields.isEmpty) return empty
    val spark = SparkSession.active
    val attrs = DataTypeUtils.toAttributes(schema)
    val gens = genFields.map { case (f, i) =>
      val sql = GeneratedColumn.getGenerationExpression(f).get
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
      val analyzed = spark.sessionState.analyzer.execute(
        Project(Seq(Alias(parsed, f.name)()), LocalRelation(attrs))).asInstanceOf[Project]
      val child = analyzed.projectList.head.asInstanceOf[Alias].child
      val typed = if (child.dataType == f.dataType) child else Cast(child, f.dataType)
      // bind against the SAME attribute instances the analyzer saw
      Gen(i, f.name, BindReferences.bindReference(typed, attrs))
    }.toSeq
    val idents = identFields.map { case (f, i) =>
      val spec = IdentityColumn.getIdentityInfo(f).get
      // high-water mark from the manifest zones of EVERY add-list ever
      // (a deleted row's identity is never reused — Delta's rule); the
      // column's own write-time statistics double as the sequencer
      // state. Zones are keyed by PHYSICAL name (column mapping): a
      // renamed identity column keeps its birth-name zones, and looking
      // them up logically would silently reset the sequencer to START
      // WITH. Folded INCREMENTALLY through LakeStore.identityHighWater:
      // each write statement folds only the commits that landed since
      // its last fold, so sequencer setup is O(new commits) per append
      // — never a full history walk through paged deltas (a fresh JVM
      // pays one full fold, then increments).
      val phys = LakeStore.physicalName(f)
      val range: Option[(Long, Long)] = LakeStore.get(key).flatMap { st =>
        val cached = LakeStore.identityHighWater.get((key, phys))
          .filter(_._1 <= st.latestVersion)
        val from = cached.map(_._1).getOrElse(-1)
        var acc = cached.map(c => (c._2, c._3))
        ((from + 1) to st.latestVersion).foreach { v =>
          st.addedAt(v).flatMap(_.zones.get(phys))
            .flatMap { case (mn, mx) => Seq(mn, mx) }
            .collect { case n: java.lang.Number => n.longValue() }
            .foreach { x =>
              acc = Some(acc.fold((x, x)) { case (a, b) =>
                (math.min(a, x), math.max(b, x)) })
            }
        }
        acc.foreach { case (a, b) =>
          LakeStore.identityHighWater.update((key, phys),
            (st.latestVersion, a, b))
        }
        acc
      }
      val base = range match {
        case None => spec.getStart
        case Some((mn, mx)) =>
          if (spec.getStep > 0) math.max(mx + spec.getStep, spec.getStart)
          else math.min(mn + spec.getStep, spec.getStart)
      }
      Ident(i, f.name, spec.getStep, spec.isAllowExplicitInsert, base)
    }.toSeq
    Spec(gens, idents)
  }
}

/** Iceberg-style metadata tables, resolved by identifier suffix:
  * `<table>.history` (one row per commit — DESCRIBE HISTORY) and
  * `<table>.files` (one row per LIVE data file). Both are driver-side
  * manifest reads — commits and file entries are exactly what a Delta
  * snapshot already holds in memory (KB per thousand files), so a
  * single input partition is the honest plan at any data scale: the
  * metadata is small even when the data is 100 TB. */
object LakeMetaTable {
  import org.apache.spark.sql.types.{BooleanType, LongType, StringType}

  val kinds: Set[String] =
    Set("history", "files", "partitions", "refs", "detail", "stats")

  def schemaOf(kind: String): StructType = kind match {
    case "partitions" => StructType(Seq(
      StructField("partition", StringType, nullable = false),
      StructField("n_files", LongType, nullable = false),
      StructField("rows", LongType, nullable = false),
      // rows hidden by live deletion vectors within this partition
      StructField("dv_rows", LongType, nullable = false)))
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("action", StringType, nullable = false),
      StructField("data_change", BooleanType, nullable = false),
      StructField("files_added", LongType, nullable = false),
      StructField("files_removed", LongType, nullable = false),
      StructField("rows_added", LongType, nullable = false),
      StructField("rows_removed", LongType, nullable = false),
      // null = a whole-table commit (no per-group metadata)
      StructField("groups_touched", LongType, nullable = true)))
    case "files" => StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("partition", StringType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("n_cols", LongType, nullable = false),
      // rows hidden by live deletion vectors (merge-on-read tables)
      StructField("dv_rows", LongType, nullable = false),
      // on-disk parquet size from the manifest (0 = pre-bytes manifest)
      StructField("bytes", LongType, nullable = false)))
    // Delta's DESCRIBE DETAIL, one row: the table's operational footprint
    // straight from the manifest — no filesystem listing, no data reads
    case "detail" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("num_files", LongType, nullable = false),
      StructField("size_bytes", LongType, nullable = false),
      // manifest rows minus position-delete rows; -1 = UNKNOWN while
      // equality deletes are live (their row impact is key-resolved at
      // read time — the manifest cannot count it, and an upper bound
      // masquerading as a count is how dashboards lie). Mirrors the
      // aggregate-pushdown refusal rule.
      StructField("rows", LongType, nullable = false),
      StructField("partition_columns", StringType, nullable = false),
      StructField("num_commits", LongType, nullable = false),
      StructField("num_refs", LongType, nullable = false),
      StructField("num_properties", LongType, nullable = false),
      StructField("num_live_dvs", LongType, nullable = false),
      StructField("num_eq_deletes", LongType, nullable = false)))
    // table-level column statistics from the manifest's KMV sketches
    // (Iceberg's ANALYZE-written ndv stat, readable as a table): one
    // row per column named by `graft.ndv.columns`. `ndv` counts values
    // WRITTEN into live files — rows hidden by deletion vectors or
    // equality deletes still count (a distinct sketch cannot subtract);
    // `is_exact` = every live file's sketch is below saturation, so the
    // number is a true COUNT(DISTINCT) rather than a ±1/sqrt(K) estimate.
    case "stats" => StructType(Seq(
      StructField("column", StringType, nullable = false),
      StructField("ndv", LongType, nullable = false),
      StructField("is_exact", BooleanType, nullable = false),
      StructField("files_sketched", LongType, nullable = false),
      StructField("files_total", LongType, nullable = false)))
    // Iceberg's refs table: one row per named ref (branch/tag) plus main
    case "refs" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("head_version", LongType, nullable = false),
      StructField("base_version", LongType, nullable = false),
      // -1 = unknown while the ref head has live equality deletes
      StructField("rows", LongType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"graft_lake: unknown metadata table kind $other")
  }

  /** Materialize the metadata rows from the manifest (driver-side,
    * bounded by commit/file counts). Values are the serializable
    * primitives the reader converts to Catalyst forms. */
  /** Render a group key with the current spec's column names when the
    * arity matches; positionally otherwise (pre-evolution groups). */
  private def partLabel(st: LakeStore.TableState, g: List[Any]): String =
    if (g.length == st.partitionCols.length)
      st.partitionCols.zip(g).map { case (c, v) => s"$c=$v" }.mkString("/")
    else g.mkString("legacy[", "/", "]")

  def rows(st: LakeStore.TableState, kind: String): Vector[Vector[Any]] = kind match {
    case "partitions" =>
      // one row per live partition group (Iceberg's `partitions` table):
      // the manifest's group-level footprint, driver-side
      val dvRows = st.deletes.groupBy(_.dataFile).map { case (df, es) =>
        df -> es.map(_.rows).sum }
      st.current.groupBy(_.group).toVector
        .sortBy { case (g, _) => g.map(String.valueOf).mkString("/") }
        .map { case (g, fs) =>
          Vector[Any](partLabel(st, g), fs.length.toLong,
            fs.map(_.rows).sum, fs.map(f => dvRows.getOrElse(f.path, 0L)).sum)
        }
    case "history" =>
      // per-commit add/remove straight off the deltas; rows of removed
      // files resolve through a running path->rows map built from every
      // add seen so far (a manifest path is added before it is ever
      // removed, and data paths are uuid-unique per table). The only
      // wrinkle is an ANALYZE-style re-add (same path removed and
      // re-added in one commit to swap its stats): net it out so the
      // table reports what DESCRIBE HISTORY means — files that actually
      // entered or left the live set.
      val rowsOf = scala.collection.mutable.HashMap.empty[String, Long]
      (0 to st.latestVersion).iterator.map { v =>
        val snap = st.snapshots(v)
        val add = st.addedAt(v)
        val remPaths = st.removedAt(v)
        add.foreach(f => rowsOf.update(f.path, f.rows))
        val remSet = remPaths.toSet
        val addPaths = add.iterator.map(_.path).toSet
        val netAdded = add.filterNot(f => remSet.contains(f.path))
        val netRemoved = remPaths.filterNot(addPaths.contains)
        Vector[Any](v.toLong, snap.action, snap.dataChange,
          netAdded.length.toLong, netRemoved.length.toLong,
          netAdded.iterator.map(_.rows).sum,
          netRemoved.iterator.map(p => rowsOf.getOrElse(p, 0L)).sum,
          st.commitGroupsAt(v).map(g => java.lang.Long.valueOf(g.size.toLong)).orNull)
      }.toVector
    case "files" =>
      val dvRows = st.deletes.groupBy(_.dataFile).map { case (df, es) =>
        df -> es.map(_.rows).sum }
      st.current.map { f =>
        Vector[Any](f.path, partLabel(st, f.group),
          f.rows, f.cols.length.toLong, dvRows.getOrElse(f.path, 0L), f.bytes)
      }
    case "detail" =>
      Vector(Vector[Any](st.key, "graft_lake",
        st.current.length.toLong,
        st.current.map(_.bytes).sum,
        if (st.eqDeletes.nonEmpty) -1L
        else st.current.map(_.rows).sum - st.deletes.map(_.rows).sum,
        st.partitionCols.mkString(","),
        (st.latestVersion + 1).toLong,
        st.refNames.length.toLong + 1L, // named refs + main
        st.props.size.toLong,
        st.deletes.length.toLong,
        st.eqDeletes.length.toLong))
    case "stats" =>
      // a manifest fold: merge each sketched column's per-file KMV sets
      // (union, exact while every input is exact) — zero data I/O, the
      // same numbers LakeScan.estimateStatistics hands Catalyst
      val phys = LakeStore.physicalMap(st.schema)
      LakeNdv.columnsOf(st.props).sorted.toVector.map { c =>
        val p = phys.getOrElse(c, c)
        val sketches = st.current.flatMap(_.ndv.get(p))
          .map(LakeStatsSidecar.resolve(st.key, _))
        val (ndv, exact) = LakeNdv.mergedNdv(sketches)
        Vector[Any](c, ndv, exact && sketches.length == st.current.length,
          sketches.length.toLong, st.current.length.toLong)
      }
    case "refs" =>
      def liveRows(v: Int): Long = {
        if (st.eqDeletesAt(v).nonEmpty) -1L
        // ref heads are materialized — O(1); never a chain replay here
        else st.filesAt(v).map(_.rows).sum - st.deletesAt(v).map(_.rows).sum
      }
      val named = st.refNames.map { r =>
        Vector[Any](r,
          if (st.isTag(r)) "tag" else "branch",
          st.headOf(r).toLong, st.snapshots(st.creationOf(r)).parent.toLong,
          liveRows(st.headOf(r)))
      }.toVector
      Vector[Any]("main", "branch", st.mainHead.toLong, 0L,
        liveRows(st.mainHead)) +: named
  }
}

class LakeMetaTable(parentKey: String, kind: String) extends Table with SupportsRead {
  override def name(): String = s"$parentKey.$kind"
  override def schema(): StructType = LakeMetaTable.schemaOf(kind)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new LakeMetaScan(parentKey, kind)
}

class LakeMetaScan(parentKey: String, kind: String) extends Scan with Batch {
  override def readSchema(): StructType = LakeMetaTable.schemaOf(kind)
  override def toBatch: Batch = this
  override def description(): String = s"GraftLakeMeta($parentKey.$kind)"
  override def planInputPartitions(): Array[InputPartition] = {
    val st = LakeStore.get(parentKey).getOrElse(
      throw new NoSuchTableException(parentKey.split('.').toSeq))
    Array(LakeMetaPartition(LakeMetaTable.rows(st, kind)))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new LakeMetaReaderFactory(readSchema())
}

case class LakeMetaPartition(rows: Vector[Vector[Any]]) extends InputPartition

class LakeMetaReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = partition.asInstanceOf[LakeMetaPartition].rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val vals = it.next()
        val row = new GenericInternalRow(schema.length)
        var i = 0
        while (i < schema.length) {
          row.update(i, LakeStore.toCatalyst(vals(i), schema(i).dataType))
          i += 1
        }
        cur = row
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}

object LakeWriteBuilder {
  /** What the commit does with the produced files. */
  sealed trait Mode
  /** Plain append (the default). */
  case object AppendMode extends Mode
  /** Whole-table swap (INSERT OVERWRITE without filters / overwrite(true)). */
  case object TruncateMode extends Mode
  /** `INSERT OVERWRITE ... PARTITION (...)` / replaceWhere: swap exactly
    * the PRE-RESOLVED partition groups (decided at build time from the
    * static filter — Delta's partition-scoped replaceWhere contract).
    * `guards` re-states the filter against the WRITTEN data: one
    * (group-key ordinal, allowed values) pair per equality/IN conjunct —
    * commit refuses any produced file whose group falls outside them
    * (Delta's replaceWhere DATA VALIDATION: landing rows the filter
    * never matched would silently corrupt untouched partitions). The
    * guards, not the matched-group set, are the row contract: writing a
    * filter-satisfying row into a partition with no live files yet is
    * legal (the matched set cannot list a group that does not exist). */
  final case class OverwriteGroups(groups: Set[List[Any]],
      guards: Seq[(Int, Set[Any])]) extends Mode
  /** Dynamic partition overwrite: swap exactly the groups the write
    * itself produces — partitions the data does not touch stay whole. */
  case object DynamicMode extends Mode
  /** Row-level operation commit: swap the groups the row-level scan
    * actually emitted (resolved at execution by the operation). */
  final case class RowLevelMode(groups: () => Option[Set[List[Any]]]) extends Mode
}

class LakeWriteBuilder(key: String, writeSchema: StructType,
    private var mode: LakeWriteBuilder.Mode,
    queryId: String = "",
    upsertCols: Seq[String] = Nil,
    copyIds: Option[Seq[String]] = None,
    layoutOnly: Boolean = false) extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsOverwriteV2
    with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
  import LakeWriteBuilder._
  import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}

  /** OPTIMISTIC READ VERSION: the table version this statement planned
    * against, captured when the write is built (analysis time — at or
    * before the statement's scan). Commit classifies every commit that
    * lands in between (the Delta ConflictChecker): non-conflicting ones
    * are rebased over, conflicting ones abort loudly. Capturing early is
    * CONSERVATIVE — a commit between build and scan can only produce a
    * false conflict, never a missed one. */
  private val readVersion: Int =
    LakeStore.get(key).map(_.latestVersion).getOrElse(-1)

  /** INSERT OVERWRITE / DataFrame overwrite(lit(true)): whole-table swap. */
  override def truncate(): WriteBuilder = { mode = TruncateMode; this }

  /** Filter-scoped overwrite (`INSERT OVERWRITE ... PARTITION (p = v)`,
    * DataFrame `overwrite(cond)`): sound at GROUP granularity only when
    * the filter is decided ENTIRELY by the partition key — equality/IN
    * conjuncts on current-spec partition columns over a table whose live
    * files all carry current-spec group keys. Anything looser is refused
    * loudly (Delta's partition-scoped replaceWhere contract): silently
    * widening to touched groups would DELETE rows the filter never
    * matched. */
  override def overwrite(predicates: Array[V2Predicate]): WriteBuilder = {
    if (predicates.isEmpty ||
        predicates.forall(_.name() == "ALWAYS_TRUE")) return truncate()
    val st = LakeStore.get(key).getOrElse(
      throw new NoSuchTableException(key.split('.').toSeq))
    val pc = st.partitionCols
    require(pc.nonEmpty,
      s"graft_lake: INSERT OVERWRITE with a filter requires $key to be partitioned")
    require(pc.forall(LakeStore.isIdentitySpec),
      s"graft_lake: $key uses hidden partitioning — a filter cannot decide " +
        "derived groups; use dynamic overwrite (overwritePartitions) instead")
    val compares = predicates.flatMap(ZonePrune.conjuncts).map { p =>
      ZonePrune.parse(p).filter(cc =>
        pc.contains(cc.col) && (cc.op == "=" || cc.op == "IN")).getOrElse(
        throw new IllegalArgumentException(
          s"graft_lake: overwrite filter $p is not an equality/IN on a " +
            s"partition column of $key (partition-scoped overwrite only)"))
    }
    require(st.current.forall(_.era == st.specEra),
      s"graft_lake: $key still holds pre-evolution file groups — a filter " +
        "cannot decide them; rewrite them first (any row-level statement " +
        "migrates them to the current spec)")
    val matched = st.liveGroups.filter(g => compares.forall { cc =>
      cc.lits.contains(g(pc.indexOf(cc.col)))
    })
    mode = OverwriteGroups(matched,
      compares.map(cc => pc.indexOf(cc.col) -> cc.lits.toSet).toSeq)
    this
  }

  override def overwriteDynamicPartitions(): WriteBuilder = {
    mode = DynamicMode; this
  }

  /** The compiled task-side write config (constraints, derived columns,
    * blooms) — shared by the batch and streaming writer factories. */
  private def writerFactory(): LakeWriterFactory = {
    val st = LakeStore.get(key)
    val partitionCols = st.map(_.partitionCols).getOrElse(Nil)
    // compiled once on the driver; tasks get bound Catalyst exprs.
    // Derived-column specs live in the TABLE schema's field metadata
    // (the write schema arrives metadata-stripped).
    val constraints = LakeConstraints.compile(key, writeSchema)
    val derived = LakeDerivedColumns.compile(key,
      st.map(_.schema).getOrElse(writeSchema))
    val props = st.map(_.props).getOrElse(Map.empty)
    val phys = st.map(s => LakeStore.physicalMap(s.schema)).getOrElse(Map.empty)
    // rows CARRY their identity values through row-level rewrites AND
    // layout-only rewrites (OPTIMIZE re-lands existing rows — refusing
    // their explicit identity values would make clustering impossible
    // on any identity/row-tracked table); generated columns recompute
    // on both paths, which is a no-op for OPTIMIZE (deps unchanged)
    val carryRows = mode.isInstanceOf[RowLevelMode] || layoutOnly
    new LakeWriterFactory(LakeStore.dataDir(key), writeSchema, partitionCols,
      constraints, derived, LakeBloom.columnsOf(props), LakeBloom.bitsOf(props),
      phys, recomputeGenerated = carryRows, ndvCols = LakeNdv.columnsOf(props))
  }

  private def sweepFiles(messages: Iterator[WriterCommitMessage]): Unit = {
    val fs = new Path(LakeStore.dataDir(key)).getFileSystem(LakeStore.sharedHconf)
    messages.filter(_ != null).map(_.asInstanceOf[LakeCommit])
      .flatMap(_.files.iterator)
      .foreach(f => fs.delete(new Path(LakeStore.dataDir(key), f.path), false))
  }

  /** WRITE DISTRIBUTION & ORDERING (Iceberg's `write.distribution-mode`):
    * when the table property `graft.write.distribution-mode` is `hash`,
    * the write REQUIRES a clustering by the partition transforms —
    * Spark shuffles the incoming rows so each partition group lands in
    * exactly ONE task, and each append produces ONE file per group
    * instead of (tasks × groups). At 100 TB this is the difference
    * between a manifest that grows with the data and a small-file
    * explosion that grows with data × cluster width. `range` asks for a
    * global sort on the same expressions (clustered AND ordered output
    * files); `none` (the default) writes on the query's own layout.
    * Transform specs cluster on the TRANSFORM (`bucket(8, id)`),
    * resolved through [[LakeFunctions]] — the write-side twin of the
    * storage-partitioned-join read path. Both non-none modes also
    * request a WITHIN-partition sort on the partition expressions, so a
    * task holding several groups writes them sequentially (one open
    * file at a time). */
  private def distributionMode: String = {
    val m = LakeStore.get(key).map(_.props).getOrElse(Map.empty)
      .getOrElse("graft.write.distribution-mode", "none")
    require(m == "none" || m == "hash" || m == "range",
      s"graft_lake: unknown graft.write.distribution-mode '$m' on $key " +
        "(none | hash | range)")
    m
  }

  override def build(): Write = new Write
      with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
    import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
    import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}
    private val partExprs: Array[org.apache.spark.sql.connector.expressions.Expression] =
      GraftLakeTable.specTransforms(
        LakeStore.get(key).map(_.partitionCols).getOrElse(Nil))
        .map(t => t: org.apache.spark.sql.connector.expressions.Expression)
    private val active = partExprs.nonEmpty && distributionMode != "none"
    private def sortOrders: Array[SortOrder] =
      partExprs.map(e => Expressions.sort(e,
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
    override def requiredDistribution(): Distribution =
      if (!active) Distributions.unspecified()
      else if (distributionMode == "range") Distributions.ordered(sortOrders)
      else Distributions.clustered(partExprs)
    override def requiredOrdering(): Array[SortOrder] =
      if (!active) Array.empty else sortOrders

    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        writerFactory()
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val files = messages.iterator
          .map(_.asInstanceOf[LakeCommit])
          .flatMap(_.files.iterator)
          .toSeq
        mode match {
          case AppendMode if upsertCols.nonEmpty =>
            // a keyed upsert can delete rows ANYWHERE — its conflict
            // claim is the whole table (the Iceberg global-delete shape)
            LakeStore.appendUpsert(key, files, upsertCols,
              Some(LakeStore.Txn(readVersion, LakeStore.WholeTable)))
          case AppendMode => LakeStore.append(key, files,
            Some(LakeStore.Txn(readVersion, LakeStore.BlindAppend)),
            ingestIds = copyIds)
          case TruncateMode => LakeStore.replace(key, files, None,
            Some(LakeStore.Txn(readVersion, LakeStore.WholeTable)),
            layoutOnly = layoutOnly)
          case OverwriteGroups(gs, guards) =>
            // replaceWhere data validation (the Delta contract): every
            // produced file's group must satisfy the overwrite filter —
            // an out-of-filter row would land beside the untouched files
            // of a partition the statement promised not to touch.
            // Throwing here aborts the job (Spark's v2 write exec calls
            // abort(), which sweeps the staged files); nothing commits.
            val offending = files.find(f =>
              guards.exists { case (i, allowed) => !allowed.contains(f.group(i)) })
            offending.foreach { f =>
              throw new IllegalStateException(
                s"graft_lake: replaceWhere data validation failed for $key — " +
                  s"written rows land in partition group ${f.group.mkString("[", ", ", "]")} " +
                  "outside the overwrite filter; nothing was committed " +
                  "(matching Delta's replaceWhere contract: written data must " +
                  "satisfy the overwrite condition)")
            }
            // the conflict claim is the FILTER's key space (the guards),
            // not the matched-group snapshot: a concurrent append of
            // filter-matching rows into a brand-new group conflicts too
            LakeStore.replace(key, files, Some(gs),
              Some(LakeStore.Txn(readVersion, LakeStore.GroupScope(g =>
                guards.forall { case (i, allowed) =>
                  i < g.length && allowed.contains(g(i)) }))),
              layoutOnly = layoutOnly)
          case DynamicMode =>
            val written = files.map(_.group).toSet
            LakeStore.replace(key, files, Some(written),
              Some(LakeStore.Txn(readVersion, LakeStore.GroupScope(written))),
              layoutOnly = layoutOnly)
          case RowLevelMode(gs) =>
            val scanned = gs()
            // claims = the groups the statement SCANNED plus the groups
            // it writes (a MERGE can insert into a partition outside the
            // runtime-filtered scan set); None = unpartitioned/whole-table
            val txn = scanned match {
              case None => LakeStore.Txn(readVersion, LakeStore.WholeTable)
              case Some(sg) => LakeStore.Txn(readVersion,
                LakeStore.GroupScope(sg ++ files.map(_.group)))
            }
            LakeStore.replace(key, files, scanned, Some(txn))
        }
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        // drop any files whose tasks committed before the job aborted;
        // unreferenced files are invisible, this is just hygiene
        sweepFiles(messages.iterator)
    }

    /** `writeStream.toTable` — the lake as a native STREAMING SINK
      * (Delta's shape): each micro-batch appends through the SAME
      * task-side writer (constraints, derived columns, blooms all
      * enforced), and the commit is EXACTLY-ONCE by epoch — the commit
      * records `(queryId, epochId)` in the table properties, and a
      * replayed epoch (engine retry after a crash between sink commit
      * and checkpoint advance) is recognized and dropped instead of
      * double-appended — the Delta txn-version idempotence move. */
    override def toStreaming:
        org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
        require(mode == AppendMode,
          s"graft_lake: streaming writes to $key support append mode only")
        require(upsertCols.isEmpty,
          s"graft_lake: streaming upsert into $key is not supported — " +
            "run the upsert per micro-batch via foreachBatch")
        override def createStreamingWriterFactory(info: PhysicalWriteInfo):
            org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
          val inner = writerFactory()
          (partitionId: Int, taskId: Long, _epochId: Long) =>
            inner.createWriter(partitionId, taskId)
        }
        override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
          val files = messages.iterator.filter(_ != null)
            .map(_.asInstanceOf[LakeCommit]).flatMap(_.files.iterator).toSeq
          val committed = LakeStore.appendEpoch(key, files, queryId, epochId)
          if (!committed) sweepFiles(messages.iterator) // duplicate replay
        }
        override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
          sweepFiles(messages.iterator)
      }
  }
}

case class LakeCommit(files: Seq[LakeStore.FileEntry]) extends WriterCommitMessage

/** Merge-on-read write path (Catalyst's WriteDelta): tasks route INSERT
  * rows through the ordinary parquet writer (constraints included) and
  * fold DELETE/UPDATE rowIds into per-data-file position lists; commit
  * turns those into position-delete sidecars + one [[LakeStore.applyDelta]]
  * manifest commit. No existing data file is read or rewritten. */
class LakeDeltaWriteBuilder(key: String, rowSchema: StructType)
    extends org.apache.spark.sql.connector.write.DeltaWriteBuilder {
  override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
    new org.apache.spark.sql.connector.write.DeltaWrite {
      override def toBatch: org.apache.spark.sql.connector.write.DeltaBatchWrite =
        new LakeDeltaBatchWrite(key, rowSchema)
    }
}

class LakeDeltaBatchWrite(key: String, rowSchema: StructType)
    extends org.apache.spark.sql.connector.write.DeltaBatchWrite {
  import org.apache.spark.sql.connector.write.{DeltaWriterFactory => V2DeltaWriterFactory}

  /** Optimistic read version (see [[LakeWriteBuilder.readVersion]]):
    * merge-on-read statements conflict-check too — their deletion
    * vectors were derived from rows a concurrent writer may have
    * replaced. */
  private val readVersion: Int =
    LakeStore.get(key).map(_.latestVersion).getOrElse(-1)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): V2DeltaWriterFactory = {
    val st = LakeStore.get(key)
    val partitionCols = st.map(_.partitionCols).getOrElse(Nil)
    // a pure DELETE plan carries NO row schema (only rowIds flow) — no
    // rows will be written, so no constraints/derived specs to compile
    val constraints =
      if (rowSchema.isEmpty) Nil else LakeConstraints.compile(key, rowSchema)
    val derived =
      if (rowSchema.isEmpty) LakeDerivedColumns.empty
      else LakeDerivedColumns.compile(key, st.map(_.schema).getOrElse(rowSchema))
    val props = st.map(_.props).getOrElse(Map.empty)
    val phys = st.map(s => LakeStore.physicalMap(s.schema)).getOrElse(Map.empty)
    new LakeDeltaWriterFactory(LakeStore.dataDir(key), rowSchema, partitionCols,
      constraints, derived, LakeBloom.columnsOf(props), LakeBloom.bitsOf(props),
      phys, ndvCols = LakeNdv.columnsOf(props))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val st = LakeStore.get(key).getOrElse(
      throw new NoSuchTableException(key.split('.').toSeq))
    val msgs = messages.iterator.filter(_ != null)
      .map(_.asInstanceOf[LakeDeltaCommit]).toSeq
    val newFiles = msgs.flatMap(_.files)
    // rowIds carry ABSOLUTE paths (what the scan emitted); the manifest
    // stores relative-or-absolute — map back to manifest identity
    val byAbs = st.current.map(f => LakeStore.resolvePath(key, f) -> f).toMap
    val newDeletes = msgs.flatMap(_.dvs).map { case (dvPath, dataAbs, n) =>
      val f = byAbs.getOrElse(dataAbs, throw new IllegalStateException(
        s"graft_lake: delta commit references unknown data file $dataAbs"))
      LakeStore.DeleteEntry(dvPath, f.path, n)
    }
    val touched = newFiles.map(_.group).toSet ++
      msgs.flatMap(_.dvs).map { case (_, dataAbs, _) => byAbs(dataAbs).group }
    LakeStore.applyDelta(key, newFiles, newDeletes, touched,
      Some(LakeStore.Txn(readVersion, LakeStore.GroupScope(touched))))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(LakeStore.dataDir(key)).getFileSystem(LakeStore.sharedHconf)
    messages.iterator.filter(_ != null).map(_.asInstanceOf[LakeDeltaCommit])
      .foreach { m =>
        m.files.foreach(f => fs.delete(new Path(LakeStore.dataDir(key), f.path), false))
        m.dvs.foreach { case (dv, _, _) =>
          fs.delete(new Path(LakeStore.dataDir(key), dv), false) }
      }
  }
}

case class LakeDeltaCommit(files: Seq[LakeStore.FileEntry],
    dvs: Seq[(String, String, Long)]) extends WriterCommitMessage

class LakeDeltaWriterFactory(dataDir: String, schema: StructType,
    partitionCols: Seq[String],
    constraints: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
    derived: LakeDerivedColumns.Spec = LakeDerivedColumns.empty,
    bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 16,
    physicalOf: Map[String, String] = Map.empty,
    ndvCols: Seq[String] = Nil)
    extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
  import org.apache.spark.sql.connector.write.DeltaWriter

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      // LAZY: a pure DELETE has an empty row schema and never inserts —
      // the parquet writer must not be built against it
      private var innerOpt: DataWriter[InternalRow] = _
      private def inner: DataWriter[InternalRow] = {
        if (innerOpt == null)
          // merge-on-read rows come from a row-level rewrite: generated
          // columns RECOMPUTE (see the batch writer's contract note)
          innerOpt = new LakeWriterFactory(dataDir, schema, partitionCols,
            constraints, derived, bloomCols, bloomBits, physicalOf,
            recomputeGenerated = true, ndvCols = ndvCols)
            .createWriter(partitionId, taskId)
        innerOpt
      }
      private val dels = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[Long]]

      override def insert(row: InternalRow): Unit = inner.write(row)

      override def delete(meta: InternalRow, id: InternalRow): Unit =
        dels.getOrElseUpdate(id.getUTF8String(0).toString,
          scala.collection.mutable.ArrayBuffer.empty[Long]) += id.getLong(1)

      override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
        delete(meta, id)
        insert(row)
      }

      override def commit(): WriterCommitMessage = {
        val innerMsg =
          if (innerOpt == null) LakeCommit(Nil)
          else innerOpt.commit().asInstanceOf[LakeCommit]
        val fs = new Path(dataDir).getFileSystem(LakeStore.sharedHconf)
        val dvs = dels.toSeq.map { case (dataAbs, positions) =>
          val rel = java.util.UUID.randomUUID().toString + ".dv"
          val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
            fs.create(new Path(dataDir, rel), false)))
          try {
            out.writeInt(positions.length)
            positions.sorted.foreach(out.writeLong)
          } finally out.close()
          (rel, dataAbs, positions.length.toLong)
        }
        LakeDeltaCommit(innerMsg.files, dvs)
      }

      override def abort(): Unit = // dv files exist only post-commit
        if (innerOpt != null) innerOpt.abort()
      override def close(): Unit = ()
    }
}

/** Task-side parquet writer: one file per partition GROUP the task
  * sees (a pre-shuffled write — e.g. repartition(partitionCol) — thus
  * lands one file per group total). Rows stream straight into Spark's
  * ParquetWriteSupport; per-column min/max zones accumulate as rows
  * pass and land in the commit message's manifest entry — statistics
  * are recorded at write time, never recomputed by a scan. */
class LakeWriterFactory(dataDir: String, schema: StructType,
    partitionCols: Seq[String],
    constraints: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)] = Nil,
    derived: LakeDerivedColumns.Spec = LakeDerivedColumns.empty,
    bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 16,
    physicalOf: Map[String, String] = Map.empty,
    recomputeGenerated: Boolean = false,
    ndvCols: Seq[String] = Nil)
    extends DataWriterFactory {

  /** Per-task identity block: task `p` owns value indexes
    * `[p * 2^33, (p+1) * 2^33)` — unique without coordination, loud
    * failure if a single task ever exhausts its block. */
  private val IdentityBlock = 1L << 33

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val dts = schema.fields.map(_.dataType)
    // hidden partitioning: each spec entry derives its group key from
    // its SOURCE column's stored value (identity = the value itself)
    val partSpecs = partitionCols.map(LakeStore.parsePart).toArray
    val partitionIdx = partSpecs.map(p => schema.fieldIndex(p.col))
    // files store PHYSICAL names (column-mapping): manifest cols, zone
    // and bloom keys, and the parquet schema all use them — a renamed
    // column keeps writing under its birth name
    val colNames = schema.fieldNames.map(n => physicalOf.getOrElse(n, n))
    val physSchema = StructType(schema.fields.map(f =>
      f.copy(name = physicalOf.getOrElse(f.name, f.name),
        metadata = org.apache.spark.sql.types.Metadata.empty)))
    // generated-column projection: compiled once per task (codegen with
    // interpreted fallback), evaluated on the aligned row
    val genProj =
      if (derived.gens.isEmpty) null
      else org.apache.spark.sql.catalyst.expressions.SafeProjection.create(
        derived.gens.map(_.expr))
    val gens = derived.gens.toArray
    val idents = derived.idents.toArray
    var identCounter = 0L
    // zones are recorded only for types the manifest serde round-trips;
    // a DECIMAL/BINARY/complex column simply gets no zone (never pruned
    // on — superset-safe) instead of failing the commit
    val zoneable = dts.map(LakeStore.zoneSerializable)
    // compile each bound violation expression once per task (codegen
    // with interpreted fallback); evaluated on the ALIGNED row below
    val checkPreds = constraints.map { case (name, expr) =>
      val p = org.apache.spark.sql.catalyst.expressions.Predicate.create(expr)
      p.initialize(partitionId)
      (name, p)
    }.toArray

    // ordinals of the bloom-indexed columns present in this write schema
    val bloomIdx: Array[Int] = bloomCols.flatMap(c =>
      if (schema.fieldNames.contains(c)) Some(schema.fieldIndex(c)) else None).toArray

    // ordinals of the NDV-sketched columns present in this write schema
    val ndvIdx: Array[Int] = ndvCols.flatMap(c =>
      if (schema.fieldNames.contains(c)) Some(schema.fieldIndex(c)) else None).toArray

    final class OpenFile(val relPath: String) {
      val writer: ParquetWriter[InternalRow] = {
        val conf = new Configuration(LakeStore.sharedHconf)
        ParquetWriteSupport.setSchema(physSchema, conf)
        conf.set("spark.sql.parquet.writeLegacyFormat", "false")
        conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
        conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
        conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
        conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "true")
        new LakeWriterFactory.RowWriterBuilder(new Path(dataDir, relPath), conf)
          .withConf(conf)
          .withCompressionCodec(CompressionCodecName.SNAPPY)
          .build()
      }
      var rows: Long = 0L
      val mins: Array[Any] = Array.fill[Any](dts.length)(null)
      val maxs: Array[Any] = Array.fill[Any](dts.length)(null)
      // per-column null counts (every column, not just zoneable ones):
      // COUNT(col) is type-independent, and rows==nulls is what later
      // proves an all-null column safe to skip for MIN/MAX pushdown
      val nullCnt: Array[Long] = Array.fill(dts.length)(0L)
      // one bloom bit-array per indexed column, folded as rows stream
      val bloomBitsArr: Array[Array[Long]] =
        Array.fill(bloomIdx.length)(LakeBloom.newBits(bloomBits))
      // one KMV distinct sketch per ndv column, folded as rows stream
      val ndvSketches: Array[LakeNdv.Sketch] =
        Array.fill(ndvIdx.length)(new LakeNdv.Sketch)

      def zones: Map[String, (Any, Any)] =
        colNames.indices.collect {
          case i if mins(i) != null => colNames(i) -> ((mins(i), maxs(i)))
        }.toMap

      def nulls: Map[String, Long] =
        colNames.indices.map(i => colNames(i) -> nullCnt(i)).toMap

      def blooms: Map[String, String] =
        bloomIdx.indices.map(bi =>
          colNames(bloomIdx(bi)) -> LakeBloom.encode(bloomBitsArr(bi))).toMap

      def ndv: Map[String, String] =
        ndvIdx.indices.map(ni =>
          colNames(ndvIdx(ni)) -> ndvSketches(ni).encode).toMap
    }

    new DataWriter[InternalRow] {
      private val open = scala.collection.mutable.LinkedHashMap.empty[List[Any], OpenFile]

      override def write(row: InternalRow): Unit = {
        // MergeRows' physical output under group-based ReplaceData keeps
        // its row-operation discriminator as a LEADING extra column that
        // LogicalWriteInfo.schema() does not report (observed on Spark
        // 4.1: numFields = schema.length + 1, payload last); plain
        // appends arrive with numFields == schema.length. Align on the
        // trailing schema.length fields so both layouts store correctly.
        // Anything else is a plan-layout change this writer has not been
        // audited against: fail loudly rather than store mis-aligned rows.
        val off = row.numFields - dts.length
        require(off == 0 || off == 1,
          s"graft_lake: unexpected write row layout — numFields=${row.numFields} " +
            s"for schema of ${dts.length} fields (audited layouts: exact, or one " +
            "leading MergeRows row-operation discriminator)")
        val full = new GenericInternalRow(dts.length)
        var j = 0
        while (j < dts.length) {
          full.update(j, if (row.isNullAt(off + j)) null else row.get(off + j, dts(j)))
          j += 1
        }
        // IDENTITY columns first (a generation expression may reference
        // one): NULL = writer-assigned from this task's block; explicit
        // values require BY DEFAULT mode
        var ii = 0
        while (ii < idents.length) {
          val id = idents(ii)
          if (full.isNullAt(id.ordinal)) {
            require(identCounter < IdentityBlock,
              s"graft_lake: task $partitionId exhausted its identity block")
            val v = id.base + (partitionId.toLong * IdentityBlock + identCounter) * id.step
            full.update(id.ordinal, v)
          } else if (recomputeGenerated) {
            // row-level rewrite: the row CARRIES its identity — assigned
            // once at insert, preserved through every UPDATE/MERGE
          } else if (!id.allowExplicit) throw new IllegalStateException(
            s"graft_lake: column '${id.name}' is GENERATED ALWAYS AS IDENTITY — " +
              "explicit inserts are not allowed; the write was aborted")
          ii += 1
        }
        if (idents.nonEmpty) identCounter += 1
        // GENERATED columns: computed when omitted, VALIDATED when
        // provided (a mismatching explicit value aborts the write —
        // Delta's generated-column contract). ROW-LEVEL rewrites instead
        // RECOMPUTE unconditionally (Delta's recompute-on-update): an
        // UPDATE/MERGE that changes a dependency carries the stale
        // value through Catalyst's rewrite, and recomputing is the only
        // reading of the rewrite row that keeps the table invariant
        // `gen = expr(deps)` — which therefore holds on EVERY path.
        if (genProj != null) {
          val computed = genProj(full)
          var gi = 0
          while (gi < gens.length) {
            val g = gens(gi)
            val cv = if (computed.isNullAt(gi)) null else computed.get(gi, dts(g.ordinal))
            if (recomputeGenerated || full.isNullAt(g.ordinal)) full.update(g.ordinal, cv)
            else {
              val given = full.get(g.ordinal, dts(g.ordinal))
              if (!java.util.Objects.equals(given, cv)) throw new IllegalStateException(
                s"graft_lake: column '${g.name}' is GENERATED ALWAYS AS — provided " +
                  s"value $given does not match the generated value $cv; " +
                  "the write was aborted")
            }
            gi += 1
          }
        }
        // CHECK constraints: violation = expression definitely FALSE
        // (SQL's UNKNOWN-passes rule). Throwing fails the task -> the
        // job aborts -> no commit; abort() sweeps the partial files.
        var ci = 0
        while (ci < checkPreds.length) {
          if (checkPreds(ci)._2.eval(full)) throw new IllegalStateException(
            s"graft_lake: CHECK constraint '${checkPreds(ci)._1}' violated by a " +
              s"write row; the write was aborted and nothing was committed")
          ci += 1
        }
        val group = partSpecs.indices.map { j =>
          val i = partitionIdx(j)
          LakeStore.partKey(partSpecs(j),
            LakeStore.toStored(if (full.isNullAt(i)) null else full.get(i, dts(i))))
        }.toList
        val file = open.getOrElseUpdate(group,
          new OpenFile(s"${java.util.UUID.randomUUID().toString}.parquet"))
        file.writer.write(full)
        file.rows += 1
        var i = 0
        while (i < dts.length) {
          if (full.isNullAt(i)) file.nullCnt(i) += 1
          else if (zoneable(i)) {
            val v = LakeStore.toStored(full.get(i, dts(i)))
            if (file.mins(i) == null) { file.mins(i) = v; file.maxs(i) = v }
            else {
              if (ZonePrune.cmp(v, file.mins(i)).exists(_ < 0)) file.mins(i) = v
              if (ZonePrune.cmp(v, file.maxs(i)).exists(_ > 0)) file.maxs(i) = v
            }
          }
          i += 1
        }
        var bi = 0
        while (bi < bloomIdx.length) {
          val ci = bloomIdx(bi)
          if (!full.isNullAt(ci))
            LakeBloom.add(file.bloomBitsArr(bi), LakeStore.toStored(full.get(ci, dts(ci))))
          bi += 1
        }
        var ni = 0
        while (ni < ndvIdx.length) {
          val ci = ndvIdx(ni)
          if (!full.isNullAt(ci))
            file.ndvSketches(ni).add(LakeStore.toStored(full.get(ci, dts(ci))))
          ni += 1
        }
      }

      override def commit(): WriterCommitMessage = {
        open.values.foreach(_.writer.close())
        // on-disk size lands in the manifest (Iceberg/Delta both carry
        // it): one task-side stat per closed file, consumed by the
        // .files/.detail metadata tables and maintenance planning —
        // never a read-path scan of the data directory
        val fs = new Path(dataDir).getFileSystem(LakeStore.sharedHconf)
        LakeCommit(open.map { case (group, f) =>
          val len = try fs.getFileStatus(new Path(dataDir, f.relPath)).getLen
            catch { case _: Exception => 0L }
          LakeStore.FileEntry(f.relPath, group, f.rows, colNames.toSeq, f.zones,
            f.blooms, bytes = len, nulls = f.nulls, ndv = f.ndv)
        }.toSeq)
      }

      override def abort(): Unit = {
        val fs = new Path(dataDir).getFileSystem(LakeStore.sharedHconf)
        open.values.foreach { f =>
          try f.writer.close() catch { case _: Exception => () }
          fs.delete(new Path(dataDir, f.relPath), false)
        }
      }

      override def close(): Unit = ()
    }
  }
}

object LakeWriterFactory {
  /** Spark's ParquetWriteSupport initialized with OUR configuration —
    * parquet-mr's builder may hand init() a rebuilt Configuration that
    * lost the Spark SQL keys (the ParquetConfiguration adapter), so the
    * write conf is pinned here instead of trusting the plumbing. */
  private class PinnedConfWriteSupport(conf: Configuration)
      extends WriteSupport[InternalRow] {
    private val inner = new ParquetWriteSupport
    override def init(ignored: Configuration): WriteSupport.WriteContext =
      inner.init(conf)
    override def prepareForWrite(rc: org.apache.parquet.io.api.RecordConsumer): Unit =
      inner.prepareForWrite(rc)
    override def write(r: InternalRow): Unit = inner.write(r)
  }

  /** Minimal parquet-mr builder handing back Spark's own WriteSupport. */
  private class RowWriterBuilder(path: Path, sparkConf: Configuration)
      extends ParquetWriter.Builder[InternalRow, RowWriterBuilder](path) {
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new PinnedConfWriteSupport(sparkConf)
    override def self(): RowWriterBuilder = this
  }
}
