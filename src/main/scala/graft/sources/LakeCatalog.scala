package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{Column, Identifier, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A minimal DataSource-V2 lakehouse CATALOG whose tables support the
  * SQL maintenance statements the reference surface lacks entirely and
  * every incremental corpus pipeline needs: `MERGE INTO` (p29), `UPDATE`
  * (p31), `DELETE FROM` (p32) — all planned by Catalyst's row-level
  * rewrites — plus snapshot TIME TRAVEL (`VERSION AS OF`, p33): every
  * committed write pushes an immutable snapshot, Delta/Iceberg-style.
  *
  * Why a custom catalog at all: Spark 4 plans MERGE only against a V2
  * table whose [[SupportsRowLevelOperations]] contract it can rewrite
  * into joins + a replacement write (Catalyst's RewriteMergeIntoTable);
  * the built-in session catalog's parquet tables are V1 and reject the
  * statement outright. This catalog implements exactly that contract as
  * GROUP-BASED copy-on-write: the row-level operation's scan reads the
  * affected groups of the current snapshot, Catalyst's rewritten plan
  * computes carry-over + merged rows DISTRIBUTED (the join, clause
  * routing, and row construction all run as ordinary Spark operators
  * over the scan), and the replacement write swaps those groups'
  * content atomically at commit.
  *
  * Group granularity IS the 100 TB scale lever, and both granularities
  * are implemented: an unpartitioned table is one group (every
  * statement rewrites the whole table — the simple correct baseline),
  * while a table created `PARTITIONED BY (identity cols)` gets
  * PARTITION-grouped copy-on-write with runtime group filtering — the
  * row-level scan implements [[SupportsRuntimeV2Filtering]] on the
  * partition columns, Catalyst's RowLevelOperationRuntimeGroupFiltering
  * derives the touched partitions from the changeset at execution time
  * (a dynamic-pruning subquery), the scan emits only those groups, and
  * the commit rewrites ONLY the scanned groups (Iceberg's
  * copy-on-write shape). Untouched partitions are neither read nor
  * rewritten — the property that keeps a 10-partition-touching MERGE
  * O(touched), not O(table). Storage is a driver-side snapshot map
  * (the catalog's "metastore + data files" in one), which bounds table
  * size by driver memory — the production analogue swaps that single
  * class for parquet file groups exactly the way Delta/Iceberg do,
  * while every DISTRIBUTED piece (the rewrite, the join, the pruning,
  * the writers) stays as planned here.
  *
  * The MERGE semantics themselves (clause order, the four action kinds,
  * unmatched-row carry-over) are Catalyst's own — this file adds no
  * merge logic, which is the point: p29's oracle checks SPARK's merge
  * rewrite against DuckDB's relational restatement, not a hand-rolled
  * reimplementation.
  *
  * Supported value types: the atomic types the stored form round-trips
  * (integral/floating/boolean/string/timestamp/date) — strings cross the
  * task boundary as JVM Strings, everything else is already the Catalyst
  * primitive.
  */
object LakeStore {
  /** Snapshot history, Delta/Iceberg-style: every committed write (append
    * or row-level replace) pushes a new immutable snapshot; version v =
    * snapshots(v), version 0 = the empty table at creation. Time travel
    * (`VERSION AS OF v`) is just a scan pinned to an earlier index.
    * `commitGroups(v)` is the commit-level CHANGE METADATA (Delta's
    * commit log / Iceberg's snapshot summary): the group set the commit
    * that produced snapshot v touched — appends record the appended
    * rows' groups, row-level replaces record the replaced groups, None
    * means "the whole table" (an unpartitioned rewrite). This is what
    * makes an incremental CHANGES read (p36) O(touched groups) instead
    * of O(two full snapshots). */
  final case class TableState(schema: StructType, partitionCols: Seq[String],
      snapshots: Vector[Array[Array[Any]]],
      commitGroups: Vector[Option[Set[List[Any]]]]) {
    def current: Array[Array[Any]] = snapshots.last
    def latestVersion: Int = snapshots.length - 1
    val partitionIdx: Seq[Int] = partitionCols.map(schema.fieldIndex)
    /** Group key of a stored row: its partition-column value tuple. */
    def groupOf(row: Array[Any]): List[Any] = partitionIdx.map(row(_)).toList
  }

  private val tables = TrieMap.empty[String, TableState]

  /** Test/audit hook: the group set the last row-level commit REPLACED
    * per table (None = whole table) — how a spec proves untouched
    * partitions were not rewritten. */
  val lastReplacedGroups = TrieMap.empty[String, Option[Set[List[Any]]]]

  /** Test/audit hook: what the last BATCH SCAN of each table actually
    * emitted after group skipping + column pruning — how a spec (and
    * p35's published row) proves data skipping really happened at the
    * scan, not in a downstream Filter. */
  final case class ScanStats(groupsTotal: Int, groupsScanned: Int,
      rowsEmitted: Long, colsRead: Seq[String])
  val lastScanStats = TrieMap.empty[String, ScanStats]

  def key(catalog: String, ident: Identifier): String =
    (Seq(catalog) ++ ident.namespace().toSeq :+ ident.name()).mkString(".")

  def get(k: String): Option[TableState] = tables.get(k)
  def create(k: String, schema: StructType, partitionCols: Seq[String]): Boolean =
    tables.putIfAbsent(k, TableState(schema, partitionCols, Vector(Array.empty),
      Vector(Some(Set.empty)))).isEmpty
  def drop(k: String): Boolean = tables.remove(k).isDefined
  def list(catalog: String): Seq[String] =
    tables.keys.filter(_.startsWith(catalog + ".")).toSeq.sorted

  def append(k: String, newRows: Array[Array[Any]]): Unit = tables.synchronized {
    val st = tables(k)
    tables.update(k, st.copy(
      snapshots = st.snapshots :+ (st.current ++ newRows),
      commitGroups = st.commitGroups :+ Some(newRows.map(st.groupOf).toSet)))
  }

  /** Row-level replacement commit. `groups = None` replaces the whole
    * table (the unpartitioned one-group case); `Some(gs)` swaps exactly
    * the scanned groups: their old rows leave, the plan's full output
    * (carry-over + merged, all belonging to those groups) lands.
    *
    * Commit metadata records the union of the SCANNED groups and the
    * written rows' own groups: a MERGE can INSERT into a partition that
    * was outside the runtime-filtered scan set (a partition new to the
    * table), and an incremental CHANGES read must see that insert.
    * `lastReplacedGroups` stays scanned-only — it is the pruning audit
    * ("which groups did copy-on-write rewrite"), a different question. */
  def replace(k: String, newRows: Array[Array[Any]],
      groups: Option[Set[List[Any]]]): Unit = tables.synchronized {
    val st = tables(k)
    val next = groups match {
      case None => newRows
      case Some(gs) => st.current.filterNot(r => gs.contains(st.groupOf(r))) ++ newRows
    }
    lastReplacedGroups.update(k, groups)
    tables.update(k, st.copy(snapshots = st.snapshots :+ next,
      commitGroups = st.commitGroups :+ groups.map(_ ++ newRows.map(st.groupOf))))
  }

  /** The union of groups touched by commits in (v1, v2] — the
    * incremental-scan planning step, answered from COMMIT METADATA
    * alone (no data read). None = some commit rewrote the whole table,
    * so an incremental reader must fall back to a full diff. */
  def changedGroups(k: String, v1: Int, v2: Int): Option[Set[List[Any]]] = {
    val st = tables(k)
    require(v1 >= 0 && v2 <= st.latestVersion && v1 <= v2,
      s"graft_lake: bad version range [$v1, $v2] for $k (latest ${st.latestVersion})")
    ((v1 + 1) to v2).foldLeft(Option(Set.empty[List[Any]])) {
      case (None, _) => None
      case (Some(acc), v) => st.commitGroups(v).map(acc ++ _)
    }
  }

  /** Catalyst value -> serializable stored form (and back). */
  def toStored(v: Any): Any = v match {
    case s: UTF8String => s.toString
    case other => other
  }
  def toCatalyst(v: Any, dt: DataType): Any = dt match {
    case StringType if v != null => UTF8String.fromString(v.asInstanceOf[String])
    case _ => v
  }
}

/** Min/max ZONE-MAP group skipping — the Delta/Iceberg data-skipping
  * core: a comparison predicate over a column can rule a whole group
  * out when the group's value range cannot satisfy it. Skipping is a
  * pure OPTIMIZATION here, never a correctness lever: every pushed
  * predicate is also returned to Spark as residual, so an
  * unrecognized/unevaluable shape simply keeps the group (superset-
  * safe) and Spark's own Filter settles exact semantics. In this
  * driver-side store the per-group min/max are computed from the
  * snapshot rows at plan time — the stand-in for the file-footer /
  * manifest statistics a parquet-backed lake reads them from; what the
  * skipping SAVES is what gets emitted to executors (and, in the
  * file-backed analogue, what gets read at all). */
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

  private val ops = Set("=", "<", "<=", ">", ">=", "IN")

  def parse(p: V2Predicate): Option[ColCompare] = {
    if (!ops.contains(p.name())) return None
    val refs = p.children().collect {
      case r: NamedReference if r.fieldNames().length == 1 => r.fieldNames()(0)
    }
    val lits = p.children().collect { case l: Literal[_] => LakeStore.toStored(l.value()) }
    // exactly one bare column + at least one literal, nothing else
    if (refs.length == 1 && lits.nonEmpty && refs.length + lits.length == p.children().length)
      Some(ColCompare(refs.head, p.name(), lits.toSeq))
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
    * answer true (keep the group). */
  private def rangeMaySatisfy(min: Any, max: Any, op: String, lit: Any): Boolean = op match {
    case "=" => cmp(min, lit).forall(_ <= 0) && cmp(max, lit).forall(_ >= 0)
    case "<" => cmp(min, lit).forall(_ < 0)
    case "<=" => cmp(min, lit).forall(_ <= 0)
    case ">" => cmp(max, lit).forall(_ > 0)
    case ">=" => cmp(max, lit).forall(_ >= 0)
    case _ => true
  }

  /** Group survival under one parsed compare, given the group's non-null
    * (min, max) for the column; an all-null group cannot satisfy a
    * null-rejecting comparison, so it is skipped. */
  def survives(zone: Option[(Any, Any)], cc: ColCompare): Boolean = zone match {
    case None => false
    case Some((mn, mx)) => cc.op match {
      case "IN" => cc.lits.exists(rangeMaySatisfy(mn, mx, "=", _))
      case op => cc.lits.headOption.forall(rangeMaySatisfy(mn, mx, op, _))
    }
  }
}

/** Public incremental-read API over the lake's commit metadata — the
  * library surface a downstream pipeline calls to consume a table
  * INCREMENTALLY (Delta's CDF / Iceberg's incremental scan shape):
  * plan from commit metadata which partitions commits (v1, v2]
  * touched, then diff ONLY those partitions between the two pinned
  * snapshots. Untouched partitions are neither planned nor read —
  * the version-pinned scans carry a partition-column IN predicate
  * that [[ZonePrune]] group-skips at the source. */
object GraftLake {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions.{coalesce, col, lit, not, when}

  /** Partition tuples touched by commits in (v1, v2], answered from
    * COMMIT METADATA alone (no data read); None = some commit in the
    * range rewrote the whole table, so only a full diff is sound. */
  def changedPartitions(qualifiedKey: String, v1: Int, v2: Int): Option[Set[List[Any]]] =
    LakeStore.changedGroups(qualifiedKey, v1, v2)

  /** Partition tuples present in the CURRENT snapshot — the manifest's
    * partition listing (driver-side metadata read, like listing Delta's
    * partition directory index; not a distributed scan). */
  def livePartitions(qualifiedKey: String): Set[List[Any]] = {
    val st = LakeStore.get(qualifiedKey).getOrElse(
      throw new NoSuchTableException(qualifiedKey.split('.').toSeq))
    st.current.iterator.map(st.groupOf).toSet
  }

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
    * maps skip every untouched group, making the diff O(changed
    * partitions), not O(2 snapshots). A whole-table commit in the
    * range (or a multi-column partition key) falls back to the full
    * diff, which stays correct. The diff itself is one distributed
    * full-outer join on the key. */
  def changes(s: SparkSession, tableRef: String, v1: Int, v2: Int,
      keyCol: String): DataFrame = {
    val st = LakeStore.get(tableRef).getOrElse(
      throw new NoSuchTableException(tableRef.split('.').toSeq))
    val changed = changedPartitions(tableRef, v1, v2)
    def snap(v: Int): DataFrame = {
      val df = s.sql(s"SELECT * FROM $tableRef VERSION AS OF $v")
      (changed, st.partitionCols) match {
        case (Some(gs), Seq(pc)) => df.filter(col(pc).isInCollection(gs.map(_.head)))
        case _ => df
      }
    }
    val dataCols = st.schema.fieldNames.toSeq.filterNot(_ == keyCol)
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
          st.partitionCols.map(pc => coalesce(col(s"n.$pc"), col(s"o.$pc")).as(pc)) :+
          col("change")): _*)
  }
}

class GraftLakeCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

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
      case None => throw new NoSuchTableException(
        Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name())
    }

  /** `VERSION AS OF v` time travel: the same table pinned to snapshot v. */
  override def loadTable(ident: Identifier, version: String): Table =
    LakeStore.get(k(ident)) match {
      case Some(st) =>
        val v = try version.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"graft_lake: non-numeric version '$version' (versions are snapshot indexes)")
        }
        require(v >= 0 && v <= st.latestVersion,
          s"graft_lake: version $v out of range [0, ${st.latestVersion}] for ${k(ident)}")
        new GraftLakeTable(k(ident), st.schema, pinnedVersion = Some(v))
      case None => throw new NoSuchTableException(
        Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name())
    }

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    createTable(ident,
      StructType(columns.map(c =>
        org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable))),
      partitions, properties)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    // identity transforms only: each distinct partition-column tuple is
    // one copy-on-write group; no partitions = one whole-table group
    val partitionCols = partitions.toSeq.map { t =>
      require(t.name() == "identity" && t.arguments().length == 1,
        s"graft_lake: only identity partitioning is supported, got $t")
      t.arguments()(0) match {
        case ref: org.apache.spark.sql.connector.expressions.NamedReference =>
          require(ref.fieldNames().length == 1,
            s"graft_lake: nested partition columns unsupported: $ref")
          ref.fieldNames()(0)
        case other => throw new IllegalArgumentException(
          s"graft_lake: unsupported partition argument $other")
      }
    }
    if (!LakeStore.create(k(ident), schema, partitionCols))
      throw new TableAlreadyExistsException(
        Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name())
    new GraftLakeTable(k(ident), schema)
  }

  override def alterTable(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.TableChange*): Table =
    throw new UnsupportedOperationException("graft_lake: ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean = LakeStore.drop(k(ident))

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft_lake: RENAME TABLE not supported")
}

class GraftLakeTable(val key: String, val tableSchema: StructType,
    pinnedVersion: Option[Int] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations {

  override def name(): String =
    key + pinnedVersion.map(v => s"@v$v").getOrElse("")
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] =
    LakeStore.get(key).map(_.partitionCols).getOrElse(Nil)
      .map(c => org.apache.spark.sql.connector.expressions.Expressions.identity(c))
      .toArray
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeScanBuilder(key, tableSchema, pinnedVersion)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty, "graft_lake: cannot write to a time-travel view")
    new LakeWriteBuilder(key, info.schema(), replaceOnCommit = false)
  }

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(pinnedVersion.isEmpty, "graft_lake: cannot mutate a time-travel view")
    () => new LakeRowLevelOperation(key, tableSchema, info)
  }
}

/** Group-based row-level operation. Unpartitioned table: whole table =
  * the one group — the scan hands Catalyst the full current snapshot and
  * the commit swaps in the rewritten plan's full output (carry-over rows
  * included — Catalyst's rewrite produces them for copy-on-write).
  * Partitioned table: the scan is runtime-group-filterable on the
  * partition columns; whatever group set it actually EMITS (recorded at
  * plan time, after Catalyst's dynamic group-filter pruned it) is
  * exactly the set the commit replaces — scan and write communicate
  * through this operation instance, the same lifecycle Iceberg uses. */
class LakeRowLevelOperation(key: String, schema: StructType,
    info: RowLevelOperationInfo) extends RowLevelOperation {
  /** Groups the row-level scan emitted; None until planned. For an
    * unpartitioned table the scan records None's stand-in Some(whole) —
    * see LakeGroupScan — so the commit falls back to full replace. */
  @volatile private[sources] var scannedGroups: Option[Set[List[Any]]] = None

  override def command(): RowLevelOperation.Command = info.command()
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeGroupScanBuilder(key, schema, this)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LakeWriteBuilder(key, info.schema(), replaceOnCommit = true,
      replacedGroups = () => scannedGroups)
}

/** Row-level scan builder: STATIC partition pruning for DELETE/UPDATE/
  * MERGE — Catalyst's row-level scan planning pushes the statement's
  * condition here, and any partition-column compares narrow the group
  * set at build time (a `DELETE ... WHERE source = 'srcN'` rewrites one
  * group, not the table), composing with the RUNTIME group filtering
  * LakeGroupScan already does for changeset-derived predicates. All
  * predicates stay residual; pruning is superset-safe, and extra kept
  * groups merely ride through the rewrite as carry-over. No column
  * pruning here: copy-on-write must emit full rows. */
class LakeGroupScanBuilder(key: String, schema: StructType, op: LakeRowLevelOperation)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownV2Filters {
  import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}

  private var pushed: Array[V2Predicate] = Array.empty

  override def pushPredicates(predicates: Array[V2Predicate]): Array[V2Predicate] = {
    val partitionCols = LakeStore.get(key).map(_.partitionCols).getOrElse(Nil).toSet
    pushed = predicates.flatMap(ZonePrune.conjuncts).filter(p =>
      ZonePrune.parse(p).exists(cc => partitionCols.contains(cc.col)))
    predicates // ALL residual
  }
  override def pushedPredicates(): Array[V2Predicate] = pushed
  override def build(): Scan = new LakeGroupScan(key, schema, op, pushed)
}

/** The row-level operation's scan: the base snapshot scan plus runtime
  * group filtering on the partition columns. Catalyst's
  * RowLevelOperationRuntimeGroupFiltering executes the changeset side
  * first and pushes the touched partition values here as predicates
  * BEFORE planInputPartitions — so only affected groups are read, and
  * the groups actually emitted are recorded for the commit. */
class LakeGroupScan(key: String, schema: StructType,
    op: LakeRowLevelOperation,
    staticPushed: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = Array.empty)
    extends LakeScan(key, schema)
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
  import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}

  private def state = LakeStore.get(key)
  private def partitionCols: Seq[String] = state.map(_.partitionCols).getOrElse(Nil)

  /** Static prune from the statement's own condition (build time),
    * before any runtime filter arrives: a group survives if every
    * pushed partition-column compare can hold on its key (for a
    * partition column the zone is the exact key value). */
  private def staticKept: Option[Set[List[Any]]] = {
    val st = state.getOrElse(return None)
    if (st.partitionCols.isEmpty || staticPushed.isEmpty) return None
    val compares = staticPushed.flatMap(ZonePrune.parse)
    if (compares.isEmpty) return None
    val existing: Set[List[Any]] = st.current.map(st.groupOf).toSet
    Some(existing.filter(g => compares.forall { cc =>
      val i = st.partitionCols.indexOf(cc.col)
      i < 0 || ZonePrune.survives(Some((g(i), g(i))), cc)
    }))
  }

  @volatile private var kept: Option[Set[List[Any]]] = None

  override def filterAttributes(): Array[NamedReference] =
    partitionCols.map(Expressions.column).toArray

  override def filter(predicates: Array[V2Predicate]): Unit = {
    val st = state.getOrElse(return)
    if (st.partitionCols.isEmpty) return
    val existing: Set[List[Any]] = st.current.map(st.groupOf).toSet
    // Interpret the conjunction of IN/= predicates over single partition
    // columns; any predicate shape we don't recognize is IGNORED (keeping
    // a superset of groups is always sound — extra groups' rows ride
    // through the rewrite as carry-over and land back unchanged).
    val surviving = predicates.foldLeft(existing) { (acc, p) =>
      val colIdx: Option[Int] = p.children().collectFirst {
        case r: NamedReference if r.fieldNames().length == 1 =>
          st.partitionCols.indexOf(r.fieldNames()(0))
      }.filter(_ >= 0)
      val lits = p.children().collect {
        case l: Literal[_] => LakeStore.toStored(l.value())
      }.toSet
      (p.name(), colIdx) match {
        case ("IN", Some(i)) => acc.filter(g => lits.contains(g(i)))
        case ("=", Some(i)) if lits.size == 1 => acc.filter(g => lits.contains(g(i)))
        case _ => acc
      }
    }
    kept = Some(surviving)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val st = state
    val parts = st match {
      case Some(s) =>
        // static (statement-condition) and runtime (changeset-derived)
        // prunings compose by intersection; either may be absent
        val effective: Option[Set[List[Any]]] = (staticKept, kept) match {
          case (Some(a), Some(b)) => Some(a intersect b)
          case (a, b) => a.orElse(b)
        }
        val rows = effective match {
          case Some(gs) => s.current.filter(r => gs.contains(s.groupOf(r)))
          case None => s.current
        }
        // record what this scan EMITS: exactly the groups the commit
        // must replace (filtered set if pruning ran, else every group —
        // for an unpartitioned table groupOf is the empty tuple, i.e.
        // "the whole table" as one group)
        op.scannedGroups = Some(effective.getOrElse(rows.map(s.groupOf).toSet))
        rows
      case None => Array.empty[Array[Any]]
    }
    sliced(parts)
  }
}

/** Plain-read scan builder: min/max zone-map GROUP SKIPPING
  * ([[ZonePrune]]) plus column pruning. Every predicate Spark offers is
  * returned as residual — the scan only ever narrows WHICH GROUPS and
  * WHICH COLUMNS flow, never final row semantics. */
class LakeScanBuilder(key: String, schema: StructType, pinnedVersion: Option[Int])
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownV2Filters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}

  private var pushed: Array[V2Predicate] = Array.empty
  private var required: StructType = schema

  override def pushPredicates(predicates: Array[V2Predicate]): Array[V2Predicate] = {
    pushed = predicates.flatMap(ZonePrune.conjuncts).filter(p =>
      ZonePrune.parse(p).exists(cc => schema.fieldNames.contains(cc.col)))
    predicates // ALL residual: skipping must stay superset-safe
  }
  override def pushedPredicates(): Array[V2Predicate] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new LakeScan(key, schema, pinnedVersion, pushed, required)
}

/** Snapshot scan: rows are captured at plan time (driver), so a MERGE
  * that reads and replaces the same table sees the pre-merge state for
  * the whole query and the swap is atomic at commit. With pushed
  * predicates, groups whose zone maps cannot satisfy them are skipped
  * before anything is emitted; with a pruned schema, only the required
  * columns cross to executors. */
class LakeScan(key: String, schema: StructType,
    pinnedVersion: Option[Int] = None,
    pushed: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = Array.empty,
    required: StructType = null) extends Scan with Batch {
  private val readCols: StructType = Option(required).getOrElse(schema)
  override def readSchema(): StructType = readCols
  override def toBatch: Batch = this

  override def description(): String =
    s"GraftLake $key${pinnedVersion.map(v => s"@v$v").getOrElse("")} " +
      s"readCols=[${readCols.fieldNames.mkString(",")}] " +
      s"skipPredicates=[${pushed.map(_.toString).mkString(", ")}]"

  /** Split a row set so the downstream plan parallelizes even in this
    * single-JVM store (a file-backed variant would hand back one
    * partition per file group). */
  protected def sliced(rows: Array[Array[Any]]): Array[InputPartition] = {
    val slices = math.max(1, math.min(4, rows.length))
    rows.grouped(math.max(1, (rows.length + slices - 1) / slices))
      .map(chunk => LakePartition(chunk): InputPartition).toArray match {
      case empty if empty.isEmpty => Array(LakePartition(Array.empty))
      case parts => parts
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val st = LakeStore.get(key)
    val rows = st.map(s => pinnedVersion.fold(s.current)(s.snapshots(_)))
      .getOrElse(Array.empty[Array[Any]])
    val kept = st match {
      case Some(state) =>
        val compares = pushed.flatMap(ZonePrune.parse)
        if (compares.isEmpty) {
          LakeStore.lastScanStats.update(key, LakeStore.ScanStats(
            rows.map(state.groupOf).distinct.length,
            rows.map(state.groupOf).distinct.length,
            rows.length, readCols.fieldNames.toSeq))
          rows
        } else {
          val groups = rows.groupBy(state.groupOf)
          // per-group non-null (min, max) per referenced column — the
          // footer/manifest statistics stand-in, computed off the
          // driver-side snapshot
          val surviving = groups.filter { case (_, gRows) =>
            compares.forall { cc =>
              val idx = state.schema.fieldIndex(cc.col)
              var mn: Any = null; var mx: Any = null
              gRows.foreach { r =>
                val v = r(idx)
                if (v != null) {
                  if (mn == null || ZonePrune.cmp(v, mn).exists(_ < 0)) mn = v
                  if (mx == null || ZonePrune.cmp(v, mx).exists(_ > 0)) mx = v
                }
              }
              ZonePrune.survives(if (mn == null) None else Some((mn, mx)), cc)
            }
          }
          val out = surviving.values.flatten.toArray
          LakeStore.lastScanStats.update(key, LakeStore.ScanStats(
            groups.size, surviving.size, out.length, readCols.fieldNames.toSeq))
          out
        }
      case None => rows
    }
    val projIdx = readCols.fieldNames.map(schema.fieldIndex)
    sliced(kept.map(r => projIdx.map(r(_))))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeReaderFactory(readCols)
}

case class LakePartition(rows: Array[Array[Any]]) extends InputPartition

class LakeReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[LakePartition].rows
    val dts = schema.fields.map(_.dataType)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val vals = rows(i)
        new GenericInternalRow(
          Array.tabulate(vals.length)(j => LakeStore.toCatalyst(vals(j), dts(j))))
      }
      override def close(): Unit = ()
    }
  }
}

class LakeWriteBuilder(key: String, writeSchema: StructType,
    private var replaceOnCommit: Boolean,
    replacedGroups: () => Option[Set[List[Any]]] = () => None) extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  /** INSERT OVERWRITE / DataFrame overwrite(lit(true)): whole-table swap —
    * exactly replaceOnCommit with groups = None (replace every group). */
  override def truncate(): WriteBuilder = { replaceOnCommit = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        new LakeWriterFactory(writeSchema)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val rows = messages.iterator
          .map(_.asInstanceOf[LakeCommit])
          .flatMap(_.rows.iterator)
          .toArray
        if (replaceOnCommit) LakeStore.replace(key, rows, replacedGroups())
        else LakeStore.append(key, rows)
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

case class LakeCommit(rows: Array[Array[Any]]) extends WriterCommitMessage

class LakeWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val dts = schema.fields.map(_.dataType)
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      override def write(row: InternalRow): Unit = {
        // MergeRows' physical output under group-based ReplaceData keeps
        // its row-operation discriminator as a LEADING extra column that
        // LogicalWriteInfo.schema() does not report (observed on Spark
        // 4.1: numFields = schema.length + 1, payload last); plain
        // appends arrive with numFields == schema.length. Align on the
        // trailing schema.length fields so both layouts store correctly.
        // Anything else (extra trailing columns, a two-column prefix) is
        // a plan-layout change this writer has not been audited against:
        // fail loudly rather than store silently mis-aligned rows.
        val off = row.numFields - dts.length
        require(off == 0 || off == 1,
          s"graft_lake: unexpected write row layout — numFields=${row.numFields} " +
            s"for schema of ${dts.length} fields (audited layouts: exact, or one " +
            "leading MergeRows row-operation discriminator)")
        buf += Array.tabulate(dts.length)(j =>
          LakeStore.toStored(if (row.isNullAt(off + j)) null else row.get(off + j, dts(j))))
      }
      override def commit(): WriterCommitMessage = LakeCommit(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
  }
}
