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
    * (`VERSION AS OF v`) is just a scan pinned to an earlier index. */
  final case class TableState(schema: StructType, partitionCols: Seq[String],
      snapshots: Vector[Array[Array[Any]]]) {
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

  def key(catalog: String, ident: Identifier): String =
    (Seq(catalog) ++ ident.namespace().toSeq :+ ident.name()).mkString(".")

  def get(k: String): Option[TableState] = tables.get(k)
  def create(k: String, schema: StructType, partitionCols: Seq[String]): Boolean =
    tables.putIfAbsent(k, TableState(schema, partitionCols, Vector(Array.empty))).isEmpty
  def drop(k: String): Boolean = tables.remove(k).isDefined
  def list(catalog: String): Seq[String] =
    tables.keys.filter(_.startsWith(catalog + ".")).toSeq.sorted

  def append(k: String, newRows: Array[Array[Any]]): Unit = tables.synchronized {
    val st = tables(k)
    tables.update(k, st.copy(snapshots = st.snapshots :+ (st.current ++ newRows)))
  }

  /** Row-level replacement commit. `groups = None` replaces the whole
    * table (the unpartitioned one-group case); `Some(gs)` swaps exactly
    * the scanned groups: their old rows leave, the plan's full output
    * (carry-over + merged, all belonging to those groups) lands. */
  def replace(k: String, newRows: Array[Array[Any]],
      groups: Option[Set[List[Any]]]): Unit = tables.synchronized {
    val st = tables(k)
    val next = groups match {
      case None => newRows
      case Some(gs) => st.current.filterNot(r => gs.contains(st.groupOf(r))) ++ newRows
    }
    lastReplacedGroups.update(k, groups)
    tables.update(k, st.copy(snapshots = st.snapshots :+ next))
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

class GraftLakeCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def k(ident: Identifier): String = LakeStore.key(catalogName, ident)

  override def listTables(namespace: Array[String]): Array[Identifier] =
    LakeStore.list(catalogName)
      .map(full => Identifier.of(Array.empty, full.stripPrefix(catalogName + ".")))
      .toArray

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
    () => new LakeScan(key, tableSchema, pinnedVersion)

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
    () => new LakeGroupScan(key, schema, this)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LakeWriteBuilder(key, info.schema(), replaceOnCommit = true,
      replacedGroups = () => scannedGroups)
}

/** The row-level operation's scan: the base snapshot scan plus runtime
  * group filtering on the partition columns. Catalyst's
  * RowLevelOperationRuntimeGroupFiltering executes the changeset side
  * first and pushes the touched partition values here as predicates
  * BEFORE planInputPartitions — so only affected groups are read, and
  * the groups actually emitted are recorded for the commit. */
class LakeGroupScan(key: String, schema: StructType,
    op: LakeRowLevelOperation)
    extends LakeScan(key, schema)
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
  import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}

  private def state = LakeStore.get(key)
  private def partitionCols: Seq[String] = state.map(_.partitionCols).getOrElse(Nil)

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
        val rows = kept match {
          case Some(gs) => s.current.filter(r => gs.contains(s.groupOf(r)))
          case None => s.current
        }
        // record what this scan EMITS: exactly the groups the commit
        // must replace (filtered set if pruning ran, else every group —
        // for an unpartitioned table groupOf is the empty tuple, i.e.
        // "the whole table" as one group)
        op.scannedGroups = Some(kept.getOrElse(rows.map(s.groupOf).toSet))
        rows
      case None => Array.empty[Array[Any]]
    }
    sliced(parts)
  }
}

/** Snapshot scan: rows are captured at plan time (driver), so a MERGE
  * that reads and replaces the same table sees the pre-merge state for
  * the whole query and the swap is atomic at commit. */
class LakeScan(key: String, schema: StructType,
    pinnedVersion: Option[Int] = None) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

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

  override def planInputPartitions(): Array[InputPartition] =
    sliced(LakeStore.get(key).map(st =>
      pinnedVersion.fold(st.current)(st.snapshots(_))).getOrElse(Array.empty))

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeReaderFactory(schema)
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
    replaceOnCommit: Boolean,
    replacedGroups: () => Option[Set[List[Any]]] = () => None) extends WriteBuilder {
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
        val off = row.numFields - dts.length
        buf += Array.tabulate(dts.length)(j =>
          LakeStore.toStored(if (row.isNullAt(off + j)) null else row.get(off + j, dts(j))))
      }
      override def commit(): WriterCommitMessage = LakeCommit(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
  }
}
