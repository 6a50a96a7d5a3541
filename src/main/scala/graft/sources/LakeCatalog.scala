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
  * statement outright. This catalog implements exactly that contract in
  * its simplest sound form — GROUP-BASED copy-on-write with the whole
  * table as one group: the row-level operation's scan reads the current
  * snapshot, Catalyst's rewritten plan computes carry-over + merged rows
  * DISTRIBUTED (the join, clause routing, and row construction all run
  * as ordinary Spark operators over the scan), and the replacement write
  * swaps the table content atomically at commit. Storage is a
  * driver-side snapshot map (the catalog's "metastore + data files" in
  * one), which bounds table size by driver memory — the production
  * analogue swaps that single class for parquet file groups exactly the
  * way Delta/Iceberg do, while every DISTRIBUTED piece (the rewrite, the
  * join, the writers) stays as planned here. At 100 TB the group
  * granularity — not this storage shim — is the scale lever: partition
  *-grouped copy-on-write touches only affected partitions.
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
  final case class TableState(schema: StructType, snapshots: Vector[Array[Array[Any]]]) {
    def current: Array[Array[Any]] = snapshots.last
    def latestVersion: Int = snapshots.length - 1
  }

  private val tables = TrieMap.empty[String, TableState]

  def key(catalog: String, ident: Identifier): String =
    (Seq(catalog) ++ ident.namespace().toSeq :+ ident.name()).mkString(".")

  def get(k: String): Option[TableState] = tables.get(k)
  def create(k: String, schema: StructType): Boolean =
    tables.putIfAbsent(k, TableState(schema, Vector(Array.empty))).isEmpty
  def drop(k: String): Boolean = tables.remove(k).isDefined
  def list(catalog: String): Seq[String] =
    tables.keys.filter(_.startsWith(catalog + ".")).toSeq.sorted

  def append(k: String, newRows: Array[Array[Any]]): Unit = tables.synchronized {
    val st = tables(k)
    tables.update(k, st.copy(snapshots = st.snapshots :+ (st.current ++ newRows)))
  }
  def replace(k: String, newRows: Array[Array[Any]]): Unit = tables.synchronized {
    val st = tables(k)
    tables.update(k, st.copy(snapshots = st.snapshots :+ newRows))
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
    require(partitions.isEmpty, "graft_lake tables are unpartitioned (one copy-on-write group)")
    if (!LakeStore.create(k(ident), schema))
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

/** Group-based row-level operation, whole table = the one group: the
  * scan hands Catalyst the full current snapshot and the write builder's
  * commit swaps in the rewritten plan's full output (carry-over rows
  * included — Catalyst's rewrite produces them for copy-on-write). */
class LakeRowLevelOperation(key: String, schema: StructType,
    info: RowLevelOperationInfo) extends RowLevelOperation {
  override def command(): RowLevelOperation.Command = info.command()
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new LakeScan(key, schema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LakeWriteBuilder(key, info.schema(), replaceOnCommit = true)
}

/** Snapshot scan: rows are captured at plan time (driver), so a MERGE
  * that reads and replaces the same table sees the pre-merge state for
  * the whole query and the swap is atomic at commit. */
class LakeScan(key: String, schema: StructType,
    pinnedVersion: Option[Int] = None) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val rows = LakeStore.get(key).map(st =>
      pinnedVersion.fold(st.current)(st.snapshots(_))).getOrElse(Array.empty)
    // split the snapshot so the downstream rewrite parallelizes even in
    // this single-JVM store (a file-backed variant would hand back one
    // partition per file group)
    val slices = math.max(1, math.min(4, rows.length))
    rows.grouped(math.max(1, (rows.length + slices - 1) / slices))
      .map(chunk => LakePartition(chunk): InputPartition).toArray match {
      case empty if empty.isEmpty => Array(LakePartition(Array.empty))
      case parts => parts
    }
  }
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
    replaceOnCommit: Boolean) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        new LakeWriterFactory(writeSchema)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val rows = messages.iterator
          .map(_.asInstanceOf[LakeCommit])
          .flatMap(_.rows.iterator)
          .toArray
        if (replaceOnCommit) LakeStore.replace(key, rows)
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
