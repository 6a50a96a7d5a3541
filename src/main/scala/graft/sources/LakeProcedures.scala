package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** STORED PROCEDURES — the maintenance operations as first-class SQL
  * (`CALL graft_lake.system.optimize(...)`), the Iceberg procedure
  * surface on Spark 4's native DSv2 procedure API
  * ([[org.apache.spark.sql.connector.catalog.ProcedureCatalog]], bound
  * by the analyzer, argument coercion and named/positional invocation
  * included): a pipeline can now run its whole maintenance window —
  * compaction, retention, rollback, forks, spec changes — as SQL
  * statements with RESULT SETS, no Scala API in sight. Each procedure
  * is a driver-side metadata operation (or launches distributed work
  * through the same audited paths the p-rows pin: `optimize` is the
  * one range-shuffle of [[GraftLake.optimize]], `vacuum`/`restore`/
  * `clone`/`set_partition_spec` are manifest commits), and returns its
  * outcome as a one-row [[LocalScan]] — what `CALL` surfaces to the
  * user, and what p50 hash-pins.
  *
  * Table arguments accept `name` (resolved in this catalog) or a fully
  * qualified `catalog.table` key. */
object LakeProcedures {

  val Names: Seq[String] = Seq(
    "optimize", "compact", "rewrite_deletes", "copy_into", "vacuum", "restore",
    "clone", "set_partition_spec", "create_branch", "create_tag", "publish",
    "drop_ref", "analyze")

  def identifiers(namespace: Array[String]): Array[Identifier] =
    Names.map(n => Identifier.of(Array("system"), n)).toArray

  def load(catalog: String, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"graft_lake: procedures live in the `system` namespace, got " +
        s"${ident.namespace().mkString(".")}.${ident.name()}")
    procs.getOrElse(ident.name(), throw new UnsupportedOperationException(
      s"graft_lake: unknown procedure ${ident.name()} " +
        s"(available: ${Names.mkString(", ")})"))
      .forCatalog(catalog)
  }

  private def key(catalog: String, t: String): String =
    if (t.contains('.')) t else s"$catalog.$t"

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType, dflt: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(dflt).build()

  private def utf(s: String): UTF8String = UTF8String.fromString(s)
  private def row(vals: Any*): Array[InternalRow] = {
    val r = new GenericInternalRow(vals.length)
    vals.zipWithIndex.foreach { case (v, i) => r.update(i, v) }
    Array[InternalRow](r)
  }

  /** One procedure: unbound and bound in one object (binding is purely
    * signature-driven here), producing a single-row LocalScan result. */
  private final case class Proc(name0: String, params: Array[ProcedureParameter],
      out: StructType, body: (String, InternalRow) => Array[InternalRow]) {
    def forCatalog(catalog: String): UnboundProcedure = new UnboundProcedure {
      override def name(): String = name0
      override def description(): String = s"graft_lake maintenance procedure $name0"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = name0
        override def description(): String = s"graft_lake maintenance procedure $name0"
        override def parameters(): Array[ProcedureParameter] = params
        override def isDeterministic: Boolean = false // mutates table state
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          // resolved OUTSIDE the anon class: inside it, a bare `rows`
          // is the method itself (infinite self-recursion)
          val resultRows = body(catalog, input)
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = resultRows
            override def readSchema(): StructType = out
            override def description(): String = s"graft_lake.system.$name0 result"
          }).iterator()
        }
      }
    }
  }

  private val procs: Map[String, Proc] = Map(
    "optimize" -> Proc("optimize",
      Array(in("tbl", StringType), in("cluster_cols", StringType),
        inDefault("n_files", IntegerType, "16")),
      StructType(Seq(
        StructField("files_before", LongType, nullable = false),
        StructField("files_after", LongType, nullable = false),
        StructField("version", LongType, nullable = false))),
      (catalog, input) => {
        val k = key(catalog, input.getUTF8String(0).toString)
        val cols = input.getUTF8String(1).toString.split(',').map(_.trim).toSeq
        val n = input.getInt(2)
        val before = LakeStore.get(k).map(_.current.length.toLong).getOrElse(0L)
        GraftLake.optimize(SparkSession.active, k, cols, n)
        val st = LakeStore.get(k).get
        row(before, st.current.length.toLong, st.latestVersion.toLong)
      }),

    "compact" -> Proc("compact",
      Array(in("tbl", StringType), in("max_file_bytes", LongType),
        inDefault("min_input_files", IntegerType, "2")),
      StructType(Seq(
        StructField("groups_compacted", LongType, nullable = false),
        StructField("files_removed", LongType, nullable = false),
        StructField("files_after", LongType, nullable = false))),
      (catalog, input) => {
        val k = key(catalog, input.getUTF8String(0).toString)
        val (groups, removed) = GraftLake.compact(
          SparkSession.active, k, input.getLong(1), input.getInt(2))
        row(groups.toLong, removed.toLong,
          LakeStore.get(k).map(_.current.length.toLong).getOrElse(0L))
      }),

    "rewrite_deletes" -> Proc("rewrite_deletes",
      Array(in("tbl", StringType), inDefault("min_sidecars", IntegerType, "2")),
      StructType(Seq(
        StructField("files_rewritten", LongType, nullable = false),
        StructField("sidecars_removed", LongType, nullable = false),
        StructField("sidecars_after", LongType, nullable = false))),
      (catalog, input) => {
        val k = key(catalog, input.getUTF8String(0).toString)
        val (files, removedSidecars) =
          LakeStore.rewriteDeletes(k, input.getInt(1))
        row(files.toLong, removedSidecars.toLong,
          LakeStore.get(k).map(_.deletes.length.toLong).getOrElse(0L))
      }),

    "copy_into" -> Proc("copy_into",
      Array(in("tbl", StringType), in("src_dir", StringType),
        inDefault("pattern", StringType, "'*.parquet'")),
      StructType(Seq(
        StructField("files_loaded", LongType, nullable = false),
        StructField("rows_loaded", LongType, nullable = false))),
      (catalog, input) => {
        val k = key(catalog, input.getUTF8String(0).toString)
        val (nf, nr) = GraftLake.copyInto(SparkSession.active, k,
          input.getUTF8String(1).toString, input.getUTF8String(2).toString)
        row(nf.toLong, nr)
      }),

    "vacuum" -> Proc("vacuum",
      Array(in("tbl", StringType), inDefault("retain_last", IntegerType, "1"),
        inDefault("grace_ms", LongType, LakeStore.orphanGraceMs.toString)),
      StructType(Seq(
        StructField("files_deleted", LongType, nullable = false),
        StructField("horizon", LongType, nullable = false))),
      (catalog, input) => {
        val k = key(catalog, input.getUTF8String(0).toString)
        val (deleted, horizon) =
          LakeStore.vacuum(k, input.getInt(1), input.getLong(2))
        row(deleted.toLong, horizon.toLong)
      }),

    "restore" -> Proc("restore",
      Array(in("tbl", StringType), in("version", IntegerType)),
      StructType(Seq(
        StructField("restored_to", LongType, nullable = false),
        StructField("new_version", LongType, nullable = false))),
      (catalog, input) => {
        val k = key(catalog, input.getUTF8String(0).toString)
        val v = input.getInt(1)
        LakeStore.restore(k, v)
        row(v.toLong, LakeStore.get(k).get.latestVersion.toLong)
      }),

    "clone" -> Proc("clone",
      Array(in("source", StringType), in("target", StringType)),
      StructType(Seq(
        StructField("files_referenced", LongType, nullable = false))),
      (catalog, input) => {
        val src = key(catalog, input.getUTF8String(0).toString)
        val dst = key(catalog, input.getUTF8String(1).toString)
        GraftLake.shallowClone(src, dst)
        row(LakeStore.get(dst).get.current.length.toLong)
      }),

    "set_partition_spec" -> Proc("set_partition_spec",
      Array(in("tbl", StringType), in("cols", StringType)),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("spec", StringType, nullable = false))),
      (catalog, input) => {
        val k = key(catalog, input.getUTF8String(0).toString)
        val cols = input.getUTF8String(1).toString.split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        GraftLake.setPartitionSpec(k, cols)
        val st = LakeStore.get(k).get
        row(st.latestVersion.toLong, utf(st.partitionCols.mkString(",")))
      }),

    "create_branch" -> Proc("create_branch",
      Array(in("tbl", StringType), in("name", StringType),
        inDefault("at_version", IntegerType, "-1")),
      StructType(Seq(
        StructField("ref", StringType, nullable = false),
        StructField("created_at_version", LongType, nullable = false))),
      (catalog, input) => {
        val k = key(catalog, input.getUTF8String(0).toString)
        val name = input.getUTF8String(1).toString
        val at = Option(input.getInt(2)).filter(_ >= 0)
        val v = GraftLake.createBranch(k, name, at)
        row(utf(name), v.toLong)
      }),

    "create_tag" -> Proc("create_tag",
      Array(in("tbl", StringType), in("name", StringType),
        inDefault("at_version", IntegerType, "-1")),
      StructType(Seq(
        StructField("ref", StringType, nullable = false),
        StructField("created_at_version", LongType, nullable = false))),
      (catalog, input) => {
        val k = key(catalog, input.getUTF8String(0).toString)
        val name = input.getUTF8String(1).toString
        val at = Option(input.getInt(2)).filter(_ >= 0)
        val v = GraftLake.createTag(k, name, at)
        row(utf(name), v.toLong)
      }),

    "publish" -> Proc("publish",
      Array(in("tbl", StringType), in("branch", StringType)),
      StructType(Seq(
        StructField("branch_head", LongType, nullable = false),
        StructField("publish_version", LongType, nullable = false))),
      (catalog, input) => {
        val k = key(catalog, input.getUTF8String(0).toString)
        val (bh, pv) = GraftLake.publish(k, input.getUTF8String(1).toString)
        row(bh.toLong, pv.toLong)
      }),

    "drop_ref" -> Proc("drop_ref",
      Array(in("tbl", StringType), in("name", StringType)),
      StructType(Seq(
        StructField("dropped", StringType, nullable = false))),
      (catalog, input) => {
        val k = key(catalog, input.getUTF8String(0).toString)
        val name = input.getUTF8String(1).toString
        GraftLake.dropRef(k, name)
        row(utf(name))
      }),

    "analyze" -> Proc("analyze",
      Array(in("tbl", StringType), in("cols", StringType),
        inDefault("with_blooms", org.apache.spark.sql.types.BooleanType, "false")),
      StructType(Seq(
        StructField("files_analyzed", LongType, nullable = false),
        StructField("columns_sketched", LongType, nullable = false),
        StructField("version", LongType, nullable = false))),
      (catalog, input) => {
        val k = key(catalog, input.getUTF8String(0).toString)
        val cols = input.getUTF8String(1).toString.split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        val (nf, nc) = GraftLake.analyzeTable(SparkSession.active, k, cols,
          withBlooms = input.getBoolean(2))
        row(nf.toLong, nc.toLong, LakeStore.get(k).get.latestVersion.toLong)
      }))
}
