package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The lake's PARTITION-TRANSFORM FUNCTION CATALOG — the piece that lets
  * Spark reason about hidden partitioning (Iceberg's SystemFunctions
  * pattern: a `FunctionCatalog` exposing `bucket`/`days`/... at the
  * catalog's root namespace). Two jobs:
  *
  *   1. STORAGE-PARTITIONED JOINS OVER TRANSFORMS. Catalyst resolves a
  *      scan's reported `KeyGroupedPartitioning(bucket(8, doc_id))` by
  *      loading `bucket` from the table's catalog and binding it
  *      (`V2ExpressionUtils.toCatalystTransformOpt`); two scans align
  *      exchange-free exactly when their bound functions' canonical
  *      names and partition values agree. Without this catalog the
  *      transform never resolves and transform-partitioned tables
  *      silently fall back to shuffling — identity columns were the
  *      only SPJ-eligible spec before this file.
  *   2. QUERYABLE TRANSFORMS: `SELECT graft_lake.bucket(8, doc_id)`
  *      computes the same value the writer used to route the row, so a
  *      user (or test) can audit group assignment in SQL.
  *
  * Every bound function delegates to [[LakeStore.partKey]] — the ONE
  * definition of each transform, shared with the write path (group
  * routing), zone pruning, and the manifest. A hash computed here is
  * the hash on disk, by construction, for every supported source type
  * (the murmur canonicalization pads integrals to long bytes, so a
  * widened column keeps its bucket assignment — same contract as the
  * bloom filters). */
object LakeFunctions {

  /** Function names served at the catalog root namespace. */
  val names: Array[String] =
    Array("bucket", "truncate", "days", "hours", "months", "years")

  def load(name: String): Option[UnboundFunction] = name match {
    case "bucket"   => Some(BucketUnbound)
    case "truncate" => Some(TruncateUnbound)
    case "days" | "hours" | "months" | "years" => Some(new TimeUnbound(name))
    case _ => None
  }

  private def pk(fn: String, arg: Int, v: Any): Any =
    LakeStore.partKey(LakeStore.PartExpr(s"$fn", "arg", fn, arg), v)

  /** STORED-form value out of an InternalRow slot — the same
    * representation [[LakeStore.partKey]] canonicalizes (java String
    * for strings, boxed integrals). */
  private def storedAt(row: InternalRow, i: Int, dt: DataType): Any = dt match {
    case StringType => row.getUTF8String(i).toString
    case LongType | TimestampType | TimestampNTZType => java.lang.Long.valueOf(row.getLong(i))
    case IntegerType | DateType => java.lang.Integer.valueOf(row.getInt(i))
    case ShortType => java.lang.Short.valueOf(row.getShort(i))
    case ByteType => java.lang.Byte.valueOf(row.getByte(i))
    case other => throw new UnsupportedOperationException(
      s"graft_lake: unsupported transform input type ${other.simpleString}")
  }

  /** Marker for [[BucketUnbound]]'s bound instances — reducer
    * compatibility must only ever fire between two graft bucket
    * functions (each `bind` returns a fresh anonymous instance, so
    * identity cannot tell). */
  private trait GraftBucketFn

  /** `bucket_n -> bucket_m` group-key reduction — ships INSIDE the plan
    * (`StoragePartitionJoinParams`), so it must serialize standalone
    * (the `Reducer` interface itself is not `Serializable`). */
  private final case class BucketReducer(m: Int)
      extends org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer]
      with Serializable {
    override def reduce(v: Integer): Integer =
      if (v == null) null else Integer.valueOf(v % m)
  }

  /** `bucket(N, col)` — murmur3 over canonical bytes, mod N. The
    * canonical name is type-blind ON PURPOSE: integral canonicalization
    * pads to long bytes, so bucket(8, int_col) and bucket(8, bigint_col)
    * agree row-for-row and may legally co-partition.
    *
    * Also a [[ReducibleFunction]] (Iceberg's compatible-bucket-counts
    * move): when two joined tables bucket the same key with counts n
    * and m where m divides n, the n-side REDUCES each bucket id mod m —
    * sound because `(h mod n) mod m == h mod m` exactly when m | n —
    * and the storage-partitioned join still plans with zero exchanges,
    * two-to-one group alignment instead of a full shuffle. Gated by
    * Spark's `spark.sql.sources.v2.bucketing.allowCompatibleTransforms
    * .enabled`. */
  private object BucketUnbound extends UnboundFunction {
    import org.apache.spark.sql.connector.catalog.functions.{Reducer, ReducibleFunction}
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col) — graft_lake partition transform (murmur3)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 && inputType(0).dataType == IntegerType,
        s"graft_lake: bucket expects (int numBuckets, col), got $inputType")
      val src = inputType(1).dataType
      src match {
        case StringType | LongType | IntegerType | ShortType | ByteType => ()
        case other => throw new UnsupportedOperationException(
          s"graft_lake: bucket over ${other.simpleString} unsupported")
      }
      new ScalarFunction[Integer] with ReducibleFunction[Integer, Integer]
          with GraftBucketFn {
        override def inputTypes(): Array[DataType] = Array(IntegerType, src)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String = "graft_lake.bucket"
        override def produceResult(row: InternalRow): Integer =
          if (row.isNullAt(1)) null
          else pk("bucket", row.getInt(0), storedAt(row, 1, src))
            .asInstanceOf[Integer]
        override def reducer(thisN: Int,
            other: ReducibleFunction[_, _], otherN: Int): Reducer[Integer, Integer] =
          other match {
            case _: GraftBucketFn if otherN > 0 && thisN != otherN &&
                thisN % otherN == 0 =>
              BucketReducer(otherN)
            case _ => null // incompatible counts: no reduction exists
          }
      }
    }
  }

  /** `truncate(W, col)` — W-char string prefix / width-W integral
    * floor; the one transform whose key keeps the source type. */
  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(width, col) — graft_lake partition transform (prefix/floor)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 && inputType(0).dataType == IntegerType,
        s"graft_lake: truncate expects (int width, col), got $inputType")
      val src = inputType(1).dataType
      src match {
        case StringType | LongType | IntegerType | ShortType | ByteType => ()
        case other => throw new UnsupportedOperationException(
          s"graft_lake: truncate over ${other.simpleString} unsupported")
      }
      new ScalarFunction[Any] {
        override def inputTypes(): Array[DataType] = Array(IntegerType, src)
        override def resultType(): DataType = src
        override def name(): String = "truncate"
        override def canonicalName(): String =
          s"graft_lake.truncate(${src.catalogString})"
        override def produceResult(row: InternalRow): Any =
          if (row.isNullAt(1)) null
          else pk("truncate", row.getInt(0), storedAt(row, 1, src)) match {
            case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
            case other => other
          }
      }
    }
  }

  /** `days`/`hours`/`months`/`years(ts)` — calendar ordinals since
    * epoch, INT-keyed (hours is timestamp-only, like the write path). */
  private final class TimeUnbound(fn: String) extends UnboundFunction {
    override def name(): String = fn
    override def description(): String =
      s"$fn(ts) — graft_lake partition transform (epoch-$fn ordinal)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1,
        s"graft_lake: $fn expects one timestamp/date column, got $inputType")
      val src = inputType(0).dataType
      val ok = src == TimestampType || src == TimestampNTZType ||
        (src == DateType && fn != "hours")
      if (!ok) throw new UnsupportedOperationException(
        s"graft_lake: $fn over ${src.simpleString} unsupported")
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(src)
        override def resultType(): DataType = IntegerType
        override def name(): String = fn
        override def canonicalName(): String = s"graft_lake.$fn"
        override def produceResult(row: InternalRow): Integer =
          if (row.isNullAt(0)) null
          else pk(fn, 0, storedAt(row, 0, src)).asInstanceOf[Integer]
      }
    }
  }
}
