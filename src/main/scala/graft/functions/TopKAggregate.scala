package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (ord, payload) pairs, best =
  * highest ord, ties broken by smallest payload (a total order, so the
  * result is deterministic). Flat arrays + insertion into a sorted window
  * — k is small (top-n queries), so O(k) insert beats heap overhead.
  */
final class TopKBuffer(val k: Int) {
  // sorted best-first: ords descending, payload ascending within equal ord
  val ords = new Array[Double](k)
  val payloads = new Array[Long](k)
  var size = 0

  /** SQL sort order on doubles: NaN sorts greatest (so it is "best" when
    * descending), -0.0 equals 0.0. Plain IEEE comparisons return false
    * for any NaN operand, which would let a buffered NaN block later
    * legitimate inserts — hence the explicit total order, matching what
    * the window/oracle formulations produce.
    */
  private def cmpOrd(a: Double, b: Double): Int = {
    val an = a.isNaN
    val bn = b.isNaN
    if (an && bn) 0
    else if (an) 1
    else if (bn) -1
    else if (a == b) 0
    else if (a > b) 1 else -1
  }

  private def beats(o: Double, p: Long, i: Int): Boolean = {
    val c = cmpOrd(o, ords(i))
    c > 0 || (c == 0 && p < payloads(i))
  }

  def add(o: Double, p: Long): Unit = {
    if (size == k && !beats(o, p, k - 1)) return
    var i = if (size == k) k - 1 else { size += 1; size - 1 }
    while (i > 0 && beats(o, p, i - 1)) {
      ords(i) = ords(i - 1); payloads(i) = payloads(i - 1); i -= 1
    }
    ords(i) = o; payloads(i) = p
  }
}

/** `graft_topk(ord, payload, k)` — aggregate returning the k (ord, payload)
  * pairs with the highest ord (ties: lowest payload), sorted best-first, as
  * `array<struct<ord:double, payload:bigint>>`.
  *
  * Why a custom aggregate instead of the window formulation
  * (`row_number() over (partition by g order by ord desc) <= k`, see
  * StarQueries.q15): the window needs a full shuffle + sort of EVERY row on
  * the group key before it can drop any. This aggregate is algebraic — each
  * map task keeps a k-slot buffer per group, so the shuffle carries at most
  * k pairs per (task, group) instead of the whole table, and nothing is
  * ever globally sorted. At 100 TB that is the difference between shuffling
  * terabytes and shuffling kilobytes. Tier (b) of the custom-operator
  * preference order: a TypedImperativeAggregate planned inside
  * ObjectHashAggregateExec with map-side partial aggregation.
  *
  * Null semantics: rows with null ord or payload are skipped (standard
  * aggregate behavior); an empty group yields an empty array.
  */
case class GraftTopK(
    ordExpr: Expression,
    payloadExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  override def inputTypes = Seq(DoubleType, LongType, IntegerType)

  private lazy val k: Int = {
    require(kExpr.foldable, "graft_topk: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Int]
    require(v > 0, s"graft_topk: k must be positive, got $v")
    v
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ordExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (o != null && p != null)
      buffer.add(o.asInstanceOf[Double], p.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buffer.add(other.ords(i), other.payloads(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData((0 until buffer.size).map { i =>
      InternalRow(buffer.ords(i), buffer.payloads(i))
    }.toArray[Any])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.size * 16)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.ords(i)); bb.putLong(buffer.payloads(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    // inputs arrive best-first and pre-bounded, so add() appends in O(1)
    while (i < n) { buf.add(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(ordExpr, payloadExpr, kExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(ordExpr = newChildren(0), payloadExpr = newChildren(1), kExpr = newChildren(2))
}

object TopKAggregate {
  val info = new ExpressionInfo(
    classOf[GraftTopK].getName, null, "graft_topk",
    "graft_topk(ord, payload, k) - top k (ord, payload) pairs by ord desc, payload asc.", "")
}
