package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: ColBERT MaxSim between two flat multi-vector
  * arrays — `graft_maxsim(q, d, nTokens)` splits each array into nTokens
  * equal contiguous token slices and returns
  *
  *   sum over query tokens t of  max over doc tokens b of  cos(q_t, d_b)
  *
  * Why an Expression: the HOF spelling (nested aggregate/transform/zip_with,
  * see operators.SimilarityQueries.s16MaxSim's oracle text) walks five
  * lambda closures and allocates intermediate arrays per (t, b) pair —
  * and higher-order functions are interpreted, so the whole late-
  * interaction scoring drops out of whole-stage codegen. This emits one
  * fused primitive loop nest. Accumulation order is IDENTICAL to the HOF
  * form (left-to-right dot/norm folds with 0.0 seeds, token sum in t
  * order, max via Double.compare — Spark's array_max NaN-greatest
  * ordering), so results are bit-identical with the HOF path and the
  * DuckDB oracle; Round6OpsSpec asserts that equality on testdata.
  *
  * Null semantics: null if either array is null, lengths differ, or the
  * length does not divide evenly into nTokens (conservative, mirroring
  * graft_cosine's ragged-input rule). nTokens must be a positive literal.
  */
case class MaxSimScore(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType), IntegerType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_maxsim"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!third.foldable) {
      TypeCheckResult.TypeCheckFailure("graft_maxsim: nTokens must be a literal")
    } else {
      third.eval() match {
        case n: Int if n > 0 => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"graft_maxsim: nTokens must be a positive integer literal, got $other")
      }
    }
  }

  private lazy val nTokens: Int = third.eval().asInstanceOf[Int]

  override def nullSafeEval(a: Any, b: Any, t: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // n == 0 passes the divisibility check but would make every slice
    // cosine 0/0 = NaN; degenerate input returns null per the documented
    // conservative rule
    if (n == 0 || n != y.numElements() || n % nTokens != 0) return null
    val w = n / nTokens
    var total = 0.0
    var qt = 0
    while (qt < nTokens) {
      var best = Double.NegativeInfinity
      var db = 0
      while (db < nTokens) {
        var dot = 0.0
        var nq = 0.0
        var nv = 0.0
        var j = 0
        while (j < w) {
          val qj = x.getDouble(qt * w + j)
          val vj = y.getDouble(db * w + j)
          dot += qj * vj
          nq += qj * qj
          nv += vj * vj
          j += 1
        }
        val c = dot / (math.sqrt(nq) * math.sqrt(nv))
        if (java.lang.Double.compare(c, best) > 0) best = c
        db += 1
      }
      total += best
      qt += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, _) => {
      val n = ctx.freshName("n")
      val w = ctx.freshName("w")
      val total = ctx.freshName("total")
      val qt = ctx.freshName("qt")
      val db = ctx.freshName("db")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val nq = ctx.freshName("nq")
      val nv = ctx.freshName("nv")
      val qj = ctx.freshName("qj")
      val vj = ctx.freshName("vj")
      val c = ctx.freshName("c")
      val best = ctx.freshName("best")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0 || $n != $b.numElements() || $n % $nTokens != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $w = $n / $nTokens;
         |  double $total = 0.0;
         |  for (int $qt = 0; $qt < $nTokens; $qt++) {
         |    double $best = Double.NEGATIVE_INFINITY;
         |    for (int $db = 0; $db < $nTokens; $db++) {
         |      double $dot = 0.0, $nq = 0.0, $nv = 0.0;
         |      for (int $j = 0; $j < $w; $j++) {
         |        final double $qj = $a.getDouble($qt * $w + $j);
         |        final double $vj = $b.getDouble($db * $w + $j);
         |        $dot += $qj * $vj;
         |        $nq += $qj * $qj;
         |        $nv += $vj * $vj;
         |      }
         |      final double $c = $dot / (java.lang.Math.sqrt($nq) * java.lang.Math.sqrt($nv));
         |      if (java.lang.Double.compare($c, $best) > 0) $best = $c;
         |    }
         |    $total += $best;
         |  }
         |  ${ev.value} = $total;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MaxSimScore {
  val info = new ExpressionInfo(
    classOf[MaxSimScore].getName, null, "graft_maxsim",
    "graft_maxsim(q, d, nTokens) - ColBERT MaxSim late-interaction score " +
      "between two flat multi-vector double arrays.", "")
}
