package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector-similarity kernels for the ANN/dedup scoring paths.
  *
  * The previous Column-level forms — aggregate(zip_with(a, b, ...)) for
  * the dot product and transform(vec, x -> x / n) for normalization —
  * are higher-order functions: Catalyst evaluates them per row via
  * interpreted lambda dispatch and materializes an intermediate array
  * per pair, and the surrounding operator drops out of whole-stage
  * codegen. Brute-force scoring evaluates them |corpus| x |queries|
  * times, making the lambda/allocation overhead the dominant CPU of
  * t_media_ann / t_knn_label / t_ann_cosine (guide step 2: per-task
  * work — eliminate non-codegen expressions in the hot path).
  *
  * Bit-exactness contract (these kernels REPLACE the HOF forms, so
  * every float op must land identically):
  *  - folds run left-to-right from 0.0 exactly like aggregate();
  *    per-accumulator sequences are unchanged when fused in one loop;
  *  - elements widen to double exactly like x.cast("double") (float
  *    widening, integral toDouble, Decimal.toDouble);
  *  - zip_with's null semantics are preserved: unequal lengths or a
  *    null element poison the fold -> the whole result is NULL;
  *  - cosine = dot / (sqrt(sa) * sqrt(sb)) — the dot/(|a||b|) shape
  *    the DuckDB oracles' list_cosine_similarity also computes.
  *
  * Float/double element types take an allocation-free direct path; any
  * other numeric element type (the SQL surface accepts e.g. decimal
  * literals) goes through a boxed per-element conversion — identical
  * values, just not the hot path.
  */
object VecOps {

  @inline private def fastElem(a: ArrayData, i: Int, isDouble: Boolean)
      : Double =
    if (isDouble) a.getDouble(i) else a.getFloat(i).toDouble

  private def slowElem(a: ArrayData, i: Int, t: DataType): Double =
    a.get(i, t) match {
      case d: Decimal => d.toDouble
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalStateException(
        s"graft vec kernel: non-numeric element $other")
    }

  private def isFast(t: DataType): Boolean =
    t == FloatType || t == DoubleType

  /** dot(a, b) / (|a| * |b|), or null under zip_with null semantics. */
  def cosine(a: ArrayData, b: ArrayData, aT: DataType, bT: DataType)
      : java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var sa = 0.0
    var sb = 0.0
    if (isFast(aT) && isFast(bT)) {
      val aD = aT == DoubleType
      val bD = bT == DoubleType
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = fastElem(a, i, aD)
        val y = fastElem(b, i, bD)
        dot += x * y
        sa += x * x
        sb += y * y
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = slowElem(a, i, aT)
        val y = slowElem(b, i, bT)
        dot += x * y
        sa += x * x
        sb += y * y
        i += 1
      }
    }
    java.lang.Double.valueOf(dot / (math.sqrt(sa) * math.sqrt(sb)))
  }

}

/** cosine(a, b) = dot / (|a| |b|) — the Ann.cosine shape. */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: NumericType, _), ArrayType(_: NumericType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName(a, b) requires numeric arrays on both sides, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  private lazy val leftElemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val rightElemType: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    VecOps.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftElemType, rightElemType)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cl = left.genCode(ctx)
    val cr = right.genCode(ctx)
    val lt = ctx.addReferenceObj("leftElemType", leftElemType)
    val rt = ctx.addReferenceObj("rightElemType", rightElemType)
    val boxed = ctx.freshName("vecRes")
    val code =
      code"""
        ${cl.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${cl.isNull}) {
          ${cr.code}
          if (!${cr.isNull}) {
            java.lang.Double $boxed = graft.functions.VecOps.cosine(
              ${cl.value}, ${cr.value}, $lt, $rt);
            if ($boxed != null) {
              ${ev.isNull} = false;
              ${ev.value} = $boxed.doubleValue();
            }
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
