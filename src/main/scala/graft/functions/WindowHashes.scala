package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** SUBSTR-1 window fingerprints: for a token array of length n and a
  * window of W tokens, the n-W+1 Karp-Rabin fingerprints of every
  * consecutive W-token run, computed with an O(n) ROLLING update
  * (subtract the leaving token's term, shift, add the entering one) —
  * not O(n*W) re-hashing, and not O(n*W) bytes of window text md5'd.
  *
  * Hash definition (frozen; the DuckDB oracle refolds each window
  * directly — mathematically identical mod p — in plain BIGINT):
  *   tokenHash_p(t) = fold over code points: (acc*31 + cp) mod p
  *   winHash_p(i)   = fold over W token hashes: (acc*1000003 + th) mod p
  *   combined       = winHash_p1 * 2^31 + winHash_p2
  * with p1 = 1e9+7, p2 = 998244353. Two independent 31-bit primes give
  * a 62-bit fingerprint: at 10^9 windows the expected collision count
  * is ~10^18/2^63 << 1, versus ~250 expected collisions at 10^6
  * windows for a single 30-bit modulus — a collision here is a FALSE
  * DUPLICATE that deletes innocent text, so the single-prime FP-1
  * fingerprint is not reusable for dedup decisions.
  */
object WindowHashOps {
  // PRECONDITION (r5 advice, recorded into the SUBSTR-1 contract): a
  // NULL token hashes like the empty string (th(i) stays 0), so token
  // arrays containing nulls alias windows with ""-bearing ones. The
  // engine's callers tokenize with filter(split(...), t => t <> ""),
  // which can produce neither nulls nor empties; SQL users passing
  // containsNull arrays inherit the null=="" aliasing.
  val P1 = 1000000007L
  val P2 = 998244353L
  val B = 1000003L

  def eval(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val th1 = new Array[Long](n)
    val th2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        var a1 = 0L; var a2 = 0L
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          a1 = (a1 * 31 + cp) % P1
          a2 = (a2 * 31 + cp) % P2
          j += Character.charCount(cp)
        }
        th1(i) = a1; th2(i) = a2
      }
      i += 1
    }
    val m = n - w + 1
    val out = new Array[Long](m)
    var bw1 = 1L; var bw2 = 1L // B^(w-1) mod p
    var k = 0
    while (k < w - 1) { bw1 = bw1 * B % P1; bw2 = bw2 * B % P2; k += 1 }
    var h1 = 0L; var h2 = 0L
    i = 0
    while (i < w) {
      h1 = (h1 * B + th1(i)) % P1
      h2 = (h2 * B + th2(i)) % P2
      i += 1
    }
    out(0) = h1 * 2147483648L + h2
    i = 1
    while (i < m) {
      h1 = ((h1 - th1(i - 1) * bw1 % P1 + P1) % P1 * B + th1(i + w - 1)) % P1
      h2 = ((h2 - th2(i - 1) * bw2 % P2 + P2) % P2 * B + th2(i + w - 1)) % P2
      out(i) = h1 * 2147483648L + h2
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Merge SORTED 1-based window starts into maximal covered runs: each
  * output long packs (runStart << 32) | runEnd, runs inclusive, a new
  * window [st, st+w-1] extending the current run when st <= end+1.
  * O(|starts|) imperative — a declarative aggregate() fold costs an
  * array copy per element (measured 4x slower end-to-end on
  * t_dedup_substr), and the per-token coverage test then probes r
  * merged runs instead of |starts| raw windows (r = 1 for a fully
  * duplicated doc, where |starts| ~ n).
  */
object RunOps {
  def eval(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0)
      return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val out = new Array[Long](n)
    var cnt = 0
    var s = arr.getInt(0)
    var e = s + w - 1
    var i = 1
    while (i < n) {
      val st = arr.getInt(i)
      if (st <= e + 1) { if (st + w - 1 > e) e = st + w - 1 }
      else {
        out(cnt) = (s.toLong << 32) | e; cnt += 1
        s = st; e = st + w - 1
      }
      i += 1
    }
    out(cnt) = (s.toLong << 32) | e; cnt += 1
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, cnt))
  }
}

case class CoveredRuns(starts: Expression, w: Expression)
    extends BinaryExpression {

  override def left: Expression = starts
  override def right: Expression = w
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = starts.nullable
  override def prettyName: String = "graft_covered_runs"

  override def checkInputDataTypes(): TypeCheckResult =
    starts.dataType match {
      case ArrayType(IntegerType, _)
          if w.dataType == IntegerType && w.foldable =>
        if (w.eval().asInstanceOf[Number].intValue >= 1)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_covered_runs: window must be >= 1")
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_covered_runs(starts, w) requires ARRAY<INT> " +
          s"and a literal INT window, got " +
          s"${starts.dataType.catalogString} and " +
          s"${w.dataType.catalogString}")
    }

  private lazy val wVal: Int = w.eval().asInstanceOf[Number].intValue

  override def eval(input: InternalRow): Any = {
    val v = starts.eval(input)
    if (v == null) null
    else RunOps.eval(v.asInstanceOf[ArrayData], wVal)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = starts.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    val code =
      code"""
        ${c.code}
        $arrCls ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.RunOps.eval(${c.value}, $wVal);
        }
        boolean ${ev.isNull} = ${ev.value} == null;
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(starts = newLeft, w = newRight)
}

case class WindowHashes(tokens: Expression, w: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = w
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = tokens.nullable
  override def prettyName: String = "graft_window_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    tokens.dataType match {
      case ArrayType(StringType, _)
          if w.dataType == IntegerType && w.foldable =>
        if (w.eval().asInstanceOf[Number].intValue >= 2)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_window_hashes: window must be >= 2 tokens")
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_window_hashes(tokens, w) requires ARRAY<STRING> and a " +
          s"literal INT window, got ${tokens.dataType.catalogString} " +
          s"and ${w.dataType.catalogString}")
    }

  private lazy val wVal: Int = w.eval().asInstanceOf[Number].intValue

  override def eval(input: InternalRow): Any = {
    val v = tokens.eval(input)
    if (v == null) null
    else WindowHashOps.eval(v.asInstanceOf[ArrayData], wVal)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = tokens.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    val code =
      code"""
        ${c.code}
        $arrCls ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} =
            graft.functions.WindowHashOps.eval(${c.value}, $wVal);
        }
        boolean ${ev.isNull} = ${ev.value} == null;
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(tokens = newLeft, w = newRight)
}

object WindowHashes {
  /** Column API: the n-w+1 SUBSTR-1 fingerprints of `tokens`. */
  def windowHashes(tokens: Column, w: Int): Column =
    ColumnBridge.column(
      WindowHashes(ColumnBridge.expression(tokens), Literal(w)))

  /** Column API: merge sorted window starts into packed covered runs. */
  def coveredRuns(starts: Column, w: Int): Column =
    ColumnBridge.column(
      CoveredRuns(ColumnBridge.expression(starts), Literal(w)))
}
