package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokens → sorted distinct 60-bit shingle hashes
  * (SURVEY.md §2 F3 verify path): one codegen'd pass builds the
  * n-gram, md5-hashes it, and keeps the top-60-bits — numerically
  * identical to `conv(substr(md5(shingle),1,15),16,10)` and therefore
  * to the DuckDB oracle's `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`.
  * Avoids materializing shingle strings as a column and the
  * interpreted lambda the HOF formulation would run per element.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val Sep = UTF8String.fromString(" ")
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5 (first 15 hex chars as an unsigned int). */
  def hash60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  def compute(arr: ArrayData, n: Int): GenericArrayData = {
    val len = arr.numElements()
    val seen = new java.util.HashSet[Long]()
    var i = 0
    while (i + n <= len) {
      val s =
        if (n == 1) arr.getUTF8String(i)
        else {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
          UTF8String.concatWs(Sep, parts: _*)
        }
      seen.add(hash60(s.getBytes))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}
