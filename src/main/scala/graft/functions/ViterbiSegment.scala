package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-word Viterbi segmentation under a piece-cost lattice — the
  * codegen'd replacement for unigramSegment's two interpreted
  * `aggregate` folds (SURVEY.md §2 H7e/H22b hot path). The SQL folds
  * are CodegenFallback AND re-scan the whole lattice array per prefix
  * position (`filter(ps, p -> p.en = i)`): O(len · |lattice|)
  * interpreted lambda work per distinct word. This kernel buckets the
  * lattice by end position once and replays the EXACT fold semantics
  * in O(|lattice|) int64 ops:
  *
  *   best(0) = 0;  best(i) = min over entries (st, en = i, cost) of
  *     best(st − 1) + cost, or INF = 10^15 when position i has no
  *     entry (the fold's coalesce; sums past INF are NOT re-clamped,
  *     exactly like the replaced expression);
  *   the canonical path re-derives FORWARD: at each i the chosen last
  *     piece start is the MINIMAL st among cost-achieving entries
  *     (longest-piece-first), piece text = substring(w, st, i−st+1)
  *     with Spark substring semantics (UTF8String character offsets).
  *
  * Output mirrors the folds' readout: struct(wcost = best(n),
  * segs = the path's pieces in order). The replaced expression yields
  * NULL segs when a position on the path has no cost-achieving entry
  * (null propagates through its path strings); that requires best(i)
  * = INF with no entries at i on the chosen chain, which single-char
  * vocab coverage rules out — mirrored here as a null segs anyway.
  */
case class ViterbiSegment(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StructType(Array(
          StructField("en", IntegerType, _, _),
          StructField("st", IntegerType, _, _),
          StructField("cost", LongType, _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"viterbi_segment requires (string, array<struct<en:int,st:int," +
          s"cost:bigint>>), got ${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("wcost", LongType, nullable = false),
    StructField("segs", ArrayType(StringType, containsNull = false),
      nullable = true)))

  override def prettyName: String = "viterbi_segment"

  override def nullSafeEval(w: Any, ps: Any): Any =
    ViterbiSegment.compute(w.asInstanceOf[UTF8String], ps.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, ps) =>
      s"${ev.value} = graft.functions.ViterbiSegment.compute($w, $ps);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ViterbiSegment {
  private val Inf = 1000000000000000L

  def compute(w: UTF8String, ps: ArrayData): InternalRow = {
    val n = w.numChars()
    val m = ps.numElements()
    // bucket lattice entries by end position: head/next index chains
    val head = new Array[Int](n + 1); java.util.Arrays.fill(head, -1)
    val next = new Array[Int](m)
    val stArr = new Array[Int](m)
    val costArr = new Array[Long](m)
    var j = 0
    while (j < m) {
      val row = ps.getStruct(j, 3)
      val en = row.getInt(0)
      stArr(j) = row.getInt(1)
      costArr(j) = row.getLong(2)
      if (en >= 1 && en <= n) {
        // fail loudly on a malformed entry, mirroring the replaced
        // fold's ANSI element_at out-of-range error: st < 1 indexed
        // below the fold's 1-based accumulator, st > en read past the
        // i-element prefix. Without the guard st > en would silently
        // read a zero-initialized best() (ADVICE r16). Entries with en
        // outside [1, n] stay skipped — the fold's filter(p.en = i)
        // never touched them either.
        if (stArr(j) < 1 || stArr(j) > en)
          throw new IllegalArgumentException(
            s"viterbi_segment: lattice entry (st=${stArr(j)}, en=$en) " +
              "violates 1 <= st <= en")
        next(j) = head(en); head(en) = j
      }
      j += 1
    }
    val best = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var b = Long.MaxValue
      var e = head(i)
      while (e >= 0) {
        val v = best(stArr(e) - 1) + costArr(e)
        if (v < b) b = v
        e = next(e)
      }
      best(i) = if (b == Long.MaxValue) Inf else b
      i += 1
    }
    // canonical forward path: minimal cost-achieving start per position
    val prev = new Array[Int](n + 1)
    var reachable = true
    i = 1
    while (i <= n) {
      var s = Int.MaxValue
      var e = head(i)
      while (e >= 0) {
        if (best(stArr(e) - 1) + costArr(e) == best(i) && stArr(e) < s)
          s = stArr(e)
        e = next(e)
      }
      prev(i) = s
      i += 1
    }
    // walk the chain backward from n; a position with no achieving
    // entry nulls the path, like the replaced fold's null propagation
    val segsRev = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var pos = n
    while (pos > 0 && reachable) {
      val s = prev(pos)
      if (s == Int.MaxValue) reachable = false
      else {
        segsRev += w.substringSQL(s, pos - s + 1)
        pos = s - 1
      }
    }
    val segs =
      if (!reachable) null
      else new GenericArrayData(segsRev.reverse.toArray[Any])
    new GenericInternalRow(Array[Any](best(n), segs))
  }
}
