package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** BPE apply (SURVEY.md §2 H22): turn a whitespace-token array into
  * exact subword token ids under a fixed merge table + vocabulary —
  * the tokenizer-apply stage of a training-data pipeline, giving H15's
  * sequence packing exact token counts instead of the `chars/4`
  * estimate.
  *
  * Semantics: per word, split to Unicode codepoints, then apply the
  * merge rules IN TABLE ORDER, each exhaustively left-to-right
  * (non-overlapping). For a well-formed learned merge table — one
  * where a rule's output symbol occurs in later rules only, which BPE
  * learning guarantees by construction — this is equivalent to the
  * classic lowest-rank-first greedy apply (spec-proven against a
  * rank-greedy reference implementation), and unlike the greedy loop
  * it is expressible as a bounded recursion, so the DuckDB oracle can
  * replay it exactly (recursive CTE over the rule index with the
  * doubled-separator string-replace trick). Out-of-vocabulary symbols
  * map to -1, deterministically on both engines.
  *
  * Scale shape: pure per-row projection — no shuffle, no driver
  * state; the merge table + vocab ship once per executor as a codegen
  * reference object. A thread-local per-word memo exploits the Zipf
  * distribution of natural text (the same word re-encodes millions of
  * times at corpus scale); it is bounded and clear-on-overflow so
  * long-running executors cannot leak.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
                     vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "bpe_encode needs a vocabulary")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "bpe_encode"

  @transient private lazy val model = new BpeModel(merges, vocab)

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model,
      "graft.functions.BpeModel")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BpeEncode.compute($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The broadcast-once model: merge table, vocab lookup, and a
  * THREAD-LOCAL bounded word memo (the reference object is shared by
  * every task thread of an executor's generated class, so any shared
  * mutable cache would race).
  */
class BpeModel(val merges: Seq[(String, String)], vocab: Seq[String])
    extends Serializable {

  @transient lazy val mergeArr: Array[(String, String)] = merges.toArray

  @transient lazy val vocabMap: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    vocab.zipWithIndex.foreach { case (t, i) => m.put(t, i) }
    m
  }

  @transient lazy val memo:
      ThreadLocal[java.util.HashMap[String, Array[Int]]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Array[Int]]())
}

object BpeEncode {
  private val MemoCap = 1 << 16

  def compute(arr: ArrayData, model: BpeModel): GenericArrayData = {
    val out = new java.util.ArrayList[Integer]()
    val cache = model.memo.get()
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        if (w.nonEmpty) {
          var ids = cache.get(w)
          if (ids == null) {
            ids = encodeWord(w, model)
            if (cache.size() >= MemoCap) cache.clear()
            cache.put(w, ids)
          }
          var j = 0
          while (j < ids.length) { out.add(ids(j)); j += 1 }
        }
      }
      i += 1
    }
    val res = new Array[Int](out.size())
    var k = 0
    while (k < res.length) { res(k) = out.get(k); k += 1 }
    new GenericArrayData(res)
  }

  /** In-order exhaustive merge apply over one word (see class doc). */
  private def encodeWord(w: String, model: BpeModel): Array[Int] = {
    var syms = new Array[String](w.codePointCount(0, w.length))
    var ci = 0
    var si = 0
    while (ci < w.length) {
      val cp = w.codePointAt(ci)
      syms(si) = new String(Character.toChars(cp))
      si += 1
      ci += Character.charCount(cp)
    }
    val merges = model.mergeArr
    var m = 0
    while (m < merges.length) {
      val (a, b) = merges(m)
      // one left-to-right non-overlapping pass == DuckDB replace()
      var changed = false
      var i = 0
      val out = new java.util.ArrayList[String](syms.length)
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out.add(a + b); changed = true; i += 2
        } else { out.add(syms(i)); i += 1 }
      }
      if (changed) syms = out.toArray(new Array[String](out.size()))
      m += 1
    }
    syms.map { s =>
      val id = model.vocabMap.get(s)
      if (id == null) -1 else id.intValue()
    }
  }
}
