package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic 60-bit hash shared with the DuckDB oracle:
  * `conv(substr(md5(utf8(x)),1,15),16,10)` here ≡
  * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)` there (SURVEY.md §6).
  * 15 hex chars keep the value < 2^60, so affine re-hashing
  * (a*h+b) mod p stays inside int64 with p < 2^31.
  */
object Hash60 {

  val Prime: Long = 2147483647L // 2^31 - 1

  def hash60(c: Column): Column =
    conv(substring(md5(to_binary(c, lit("utf-8"))), 1, 15), 16, 10).cast("long")

  /** i-th affine permutation of a 60-bit hash, in [0, Prime). */
  def perm(h: Column, i: Int): Column =
    (((h % Prime) * (1L + 7L * i) + (13L + 11L * i)) % Prime)

  /** Null-safe row key for hashing: a NULL key stringifies as "" so
    * hash-keyed operators (samplers, splits, shuffle order) treat the
    * row deterministically instead of silently dropping it —
    * `hash60(NULL)` is NULL, and NULL comparisons exclude the row
    * from every hash-range filter without a trace.
    *
    * Known collision: a NULL key and a genuine empty-string key (or
    * any key whose string cast is "") hash IDENTICALLY, so they land
    * in the same sample/split/shuffle position together, always.
    * This is deliberate — any in-band sentinel could equally collide
    * with a real cast value, and "" is the one callers can audit for
    * — but callers with string keys should know malformed rows pool
    * with empty-key rows rather than spreading uniformly.
    */
  def rowKey(c: Column): Column = coalesce(c.cast("string"), lit(""))

  /** Tokens of a document: lower, trim, split on whitespace runs. */
  def tokens(text: Column): Column = split(trim(lower(text)), " +")

  /** Opt-in production tokenizer: Unicode-normalize (NFC/NFKC/...)
    * BEFORE case-folding, then the same trim+split — so composed and
    * decomposed spellings of one word tokenize identically. The
    * default [[tokens]] stays normalization-free on purpose: it is
    * the oracle-shared parity definition every existing query uses.
    */
  def tokensNormalized(text: Column, form: String): Column = {
    import org.apache.spark.sql.GraftBridge
    val norm = GraftBridge.column(
      UnicodeNormalize(GraftBridge.expression(text), form))
    split(trim(lower(norm)), " +")
  }

  /** Distinct word n-gram shingles of a token-array column — the
    * native [[WordShingles]] expression (codegen'd single pass).
    */
  def shingles(toksCol: String, n: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(WordShingles(GraftBridge.expression(col(toksCol)), n))
  }

  /** Fused tokens → sorted distinct 60-bit shingle hashes (native). */
  def shingleHashes(toksCol: String, n: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(ShingleHashes(GraftBridge.expression(col(toksCol)), n))
  }
}
