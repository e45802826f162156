package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Image-header decode (SURVEY.md §2 H5b): container format, pixel
  * dimensions and bit depth parsed from the leading bytes of a binary
  * media column — the real decode step of the multimodal family
  * (replacing the round-8 deterministic stub), with zero codec
  * dependency: PNG (IHDR fields after the 8-byte signature), JPEG (a
  * genuine marker-segment walk to the first SOF frame header, skipping
  * APPn/COM/DQT/DHT segments by their declared big-endian lengths and
  * stepping over standalone RST/TEM markers), GIF (little-endian
  * logical-screen descriptor, color resolution from the packed byte),
  * and WebP (RIFF/WEBP container — lossy VP8 with its 9D 01 2A sync
  * and 14-bit LE dims, lossless VP8L with the bit-packed dims after
  * the 0x2F signature, and extended VP8X with LE24 canvas-minus-one
  * pairs; round 14 — web crawls are full of WebP).
  * Unrecognized, truncated, or structurally broken payloads yield a
  * row of null fields, never an exception — a crawl corpus is full of
  * all three.
  *
  * Pure per-row byte algebra in one codegen'd projection: no shuffle,
  * no allocation beyond the 4-field result row, and the parse touches
  * only header bytes however large the payload is.
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_dims requires binary, got ${other.simpleString}")
  }

  override def dataType: DataType = ImageDims.schema

  override def prettyName: String = "image_dims"

  override protected def nullSafeEval(input: Any): Any =
    ImageDims.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.ImageDims.compute($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared eval/codegen kernel (codegen calls it as a static). */
object ImageDims {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bit_depth", IntegerType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def row(fmt: String, w: Int, h: Int, bd: Int): GenericInternalRow = {
    val r = new GenericInternalRow(4)
    r.update(0, UTF8String.fromString(fmt))
    r.update(1, w)
    r.update(2, h)
    r.update(3, bd)
    r
  }

  // a fresh all-null row per miss: consumers may hold or mutate rows,
  // so a shared singleton would be an aliasing bug waiting to happen
  private def nulls(): GenericInternalRow = new GenericInternalRow(4)

  /** SOF0–SOF15 mark a JPEG frame header, except the three non-frame
    * markers wedged into the range: DHT (C4), JPG (C8), DAC (CC).
    */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  def compute(b: Array[Byte]): GenericInternalRow = {
    // —— PNG: 8-byte signature, then the IHDR chunk (first by spec) ——
    if (b.length >= 26 &&
        u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a &&
        u8(b, 6) == 0x1a && u8(b, 7) == 0x0a) {
      if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
        return nulls()
      val w = be32(b, 16)
      val h = be32(b, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue)
        return nulls()
      return row("png", w.toInt, h.toInt, u8(b, 24))
    }
    // —— JPEG: SOI, then walk marker segments to the first SOF ——
    if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var pos = 2
      var guard = 0
      while (pos + 1 < b.length && guard < 4096) {
        guard += 1
        if (u8(b, pos) != 0xff) return nulls()
        val m = u8(b, pos + 1)
        if (m == 0xff) {
          pos += 1                               // fill byte before marker
        } else if (m == 0x01 || m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) {
          pos += 2                               // standalone: TEM/SOI/RSTn
        } else if (m == 0xd9 || m == 0xda) {
          return nulls()                         // EOI / SOS before any SOF
        } else if (isSof(m)) {
          if (pos + 8 >= b.length) return nulls()
          return row("jpeg", be16(b, pos + 7), be16(b, pos + 5), u8(b, pos + 4))
        } else {
          if (pos + 3 >= b.length) return nulls()
          val len = be16(b, pos + 2)
          if (len < 2) return nulls()            // declared length is self-inclusive
          pos += 2 + len
        }
      }
      return nulls()
    }
    // —— GIF: 6-byte version tag, then the logical screen descriptor ——
    if (b.length >= 11 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val packed = u8(b, 10)
      return row("gif", le16(b, 6), le16(b, 8), ((packed >> 4) & 7) + 1)
    }
    // —— WebP: RIFF/WEBP container, first chunk VP8 | VP8L | VP8X ——
    if (b.length >= 16 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
        b(11) == 'P' && b(12) == 'V' && b(13) == 'P' && b(14) == '8') {
      u8(b, 15) match {
        case ' ' => // lossy: 3-byte frame tag, 9D 01 2A sync, 14-bit dims
          if (b.length < 30 || u8(b, 23) != 0x9d || u8(b, 24) != 0x01 ||
            u8(b, 25) != 0x2a) return nulls()
          val w = le16(b, 26) & 0x3fff
          val h = le16(b, 28) & 0x3fff
          if (w == 0 || h == 0) return nulls()
          return row("webp", w, h, 8)
        case 'L' => // lossless: 0x2F sig, then (w-1 | (h-1)<<14) LE bits
          if (b.length < 25 || u8(b, 20) != 0x2f) return nulls()
          val bits = u8(b, 21).toLong | (u8(b, 22).toLong << 8) |
            (u8(b, 23).toLong << 16) | (u8(b, 24).toLong << 24)
          return row("webp", (bits & 0x3fff).toInt + 1,
            ((bits >> 14) & 0x3fff).toInt + 1, 8)
        case 'X' => // extended: canvas (w-1, h-1) as LE24 pairs
          if (b.length < 30) return nulls()
          val w = (u8(b, 24) | (u8(b, 25) << 8) | (u8(b, 26) << 16)) + 1
          val h = (u8(b, 27) | (u8(b, 28) << 8) | (u8(b, 29) << 16)) + 1
          return row("webp", w, h, 8)
        case _ => return nulls()
      }
    }
    nulls()
  }
}
