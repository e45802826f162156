package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Audio-container header decode (SURVEY.md §2 H6): a real RIFF/WAV
  * chunk walk over the leading bytes of a binary payload — the H5b
  * move ([[ImageDims]]) for the audio modality. Walks the RIFF chunk
  * list ("fmt " may sit behind LIST/INFO or other chunks; sizes are
  * little-endian and odd-sized chunks carry a pad byte the size field
  * does not count), reads the PCM format block (codec tag, channels,
  * sample rate, bits/sample) and the declared `data` chunk size, and
  * derives the exact duration in ms (data·1000 / byte-rate, integer
  * division). Unrecognized, truncated, or structurally broken
  * payloads yield a row of null fields, never an exception.
  *
  * Pure per-row byte algebra in one codegen'd projection: no shuffle,
  * header bytes only.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_meta requires binary, got ${other.simpleString}")
  }

  override def dataType: DataType = AudioMeta.schema
  override def prettyName: String = "audio_meta"

  override protected def nullSafeEval(input: Any): Any =
    AudioMeta.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.AudioMeta.compute($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioMeta {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("codec", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bit_depth", IntegerType),
    StructField("data_bytes", LongType),
    StructField("duration_ms", LongType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  private def nulls(): GenericInternalRow = new GenericInternalRow(7)

  def compute(b: Array[Byte]): GenericInternalRow = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return nulls()
    var pos = 12L
    var guard = 0
    var codec = -1; var channels = -1; var rate = -1; var bits = -1
    var byteRate = -1L
    var dataBytes = -1L
    while (pos + 8 <= b.length && guard < 256) {
      guard += 1
      val p = pos.toInt
      val size = le32(b, p + 4)
      if (tag(b, p, "fmt ") && size >= 16 && pos + 8 + 16 <= b.length) {
        codec = le16(b, p + 8)
        channels = le16(b, p + 10)
        rate = le32(b, p + 12).toInt
        byteRate = le32(b, p + 16)
        bits = le16(b, p + 22)
      } else if (tag(b, p, "data")) {
        // the declared payload size: a streaming parse records it even
        // when the samples themselves are not buffered
        dataBytes = size
      }
      pos += 8 + size + (size & 1) // odd chunks carry an uncounted pad byte
    }
    if (codec < 0) return nulls()
    val r = new GenericInternalRow(7)
    r.update(0, UTF8String.fromString("wav"))
    r.update(1, codec)
    r.update(2, channels)
    r.update(3, rate)
    r.update(4, bits)
    if (dataBytes >= 0) {
      r.update(5, dataBytes)
      if (byteRate > 0) r.update(6, dataBytes * 1000L / byteRate)
    }
    r
  }
}

/** Video-container header decode (SURVEY.md §2 H6): a real ISO BMFF
  * (MP4/MOV) box walk — top-level boxes to `ftyp` (major brand) and
  * `moov`, then `moov`'s children to the `mvhd` movie header
  * (version 0 AND version 1 layouts: 32- vs 64-bit times) and the
  * `trak` count. Handles 64-bit largesize (size == 1) and
  * to-end-of-file (size == 0) boxes; anything truncated or
  * structurally broken yields a row of null fields, never an
  * exception. One codegen'd projection, header bytes only.
  */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"video_meta requires binary, got ${other.simpleString}")
  }

  override def dataType: DataType = VideoMeta.schema
  override def prettyName: String = "video_meta"

  override protected def nullSafeEval(input: Any): Any =
    VideoMeta.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.VideoMeta.compute($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VideoMeta {

  val schema: StructType = StructType(Seq(
    StructField("brand", StringType),
    StructField("timescale", LongType),
    StructField("duration", LongType),
    StructField("n_tracks", IntegerType),
    StructField("duration_ms", LongType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  private def nulls(): GenericInternalRow = new GenericInternalRow(5)

  def compute(b: Array[Byte]): GenericInternalRow = {
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var tracks = 0
    var sawMvhd = false

    // one box-list walk, shared by the top level and moov's children;
    // returns false on structural breakage
    def walk(start: Long, end: Long, depth: Int): Boolean = {
      var pos = start
      var guard = 0
      while (pos + 8 <= end && guard < 256) {
        guard += 1
        val p = pos.toInt
        var size = be32(b, p)
        var hdr = 8L
        if (size == 1) {
          if (pos + 16 > end) return false
          size = be64(b, p + 8)
          hdr = 16
        } else if (size == 0) size = end - pos
        if (size < hdr || pos + size > end) return false
        if (depth == 0 && tag(b, p + 4, "ftyp")) {
          if (pos + hdr + 4 > end) return false
          brand = new String(b, (pos + hdr).toInt, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
        } else if (depth == 0 && tag(b, p + 4, "moov")) {
          if (!walk(pos + hdr, pos + size, 1)) return false
        } else if (depth == 1 && tag(b, p + 4, "mvhd")) {
          if (pos + hdr + 4 > end) return false
          val ver = u8(b, (pos + hdr).toInt)
          if (ver == 0) {
            if (pos + hdr + 20 > end) return false
            timescale = be32(b, (pos + hdr + 12).toInt)
            duration = be32(b, (pos + hdr + 16).toInt)
          } else if (ver == 1) {
            if (pos + hdr + 32 > end) return false
            timescale = be32(b, (pos + hdr + 20).toInt)
            duration = be64(b, (pos + hdr + 24).toInt)
          } else return false
          sawMvhd = true
        } else if (depth == 1 && tag(b, p + 4, "trak")) {
          tracks += 1
        }
        pos += size
      }
      true
    }

    if (b.length < 8 || !walk(0, b.length, 0) || brand == null || !sawMvhd)
      return nulls()
    val r = new GenericInternalRow(5)
    r.update(0, UTF8String.fromString(brand))
    r.update(1, timescale)
    r.update(2, duration)
    r.update(3, tracks)
    if (timescale > 0) r.update(4, duration * 1000L / timescale)
    r
  }
}
