package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY.md §2 H5/H6): media
  * payloads are opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs per-partition so a real codec drops in
  * without changing the plan shape.
  */
object Multimodal {

  /** H5: typed metadata over a binary payload — byte length, content
    * hash, chunk count, mime tag. Narrow, no shuffle.
    */
  def binaryMeta(docs: DataFrame, idCol: String, textCol: String,
                 chunkSize: Int = 256): DataFrame =
    docs
      .withColumn("payload", to_binary(col(textCol), lit("utf-8")))
      .select(col(idCol).as("media_id"),
        octet_length(col("payload")).as("bytes"),
        md5(col("payload")).as("content_md5"),
        expr(s"(octet_length(payload) + ${chunkSize - 1}) div $chunkSize")
          .as("n_chunks"),
        lit("text/plain").as("mime"))

  /** H6: frame sampling — every `stride`-th fixed-size chunk of the
    * payload (the Spark-side plumbing a video frame-sampler needs:
    * chunk index arithmetic, per-chunk hashing, no shuffle).
    */
  def frameSample(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int = 256, stride: Int = 4): DataFrame =
    GridFs.chunks(docs, idCol, textCol, chunkSize)
      .filter(col("n") % stride === 0)
      .select(col("files_id").as("media_id"),
        (col("n") / stride).cast("int").as("frame_idx"),
        md5(to_binary(col("data"), lit("utf-8"))).as("frame_md5"))

  /** H5b payload generator: REAL image container bytes — PNG signature
    * + IHDR, JPEG SOI + APP0(JFIF) + a variable-length COM segment +
    * SOF0, GIF89a + logical screen descriptor, or a RIFF/WEBP
    * container (VP8X extended with LE24 canvas dims on even ids,
    * VP8L lossless with the 14-bit packed dims on odd — two genuinely
    * different bit layouts) — with format and dimensions derived
    * deterministically from the document id. The
    * JPEG COM payload length varies per row, so the SOF frame header
    * sits at a DIFFERENT offset in every JPEG payload: the marker walk
    * in [[graft.functions.ImageDims]] is load-bearing, not a fixed
    * slice. Every 13th payload gets a leading zero byte (signature
    * corruption), exercising the unrecognized path. Built as a hex
    * string folded through one `unhex` — all codegen, no UDF.
    */
  def imagePayload(idCol: Column): Column = {
    val id = idCol.cast("long")
    val w = (id % 2048) + 16                       // 16..2063: fits 2 bytes
    val h = (id * 3 % 2048) + 16
    val pngBd = element_at(
      array(lit(1), lit(2), lit(4), lit(8), lit(16)), (id % 5).cast("int") + 1)
    val gifBits = (id % 8).cast("int") + 1         // 1..8 color resolution
    val comLen = (id % 9).cast("int")              // 0..8 COM payload bytes

    def hex4be(c: Column) = lpad(hex(c), 8, "0")
    def hex2be(c: Column) = lpad(hex(c), 4, "0")
    def hex1(c: Column) = lpad(hex(c), 2, "0")

    val png = concat(
      lit("89504E470D0A1A0A"),                     // signature
      lit("0000000D"), lit("49484452"),            // IHDR length + type
      hex4be(w), hex4be(h), hex1(pngBd),
      lit("06000000"),                             // color/compress/filter/interlace
      lit("DEADBEEF"))                             // CRC (unchecked by readers)
    val jpeg = concat(
      lit("FFD8"),                                 // SOI
      lit("FFE000104A46494600010100004800480000"), // APP0 JFIF, len 16
      lit("FFFE"), hex2be(comLen + lit(2)),        // COM, self-inclusive len
      lit("4141414141414141").substr(lit(1), comLen * 2),
      lit("FFC00011"), lit("08"),                  // SOF0 len 17, precision 8
      hex2be(h), hex2be(w),
      lit("03012200021101031101"),                 // 3 components
      lit("FFDA"))                                 // SOS marker (walk never reaches it)
    val gif = concat(
      lit("474946383961"),                         // "GIF89a"
      hex1(w % 256), hex1(shiftright(w, 8)),       // LE16 width
      hex1(h % 256), hex1(shiftright(h, 8)),       // LE16 height
      hex1((gifBits - 1) * 17 + 128),              // packed: GCT + color res
      lit("0000"))                                 // bg index, aspect
    // integer byte extraction via floor-division: the operands are
    // ≤ 34M, exactly representable, so the double division is exact
    def le24(c: Column) = concat(hex1(c % 256),
      hex1(floor(c / 256).cast("long") % 256),
      hex1(floor(c / 65536).cast("long") % 256))
    val vp8x = concat(
      lit("52494646"), lit("16000000"), lit("57454250"), // RIFF 22 WEBP
      lit("56503858"), lit("0A000000"),                  // VP8X len 10
      lit("00"), lit("000000"),                          // flags + reserved
      le24(w - 1), le24(h - 1))
    val bits = (w - 1) + (h - 1) * lit(16384L)
    val vp8l = concat(
      lit("52494646"), lit("12000000"), lit("57454250"), // RIFF 18 WEBP
      lit("5650384C"), lit("05000000"),                  // VP8L len 5
      lit("2F"),                                         // lossless sig
      hex1(bits % 256), hex1(floor(bits / 256).cast("long") % 256),
      hex1(floor(bits / 65536).cast("long") % 256),
      hex1(floor(bits / 16777216).cast("long") % 256),
      lit("00"))                                         // RIFF odd-size pad
    val webp = when(id % 2 === 0, vp8x).otherwise(vp8l)
    val sel = when(id % 4 === 0, png)
      .when(id % 4 === 1, jpeg)
      .when(id % 4 === 2, gif)
      .otherwise(webp)
    unhex(when(id % 13 === 0, concat(lit("00"), sel)).otherwise(sel))
  }

  /** H5b: real image-header decode over binary payloads — media id →
    * (format, width, height, bit_depth), null fields where the bytes
    * don't parse. One codegen projection, zero shuffles.
    */
  def imageDims(docs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val parsed = GraftBridge.column(graft.functions.ImageDims(
      GraftBridge.expression(imagePayload(col(idCol)))))
    docs.select(col(idCol).as("media_id"), parsed.as("img"))
      .select(col("media_id"),
        col("img.format").as("format"),
        col("img.width").as("width"),
        col("img.height").as("height"),
        col("img.bit_depth").as("bit_depth"))
  }

  /** H6 payload generator: REAL RIFF/WAV container bytes — "RIFF"
    * size "WAVE", then a VARIABLE-length LIST chunk (0–8 bytes, odd
    * sizes exercising the RIFF pad rule) ahead of "fmt " and a
    * declared "data" chunk — parameters derived deterministically
    * from the document id, every 13th payload corrupted with a
    * leading zero byte. The LIST chunk shifts "fmt " to a different
    * offset per row, so [[graft.functions.AudioMeta]]'s chunk walk
    * is load-bearing, not a fixed slice. All codegen (hex/concat/
    * unhex), no UDF.
    */
  def audioPayload(idCol: Column): Column = {
    val id = idCol.cast("long")
    val codec = (id % 2).cast("int") * 2 + 1       // 1 = PCM, 3 = IEEE float
    val ch = (id % 2).cast("int") + 1              // 1..2
    val rate = (id % 8).cast("int") * 4000 + 8000  // 8000..36000
    val bits = ((id % 3).cast("int") + 1) * 8      // 8, 16, 24
    val blockAlign = (ch * bits).divide(lit(8)).cast("int")
    val byteRate = rate * blockAlign
    val dataBytes = ((id % 1000) + 1).cast("int") * blockAlign
    val listLen = (id % 9).cast("int")             // 0..8, odd → pad byte
    val listPad = listLen % 2

    def h1(c: Column) = lpad(hex(c), 2, "0")
    def le16(c: Column) = concat(h1(c % 256), h1(shiftright(c, 8) % 256))
    def le32(c: Column) = {
      val l = c.cast("long")
      concat(h1(l % 256), h1(shiftright(l, 8) % 256),
        h1(shiftright(l, 16) % 256), h1(shiftright(l, 24) % 256))
    }

    val riffSize = lit(4) + (lit(8) + listLen + listPad) + lit(8 + 16) +
      lit(8) + dataBytes
    val wav = concat(
      lit("52494646"), le32(riffSize), lit("57415645"),   // RIFF size WAVE
      lit("4C495354"), le32(listLen),                     // LIST, varying len
      repeat(lit("41"), 8).substr(lit(1), (listLen + listPad) * 2),
      lit("666D7420"), le32(lit(16)),                     // "fmt " len 16
      le16(codec), le16(ch), le32(rate), le32(byteRate),
      le16(blockAlign), le16(bits),
      lit("64617461"), le32(dataBytes))                   // "data" declared size
    unhex(when(id % 13 === 0, concat(lit("00"), wav)).otherwise(wav))
  }

  /** H6: real audio-header decode — media id → (codec, channels,
    * sample rate, bit depth, data bytes, exact duration), null fields
    * where the bytes don't parse. One codegen projection, zero
    * shuffles.
    */
  def audioMeta(docs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val parsed = GraftBridge.column(graft.functions.AudioMeta(
      GraftBridge.expression(audioPayload(col(idCol)))))
    docs.select(col(idCol).as("media_id"), parsed.as("a"))
      .select(col("media_id"), col("a.format").as("format"),
        col("a.codec").as("codec"), col("a.channels").as("channels"),
        col("a.sample_rate").as("sample_rate"),
        col("a.bit_depth").as("bit_depth"),
        col("a.data_bytes").as("data_bytes"),
        col("a.duration_ms").as("duration_ms"))
  }

  /** H6 payload generator: REAL ISO BMFF (MP4/MOV) boxes — `ftyp`
    * with a rotating major brand, then `moov` holding a
    * VARIABLE-length `free` box (shifts `mvhd` per row — the box
    * walk is load-bearing), an `mvhd` alternating between version 0
    * (32-bit) and version 1 (64-bit) layouts, and 1–3 empty `trak`
    * boxes. Every 13th payload corrupted with a leading zero byte.
    */
  def videoPayload(idCol: Column): Column = {
    val id = idCol.cast("long")
    val brand = element_at(
      array(lit("69736F6D"), lit("6D703432"), lit("71742020")), // isom/mp42/"qt  "
      (id % 3).cast("int") + 1)
    val ver = (id % 2).cast("int")
    val timescale = (id % 10).cast("int") * 100 + 600
    val duration = ((id % 100000) + 1000).cast("int")
    val tracks = (id % 3).cast("int") + 1
    val freeLen = (id % 9).cast("int")

    def h1(c: Column) = lpad(hex(c), 2, "0")
    def be32(c: Column) = lpad(hex(c.cast("long")), 8, "0")
    def be64(c: Column) = lpad(hex(c.cast("long")), 16, "0")

    val ftyp = concat(be32(lit(16)), lit("66747970"), brand, lit("00000000"))
    val free = concat(be32(freeLen + lit(8)), lit("66726565"),
      repeat(lit("41"), 8).substr(lit(1), freeLen * 2))
    val mvhd = when(ver === 0, concat(
        be32(lit(28)), lit("6D766864"), lit("00000000"),
        be32(lit(0)), be32(lit(0)), be32(timescale), be32(duration)))
      .otherwise(concat(
        be32(lit(40)), lit("6D766864"), lit("01000000"),
        be64(lit(0)), be64(lit(0)), be32(timescale), be64(duration)))
    val trakOne = "000000087472616B"
    val traks = element_at(
      array(lit(trakOne), lit(trakOne * 2), lit(trakOne * 3)), tracks)
    val mvhdSize = when(ver === 0, lit(28)).otherwise(lit(40))
    val moovSize = lit(8) + (freeLen + lit(8)) + mvhdSize + tracks * 8
    val mp4 = concat(ftyp, be32(moovSize), lit("6D6F6F76"), free, mvhd, traks)
    unhex(when(id % 13 === 0, concat(lit("00"), mp4)).otherwise(mp4))
  }

  /** H6: real video-header decode — media id → (major brand,
    * timescale, duration, track count, exact duration_ms), null
    * fields where the bytes don't parse. One codegen projection,
    * zero shuffles.
    */
  def videoMeta(docs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val parsed = GraftBridge.column(graft.functions.VideoMeta(
      GraftBridge.expression(videoPayload(col(idCol)))))
    docs.select(col(idCol).as("media_id"), parsed.as("v"))
      .select(col("media_id"), col("v.brand").as("brand"),
        col("v.timescale").as("timescale"), col("v.duration").as("duration"),
        col("v.n_tracks").as("n_tracks"),
        col("v.duration_ms").as("duration_ms"))
  }

  final case class MediaFeature(mediaId: Long, bytes: Int, feature: Array[Float])

  /** Decode + feature-extract plumbing: runs a decoder per partition
    * over the raw bytes. The real codec (image/audio libs) is not in
    * this environment, so the decoder is STUBBED with a deterministic
    * fake (byte histogram moments); the Spark side — binary column in,
    * per-partition batching, typed `Dataset[MediaFeature]` out — is
    * the production shape. Test-covered in MultimodalSpec.
    */
  def decodeFeatures(s: SparkSession, docs: DataFrame, idCol: String,
                     textCol: String): Dataset[MediaFeature] = {
    val rows = docs.select(col(idCol).cast("long").as("id"),
      to_binary(col(textCol), lit("utf-8")).as("payload"))
    implicit val enc = Encoders.product[MediaFeature]
    rows.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        // STUB decoder: a real implementation would hand `bytes` to a
        // codec here; the fake emits deterministic byte-moment features
        it.map { case (id, bytes) =>
          var s1 = 0L; var s2 = 0L
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            s1 += b; s2 += b.toLong * b
            i += 1
          }
          val n = math.max(bytes.length, 1)
          MediaFeature(id, bytes.length,
            Array((s1.toDouble / n).toFloat, (s2.toDouble / n).toFloat))
        }
      }
  }
}
