package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
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
