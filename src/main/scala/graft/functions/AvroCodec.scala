package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.Row

/** Avro encode/decode surface (SURVEY.md §2 B5), mirroring the
  * reference's consumer `avro-schema-spec` + `avro-binary` options
  * (encoding/encoding.go:40-63, decoding/decoding.go:35-58) with the
  * Avro generic API (avro jar ships with Spark; the spark-avro
  * connector module does not, so this is a per-partition codec: the
  * schema is parsed once per partition, records stream through one
  * reused encoder — the same shape a connector uses internally).
  *
  * Supports flat record schemas of long/int/double/string/boolean
  * fields — the shapes route81's flat message envelopes produce.
  */
object AvroCodec {

  /** Encode rows to Avro (binary or JSON-textual per `binary`). */
  def encode(df: DataFrame, schemaJson: String, binary: Boolean): Dataset[Array[Byte]] = {
    val fields = df.schema.fieldNames
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val out = new ByteArrayOutputStream()
      var binEnc: org.apache.avro.io.BinaryEncoder = null
      rows.map { row =>
        val rec = new GenericData.Record(schema)
        fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f, if (row.isNullAt(i)) null else row.get(i))
        }
        out.reset()
        val enc =
          if (binary) {
            binEnc = EncoderFactory.get().binaryEncoder(out, binEnc)
            binEnc
          } else EncoderFactory.get().jsonEncoder(schema, out)
        writer.write(rec, enc)
        enc.flush()
        out.toByteArray
      }
    }(Encoders.BINARY)
  }

  /** Decode Avro payloads back to rows of `schemaJson`'s fields. */
  def decode(payloads: Dataset[Array[Byte]], schemaJson: String,
             binary: Boolean): DataFrame = {
    val spark = payloads.sparkSession
    val schema = new Schema.Parser().parse(schemaJson)
    val sparkSchema = org.apache.spark.sql.types.StructType(
      schema.getFields.toArray.map(_.asInstanceOf[Schema.Field]).map { f =>
        val dt = f.schema().getType match {
          case Schema.Type.LONG => org.apache.spark.sql.types.LongType
          case Schema.Type.INT => org.apache.spark.sql.types.IntegerType
          case Schema.Type.DOUBLE => org.apache.spark.sql.types.DoubleType
          case Schema.Type.BOOLEAN => org.apache.spark.sql.types.BooleanType
          case _ => org.apache.spark.sql.types.StringType
        }
        org.apache.spark.sql.types.StructField(f.name(), dt)
      })
    val rowEnc = Encoders.row(sparkSchema)
    payloads.mapPartitions { it =>
      val sch = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](sch)
      val names = sch.getFields.toArray.map(_.asInstanceOf[Schema.Field].name())
      it.map { bytes =>
        val dec =
          if (binary) DecoderFactory.get().binaryDecoder(bytes, null)
          else DecoderFactory.get().jsonDecoder(sch, new String(bytes, "UTF-8"))
        val rec = reader.read(null, dec)
        Row.fromSeq(names.toSeq.map { n =>
          rec.get(n) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case v => v
          }
        })
      }
    }(rowEnc)
  }

  /** B5b: the schema-registry WIRE FORMAT — Confluent's framing
    * convention for Avro on Kafka (magic byte 0x00 + big-endian
    * int32 schema id + the binary Avro payload), the seam the
    * reference leaves open (route81 takes an inline
    * `avro-schema-spec`, route81.go:107, and never frames for a
    * registry). A consumer pointed at registry-framed topics decodes
    * these messages as a config change: same codec, one 5-byte
    * header.
    */
  def encodeWire(df: DataFrame, schemaJson: String,
                 schemaId: Int): Dataset[Array[Byte]] = {
    val spark = df.sparkSession
    import spark.implicits._
    encode(df, schemaJson, binary = true).map { payload =>
      val framed = new Array[Byte](payload.length + 5)
      framed(0) = 0x00
      framed(1) = ((schemaId >> 24) & 0xff).toByte
      framed(2) = ((schemaId >> 16) & 0xff).toByte
      framed(3) = ((schemaId >> 8) & 0xff).toByte
      framed(4) = (schemaId & 0xff).toByte
      System.arraycopy(payload, 0, framed, 5, payload.length)
      framed
    }
  }

  /** Decode registry-framed messages: the magic byte and (when
    * `expectId` is set) the schema id are VALIDATED loudly — a wrong
    * id means the payload was written under a different schema and
    * silent misdecoding is the classic registry failure mode.
    */
  def decodeWire(payloads: Dataset[Array[Byte]], schemaJson: String,
                 expectId: Option[Int] = None): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val expected = expectId
    val stripped = payloads.map { bytes =>
      require(bytes.length >= 5 && bytes(0) == 0x00,
        s"not a registry-framed message (len=${bytes.length}, " +
          s"magic=${if (bytes.isEmpty) "∅" else bytes(0).toString})")
      val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
        ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
      expected.foreach(e => require(id == e,
        s"schema id mismatch: message carries $id, consumer expects $e"))
      java.util.Arrays.copyOfRange(bytes, 5, bytes.length)
    }
    decode(stripped, schemaJson, binary = true)
  }
}
