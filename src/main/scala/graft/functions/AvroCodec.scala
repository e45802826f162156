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
}
