package graft.connectors

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.functions._

/** Confluent-wire-format Avro (de)serialization — the analogue of the
  * reference's `PlainAvroSerializer`/`PlainAvroDeserializer`
  * (reference: pysrc/bytewax/connectors/kafka/serde.py:15-105) and the
  * `kafka.operators.(de)serialize_value` wrappers
  * (kafka/operators.py:198-434).
  *
  * Wire format: 1 magic byte (0) + 4-byte big-endian schema id + Avro
  * binary body. Uses the Avro core library (bundled with Spark); with
  * spark-avro on the cluster classpath, `from_avro`/`to_avro` are the
  * codegen'd alternative for schema-registry-less payloads.
  *
  * Runs per-partition: writer/reader instances are created once per
  * partition task (the expensive part), then stream the batch.
  */
object AvroSerde {

  private val MagicByte: Byte = 0

  /** Serialize GenericRecords produced from rows into wire-format bytes. */
  def serialize(schemaJson: String, schemaId: Int): (GenericRecord => Array[Byte]) = {
    // one writer per closure instantiation (per partition task)
    lazy val schema = new Schema.Parser().parse(schemaJson)
    lazy val writer = new GenericDatumWriter[GenericRecord](schema)
    (rec: GenericRecord) => {
      val out = new ByteArrayOutputStream()
      out.write(MagicByte)
      out.write(ByteBuffer.allocate(4).putInt(schemaId).array())
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      writer.write(rec, enc)
      enc.flush()
      out.toByteArray
    }
  }

  /** Deserialize wire-format bytes; returns (schemaId, record). */
  def deserialize(schemaJson: String): (Array[Byte] => (Int, GenericRecord)) = {
    lazy val schema = new Schema.Parser().parse(schemaJson)
    lazy val reader = new GenericDatumReader[GenericRecord](schema)
    (bytes: Array[Byte]) => {
      require(bytes.length > 5 && bytes(0) == MagicByte,
        s"not Confluent wire format (len=${bytes.length})")
      val id = ByteBuffer.wrap(bytes, 1, 4).getInt
      val dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
      (id, reader.read(null, dec))
    }
  }

  /** serialize_value: map a string-keyed DataFrame column of structs
    * isn't generically expressible without spark-avro, so the dataframe
    * surface takes explicit field extraction; see AvroSerdeSpec for the
    * record-level round trip used by Kafka pipelines.
    */
  def deserializeValueColumn[T: Encoder](df: DataFrame, schemaJson: String, valueCol: String)(
      toT: GenericRecord => T): org.apache.spark.sql.Dataset[T] = {
    df.select(col(valueCol)).as(org.apache.spark.sql.Encoders.BINARY)
      .mapPartitions { it =>
        val d = deserialize(schemaJson) // per-partition reader
        it.map(bytes => toT(d(bytes)._2))
      }(implicitly[Encoder[T]])
  }
}
