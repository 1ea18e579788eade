package graft.connectors

import org.apache.avro.generic.GenericRecord
import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** The reference's Kafka *operator* layer (reference
  * pysrc/bytewax/connectors/kafka/operators.py) on the Spark surface:
  *
  *  - `input` → ok/err split streams (operators.py:60-70, 89-151):
  *    KafkaOpOut(oks, errs). Spark's kafka source has no per-row error
  *    records (broker/protocol errors fail the task and retry, they do
  *    not surface as rows), so source-level `errs` is empty by
  *    construction — the per-row error stream that matters in practice
  *    is deserialization, below.
  *  - `deserialize` → ok/err split (operators.py:198-434): per-record
  *    try/catch around key+value deserializers; an error routes the
  *    ORIGINAL message (with error kind + reason) to `errs`, mirroring
  *    `KafkaError(ConfluentKafkaError._KEY/_VALUE_DESERIALIZATION, msg)`.
  *  - `serialize` (operators.py:330-434): errors raise, as in the
  *    reference.
  *
  * Schema-registry-shaped serde: [[SchemaRegistry]] is the client
  * interface (subject→latest id+schema, id→schema — the Confluent
  * client surface the reference drives through confluent_kafka);
  * [[InMemorySchemaRegistry]] is the embedded fake for tests and
  * offline runs. Wire format is Confluent (magic 0 + 4-byte id),
  * shared with [[AvroSerde]].
  */
object KafkaOps {

  /** KafkaOpOut (operators.py:49-57): the ok stream and the error
    * stream of a Kafka operator.
    */
  final case class KafkaOpOut[O, E](oks: O, errs: E)

  /** The raw bytes + coordinates of a consumed message (the fields of
    * KafkaSourceMessage the error path must preserve, kafka/__init__.py).
    */
  final case class KafkaRecord(
      key: Array[Byte], value: Array[Byte],
      topic: String, partition: Int, offset: Long)

  /** A deserialization failure: which stage failed, why, and the
    * untouched original record (⇔ KafkaError carrying `msg`).
    */
  final case class KafkaDeserError(stage: String, reason: String, orig: KafkaRecord)

  // ---- schema registry ----------------------------------------------

  /** Client surface of a Confluent-compatible schema registry. */
  trait SchemaRegistry extends Serializable {
    def schemaById(id: Int): Option[String]
    def latest(subject: String): Option[(Int, String)]
    def register(subject: String, schemaJson: String): Int
  }

  /** Embedded registry fake: deterministic id assignment, safe to ship
    * in closures. Stands in for a live registry in tests/offline runs;
    * a production client implements [[SchemaRegistry]] over HTTP with
    * the same three calls.
    */
  final class InMemorySchemaRegistry extends SchemaRegistry {
    private val byId = scala.collection.concurrent.TrieMap.empty[Int, String]
    private val bySubject = scala.collection.concurrent.TrieMap.empty[String, Int]
    private val nextId = new java.util.concurrent.atomic.AtomicInteger(1)

    def schemaById(id: Int): Option[String] = byId.get(id)
    def latest(subject: String): Option[(Int, String)] =
      bySubject.get(subject).map(id => (id, byId(id)))
    def register(subject: String, schemaJson: String): Int = {
      val id = nextId.getAndIncrement()
      byId.put(id, schemaJson)
      bySubject.put(subject, id)
      id
    }
  }

  /** Registry-driven serializer: resolves the subject's latest schema
    * once per instance, stamps its id into the wire bytes.
    */
  final class RegistryAvroSerializer(registry: SchemaRegistry, subject: String) extends Serializable {
    private lazy val (schemaId, schemaJson) = registry.latest(subject).getOrElse(
      throw new IllegalArgumentException(s"no schema registered for subject $subject"))
    private lazy val ser = AvroSerde.serialize(schemaJson, schemaId)
    def apply(rec: GenericRecord): Array[Byte] = ser(rec)
  }

  /** Registry-driven deserializer: reads the schema id from each
    * message's wire bytes and resolves it through the registry (cached
    * per id) — unknown ids and malformed bytes throw, which the
    * [[deserialize]] operator converts into error-stream rows.
    */
  final class RegistryAvroDeserializer(registry: SchemaRegistry) extends Serializable {
    @transient private lazy val readers =
      scala.collection.concurrent.TrieMap.empty[Int, Array[Byte] => (Int, GenericRecord)]
    def apply(bytes: Array[Byte]): GenericRecord = {
      require(bytes != null && bytes.length > 5 && bytes(0) == 0.toByte,
        s"not Confluent wire format")
      val id = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
      val schema = registry.schemaById(id).getOrElse(
        throw new IllegalArgumentException(s"schema id $id not in registry"))
      readers.getOrElseUpdate(id, AvroSerde.deserialize(schema))(bytes)._2
    }
  }

  // ---- operators ----------------------------------------------------

  /** kafka.operators.input (operators.py:89-151): consume + error
    * split. See the class doc for why `errs` is structurally empty on
    * Spark — returned anyway so pipelines port shape-for-shape.
    */
  def input(spark: SparkSession, brokers: Seq[String], topics: Seq[String],
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None): KafkaOpOut[DataFrame, DataFrame] = {
    val raw = Connectors.kafkaSource(spark, brokers, topics, startingOffsets, maxOffsetsPerTrigger)
    KafkaOpOut(raw, raw.limit(0))
  }

  /** kafka.operators.deserialize (operators.py:272-434): run key and
    * value deserializers per record; failures route the original record
    * to the error stream with the failing stage. Single pass per
    * partition, then a filter split (the tagged relation is lazily
    * recomputed per side — `.cache()` the input if the upstream scan is
    * expensive).
    *
    * `toOk` maps the deserialized (key, value) GenericRecords to the
    * caller's row type (GenericRecord itself is not encodable).
    */
  def deserialize[T](df: DataFrame,
      keyDeser: Array[Byte] => Any, valDeser: Array[Byte] => GenericRecord,
      toOk: (Any, GenericRecord, KafkaRecord) => T)(
      implicit okEnc: Encoder[T], taggedEnc: Encoder[(Option[T], Option[KafkaDeserError])],
      errEnc: Encoder[KafkaDeserError]): KafkaOpOut[Dataset[T], Dataset[KafkaDeserError]] = {
    val cols = Seq("key", "value", "topic", "partition", "offset")
    val slim = df.select(cols.map(col): _*)
    val tagged: Dataset[(Option[T], Option[KafkaDeserError])] = slim.mapPartitions { it =>
      it.map { r =>
        val rec = KafkaRecord(r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1),
          r.getAs[String](2), r.getAs[Int](3), r.getAs[Long](4))
        // key first, value second; first failure wins — reference
        // operators.py:300-327 ordering
        try {
          val k = keyDeser(rec.key)
          try {
            val v = valDeser(rec.value)
            (Some(toOk(k, v, rec)), None)
          } catch { case e: Exception =>
            (None, Some(KafkaDeserError("value_deserialization", e.toString, rec)))
          }
        } catch { case e: Exception =>
          (None, Some(KafkaDeserError("key_deserialization", e.toString, rec)))
        }
      }
    }
    KafkaOpOut(
      tagged.filter(_._1.isDefined).map(_._1.get),
      tagged.filter(_._2.isDefined).map(_._2.get))
  }

  /** kafka.operators.serialize (operators.py:398-434): serialize rows
    * to wire-format value bytes; errors raise (reference behavior).
    */
  def serializeValue[T](ds: Dataset[T], ser: RegistryAvroSerializer)(
      toRecord: T => GenericRecord)(
      implicit outEnc: Encoder[Array[Byte]]): Dataset[Array[Byte]] =
    ds.mapPartitions(it => it.map(t => ser(toRecord(t))))
}
