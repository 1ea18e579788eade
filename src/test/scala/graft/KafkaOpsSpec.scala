package graft

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import graft.connectors.KafkaOps
import graft.connectors.KafkaOps._

/** Kafka operator layer: registry-driven serde round trip and the
  * ok/err deserialization stream split (reference
  * kafka/operators.py:198-434), exercised on embedded fixtures — the
  * broker-level runtime path stays untestable here (no spark-sql-kafka
  * jar in the image; documented environment limit).
  */
class KafkaOpsSpec extends SparkSpec {
  import spark.implicits._

  private val valueSchemaJson =
    """{"type":"record","name":"Ev","fields":[
      |{"name":"what","type":"string"},{"name":"n","type":"long"}]}""".stripMargin

  private def mkRecord(schemaJson: String, what: String, n: Long): GenericRecord = {
    val r = new GenericData.Record(new Schema.Parser().parse(schemaJson))
    r.put("what", what); r.put("n", n)
    r
  }

  test("registry serializer/deserializer round-trip through assigned schema ids") {
    val reg = new InMemorySchemaRegistry
    val id = reg.register("ev-value", valueSchemaJson)
    val ser = new RegistryAvroSerializer(reg, "ev-value")
    val bytes = ser(mkRecord(valueSchemaJson, "click", 3L))
    assert(java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt === id)
    val de = new RegistryAvroDeserializer(reg)
    val back = de(bytes)
    assert(back.get("what").toString === "click")
    assert(back.get("n") === 3L)
  }

  test("deserializer resolves each message's own schema id (multi-schema stream)") {
    val reg = new InMemorySchemaRegistry
    val v2Json =
      """{"type":"record","name":"Ev2","fields":[
        |{"name":"what","type":"string"},{"name":"n","type":"long"}]}""".stripMargin
    reg.register("a-value", valueSchemaJson)
    reg.register("b-value", v2Json)
    val serA = new RegistryAvroSerializer(reg, "a-value")
    val serB = new RegistryAvroSerializer(reg, "b-value")
    val de = new RegistryAvroDeserializer(reg)
    assert(de(serA(mkRecord(valueSchemaJson, "x", 1L))).get("n") === 1L)
    assert(de(serB(mkRecord(v2Json, "y", 2L))).get("n") === 2L)
  }

  test("deserialize splits ok and error streams, errors keep the original record") {
    val reg = new InMemorySchemaRegistry
    reg.register("ev-value", valueSchemaJson)
    val ser = new RegistryAvroSerializer(reg, "ev-value")
    val de = new RegistryAvroDeserializer(reg)

    val good = ser(mkRecord(valueSchemaJson, "ok", 1L))
    val badWire = Array[Byte](9, 9, 9) // not wire format
    val unknownId = Array[Byte](0, 0, 0, 0, 99, 1, 1, 1) // id 99 unregistered
    val rows = Seq(
      ("k1".getBytes, good, "t", 0, 0L),
      ("k2".getBytes, badWire, "t", 0, 1L),
      ("k3".getBytes, unknownId, "t", 1, 2L)
    ).toDF("key", "value", "topic", "partition", "offset")

    val out = KafkaOps.deserialize[(String, String, Long)](rows,
      keyDeser = b => new String(b, "UTF-8"),
      valDeser = de.apply,
      toOk = (k, v, rec) => (k.asInstanceOf[String], v.get("what").toString, rec.offset))
    val oks = out.oks.collect().toSet
    assert(oks === Set(("k1", "ok", 0L)))
    val errs = out.errs.collect()
    assert(errs.length === 2)
    assert(errs.forall(_.stage === "value_deserialization"))
    assert(errs.map(_.orig.offset).toSet === Set(1L, 2L))
    // original bytes survive untouched for reprocessing
    assert(errs.find(_.orig.offset == 1L).get.orig.value.toSeq === badWire.toSeq)
  }

  test("key deserialization failure wins and is staged as key_deserialization") {
    val reg = new InMemorySchemaRegistry
    reg.register("ev-value", valueSchemaJson)
    val ser = new RegistryAvroSerializer(reg, "ev-value")
    val de = new RegistryAvroDeserializer(reg)
    val rows = Seq(("bad".getBytes, ser(mkRecord(valueSchemaJson, "v", 1L)), "t", 0, 5L))
      .toDF("key", "value", "topic", "partition", "offset")
    val out = KafkaOps.deserialize[(String, String, Long)](rows,
      keyDeser = _ => throw new IllegalArgumentException("key exploded"),
      valDeser = de.apply,
      toOk = (k, v, rec) => (k.asInstanceOf[String], v.get("what").toString, rec.offset))
    assert(out.oks.isEmpty)
    val err = out.errs.collect().head
    assert(err.stage === "key_deserialization")
    assert(err.reason.contains("key exploded"))
    assert(err.orig.offset === 5L)
  }

  test("deserialize ok/err split works on an unbounded stream") {
    val reg = new InMemorySchemaRegistry
    reg.register("ev-value", valueSchemaJson)
    val ser = new RegistryAvroSerializer(reg, "ev-value")
    val de = new RegistryAvroDeserializer(reg)
    val good = ser(mkRecord(valueSchemaJson, "ok", 1L))
    val src = graft.connectors.Testing
      .testingSource[(Array[Byte], Array[Byte], String, Int, Long)](spark)
    src.addBatch(
      ("k1".getBytes, good, "t", 0, 0L),
      ("k2".getBytes, Array[Byte](9, 9), "t", 0, 1L))
    val df = src.toDS().toDF("key", "value", "topic", "partition", "offset")
    val out = KafkaOps.deserialize[(String, String, Long)](df,
      keyDeser = b => new String(b, "UTF-8"),
      valDeser = de.apply,
      toOk = (k, v, rec) => (k.asInstanceOf[String], v.get("what").toString, rec.offset))
    val oks = graft.streaming.StreamingOps.runToMemory(out.oks, "kafka_oks")
      .as[(String, String, Long)].collect().toSet
    val errs = graft.streaming.StreamingOps.runToMemory(out.errs, "kafka_errs")
      .collect()
    assert(oks === Set(("k1", "ok", 0L)))
    assert(errs.length === 1)
  }

  test("serializeValue emits registry-stamped wire bytes") {
    val reg = new InMemorySchemaRegistry
    val id = reg.register("ev-value", valueSchemaJson)
    val ser = new RegistryAvroSerializer(reg, "ev-value")
    val ds = Seq(("a", 1L), ("b", 2L)).toDS()
    // local copy so the closure ships the schema string, not the spec
    val sj = valueSchemaJson
    val bytes = KafkaOps.serializeValue(ds, ser) { case (w, n) =>
      val r = new GenericData.Record(new Schema.Parser().parse(sj))
      r.put("what", w); r.put("n", n)
      r
    }.collect()
    assert(bytes.length === 2)
    assert(bytes.forall(b => b(0) == 0 && java.nio.ByteBuffer.wrap(b, 1, 4).getInt == id))
    val de = new RegistryAvroDeserializer(reg)
    assert(bytes.map(b => de(b).get("what").toString).toSet === Set("a", "b"))
  }
}
