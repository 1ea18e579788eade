package graft.connectors

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Testing connectors — analogues of the reference's `TestingSource`
  * (list→stream with explicit batch boundaries, reference
  * testing.py:77-222) and `TestingSink` (testing.py:224-257).
  *
  * `TestingSource.EOF` ⇔ Trigger.AvailableNow draining; `PAUSE` ⇔
  * feeding batches incrementally via [[TestingSource.addBatch]];
  * `ABORT` ⇔ stopping the query and restarting from the checkpoint.
  */
object Testing {

  /** `numPartitions` spreads each fed batch over that many source
    * partitions — a 1-partition source (the MemoryStream default)
    * serializes the scan-side stage of the query onto one core, which
    * no production source (Kafka, files) does; benches feeding heavy
    * per-row pipelines should set it to the core count.
    */
  final class TestingSource[T: Encoder](spark: SparkSession, numPartitions: Option[Int]) {
    implicit private val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val stream = numPartitions match {
      case Some(n) => MemoryStream[T](spark, n)
      case None    => MemoryStream[T]
    }
    def addBatch(items: T*): Unit = stream.addData(items)
    def toDS(): Dataset[T] = stream.toDS()
  }

  def testingSource[T: Encoder](spark: SparkSession,
      numPartitions: Option[Int] = None): TestingSource[T] =
    new TestingSource[T](spark, numPartitions)
}
