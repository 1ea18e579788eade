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

  final class TestingSource[T: Encoder](spark: SparkSession) {
    implicit private val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val stream = MemoryStream[T]
    def addBatch(items: T*): Unit = stream.addData(items)
    def toDS(): Dataset[T] = stream.toDS()
  }

  def testingSource[T: Encoder](spark: SparkSession): TestingSource[T] =
    new TestingSource[T](spark)
}
