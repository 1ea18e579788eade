package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the executed physical plan of named gate queries — the
  * explain-and-iterate loop as a tool. args: sfDir name [name...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      println(s"===== $name =====")
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
