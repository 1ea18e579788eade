package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: run one gate query to parquet and dump its oracle SQL,
  * so the DuckDB comparison the driver performs can be reproduced
  * locally before a round closes. args: queryName sfDir outDir.
  */
object ValidateOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1); val out = args(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").parquet(s"$out/$name.parquet")
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/$name.sql"),
        sql.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
