package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Int8, Similarity}

/** Measures the int8-vs-float cosine error envelope on the test
  * embeddings — the evidence behind the semantic-verify prefilter
  * margin (a pair is only pre-rejected when its int8 cosine is below
  * threshold - margin, so margin must dominate max|err|).
  */
object Int8Err {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("v"),
        Int8.int8Codes(col("embedding")).as("c"))
    // sample pairs across the sim range: bucket-local (high sim) plus a
    // pseudo-random stripe (low sim)
    val a = emb.select(col("id").as("i"), col("v").as("vi"), col("c").as("ci"))
    val b = emb.select(col("id").as("j"), col("v").as("vj"), col("c").as("cj"))
    val pairs = a.join(b, pmod(col("i") * 31 + col("j"), lit(97)) < 3 && col("i") < col("j"))
      .withColumn("cf", Similarity.cosine(col("vi"), col("vj")))
      .withColumn("c8", Int8.int8Cosine(col("ci"), col("cj")))
      .withColumn("err", abs(col("cf") - col("c8")))
    val r = pairs.agg(count(lit(1)), max("err"), avg("err"),
      percentile_approx(col("err"), lit(0.999), lit(10000))).head()
    println(f"""{"tool":"int8_err","sf":"$sfDir","pairs":${r.getLong(0)},"max_err":${r.getDouble(1)}%.6f,"avg_err":${r.getDouble(2)}%.6f,"p999":${r.getDouble(3)}%.6f}""")
    // error conditional on high similarity (the band that matters for a
    // threshold prefilter)
    val hi = pairs.filter(col("cf") >= 0.5).agg(count(lit(1)), max("err")).head()
    println(f"""{"tool":"int8_err_hi","sf":"$sfDir","pairs":${hi.getLong(0)},"max_err":${if (hi.isNullAt(1)) -1.0 else hi.getDouble(1)}%.6f}""")
    spark.stop()
  }
}
