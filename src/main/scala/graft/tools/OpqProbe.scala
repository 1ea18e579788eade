package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{Opq, Pq, PqModel}

/** ADC estimate quality, plain PQ vs OPQ, on the real embeddings
  * table: MSE of the ADC dot estimate vs the exact dot against a
  * fixed query vector, plus an anisotropy readout (per-dim variance
  * spread) so the result is interpretable — OPQ's win is proportional
  * to how unbalanced the subspace variances are.
  *
  * args: [sfDir] [m] [ksub]
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val m = if (args.length > 1) args(1).toInt else 8
    val ksub = if (args.length > 2) args(2).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // mode "planted": anisotropic synthetic (variance 10 on the first
    // dim of each 8-dim group vs 0.3 elsewhere — the learned-embedding
    // shape OPQ exists for) instead of the isotropic testdata table
    val emb = (if (args.length > 3 && args(3) == "planted") {
      val rnd = new scala.util.Random(7)
      spark.createDataFrame((0 until 20000).map { i =>
        (i.toLong, Seq.tabulate(64)(d =>
          (if (d < 8) 10.0 else 0.3) * rnd.nextGaussian()))
      }).toDF("id", "v")
    } else graft.Tables.load(spark, dir, "embeddings")
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v")))
      .cache()
    val n = emb.count()

    val plain = PqModel.train(emb, $"id", $"v", m, ksub)
    val opq = Opq.train(emb, $"id", $"v", m, ksub)

    // per-subspace variance mass under the identity layout vs OPQ's
    val dim = opq.dim
    val sub = dim / m
    val vars = emb.select(posexplode($"v").as(Seq("d", "x")))
      .groupBy("d").agg(variance($"x").as("var"))
      .orderBy("d").as[(Int, Double)].collect().map(_._2)
    val idMass = (0 until m).map(s => vars.slice(s * sub, (s + 1) * sub).sum)
    println(f"dims=$dim m=$m ksub=$ksub n=$n")
    println(f"per-subspace variance (identity layout): min=${idMass.min}%.4f max=${idMass.max}%.4f ratio=${idMass.max / idMass.min}%.2f")

    val q = emb.filter($"id" === 0).select($"v").as[Seq[Double]].collect()(0)
    val qCol = typedLit(q).cast("array<double>")
    for ((label, scoreCol) <- Seq(
      "plain" -> Pq.adc_score(qCol, Pq.pq_encode($"v", plain), plain),
      "opq" -> Opq.adcScore(qCol, Opq.encode($"v", opq), opq))) {
      val t0 = System.nanoTime()
      val r = emb.select(
        aggregate(zip_with($"v", qCol, (a, b) => a * b), lit(0.0), (acc, x) => acc + x).as("dot"),
        scoreCol.as("est"))
        .select(avg(pow($"est" - $"dot", 2)).as("mse"),
          avg(abs($"est" - $"dot")).as("mae")).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-6s mse=${r.getDouble(0)}%.6f mae=${r.getDouble(1)}%.6f scan=${sec}%.2f s")
    }
    spark.stop()
  }
}
