package graft

import org.apache.spark.sql.functions._
import graft.functions.{Opq, Pq, PqModel}

class OpqSpec extends SparkSpec {
  import spark.implicits._

  // anisotropic corpus: variance concentrated in the first 4 of 16
  // dims — plain PQ (m=4, subdim=4) puts ALL the variance in subspace
  // 0; OPQ's eigenvalue allocation spreads it one direction per
  // subspace
  private def anisotropic(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v = Array.tabulate(16)(d =>
        (if (d < 4) 10.0 else 0.3) * rnd.nextGaussian())
      (i.toLong, v.toSeq)
    }.toDF("id", "v").select($"id", $"v".cast("array<double>").as("v"))
  }

  test("rotation is orthogonal and preserves inner products") {
    val df = anisotropic(512, 1)
    val m = Opq.train(df, $"id", $"v", m = 4, ksub = 16, sampleN = 512)
    val dim = m.dim
    // R·Rᵀ = I
    for (i <- 0 until dim; j <- 0 until dim) {
      var acc = 0.0
      for (c <- 0 until dim) acc += m.rotation(i * dim + c) * m.rotation(j * dim + c)
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(acc - expect) < 1e-9, s"RRᵀ[$i][$j] = $acc")
    }
    // dot(Rx, Ry) = dot(x, y)
    val rows = df.limit(4).select($"v").as[Seq[Double]].collect()
    val x = rows(0).toArray; val y = rows(1).toArray
    val rx = graft.functions.OpqImpl.matvec(m.rotation, x)
    val ry = graft.functions.OpqImpl.matvec(m.rotation, y)
    val dot = x.zip(y).map { case (a, b) => a * b }.sum
    val rdot = rx.zip(ry).map { case (a, b) => a * b }.sum
    assert(math.abs(dot - rdot) < 1e-9 * math.max(1.0, math.abs(dot)))
  }

  test("OPQ ADC beats plain PQ ADC on anisotropic data (MSE of the dot estimate)") {
    val df = anisotropic(2048, 2).cache()
    val plain = PqModel.train(df, $"id", $"v", m = 4, ksub = 16, sampleN = 2048)
    val opq = Opq.train(df, $"id", $"v", m = 4, ksub = 16, sampleN = 2048)
    // score every row's vector against a fixed query row's vector
    val q = df.filter($"id" === 0).select($"v").as[Seq[Double]].collect()(0)
    val qCol = typedLit(q).cast("array<double>")
    val est = df.select(
      aggregate(zip_with($"v", qCol, (a, b) => a * b), lit(0.0), (acc, x) => acc + x).as("dot"),
      Pq.adc_score(qCol, Pq.pq_encode($"v", plain), plain).as("pq"),
      Opq.adcScore(qCol, Opq.encode($"v", opq), opq).as("opq"))
      .select(avg(pow($"pq" - $"dot", 2)).as("mse_pq"),
        avg(pow($"opq" - $"dot", 2)).as("mse_opq"))
      .collect()(0)
    val (msePq, mseOpq) = (est.getDouble(0), est.getDouble(1))
    assert(mseOpq < msePq * 0.8,
      s"OPQ mse $mseOpq not < 0.8 × plain mse $msePq")
    df.unpersist()
  }

  test("parquet round-trip serves a bit-identical model") {
    val df = anisotropic(256, 3)
    val m = Opq.train(df, $"id", $"v", m = 4, ksub = 8, sampleN = 256)
    val path = java.nio.file.Files.createTempDirectory("opq").toString + "/model"
    Opq.toDF(m, spark).write.mode("overwrite").parquet(path)
    val back = Opq.fromDF(spark.read.parquet(path))
    assert(back.rotation.toSeq === m.rotation.toSeq)
    assert(back.pq.centroids.toSeq === m.pq.centroids.toSeq)
    assert(back.pq.m === m.pq.m && back.pq.ksub === m.pq.ksub && back.dim === m.dim)
    // served scores bit-identical
    val a = df.select(Opq.adcScore($"v", Opq.encode($"v", m), m)).as[Double].collect()
    val b = df.select(Opq.adcScore($"v", Opq.encode($"v", back), back)).as[Double].collect()
    assert(a.toSeq === b.toSeq)
  }

  test("opqTopK returns k neighbors per query, self excluded") {
    val df = anisotropic(300, 4)
    val model = Opq.train(df, $"id", $"v", m = 4, ksub = 16, sampleN = 300)
    val top = Opq.opqTopK(df, "id", "v", k = 3, model, targetBucket = 300)
    val byQ = top.groupBy($"qid").agg(count(lit(1)).as("n"),
      sum(when($"nid" === $"qid", 1).otherwise(0)).as("selfs"))
    assert(byQ.filter($"n" > 3).count() === 0)
    assert(byQ.filter($"selfs" > 0).count() === 0)
    assert(top.count() > 0)
  }
}
