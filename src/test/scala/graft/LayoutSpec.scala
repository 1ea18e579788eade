package graft

import org.apache.spark.sql.functions._
import graft.functions.Layout

/** Z-order layout: measure the actual file-skipping potential from the
  * written parquet footers — the min/max stats any pruning engine
  * (parquet reader row-group skip, Delta/Iceberg file skip) consults.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private val tsMin = 1704067200000000L
  private val tsMax = 1706745599999999L

  test("2-dim z-order layout skips files on a user filter where a time sort cannot") {
    import java.nio.file.Files
    val ev = Tables.load(spark, "/root/testdata/sf0.1", "events")
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"))

    val linDir = Files.createTempDirectory("graft-layout-lin").toFile.getPath
    val zDir = Files.createTempDirectory("graft-layout-z").toFile.getPath
    ev.repartitionByRange(16, $"ts_us").sortWithinPartitions($"ts_us")
      .write.mode("overwrite").parquet(linDir)
    Layout.zorderBy(ev, 16, 10,
        ($"user_id", 0L, 1999L), ($"ts_us", tsMin, tsMax))
      .write.mode("overwrite").parquet(zDir)

    // a file can be skipped for predicate user_id in [lo, hi] iff its
    // footer range is disjoint — count the files that must be read
    def filesThatMatch(dir: String, lo: Long, hi: Long): Int = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length === 16, s"expected 16 files in $dir")
      files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min($"user_id"), max($"user_id")).head()
        !(r.getLong(1) < lo || r.getLong(0) > hi)
      }
    }
    val linFiles = filesThatMatch(linDir, 100L, 149L)
    val zFiles = filesThatMatch(zDir, 100L, 149L)
    // time sort: every file spans all users — nothing skippable
    assert(linFiles === 16, s"lin=$linFiles")
    // z-order: the 50-user band lives in a compact z-range
    assert(zFiles * 2 <= linFiles, s"z=$zFiles lin=$linFiles")

    // and the layouts are row-identical under the filter
    val a = spark.read.parquet(linDir).filter($"user_id".between(100, 149))
      .select($"event_id").as[Long].collect().sorted.toSeq
    val b = spark.read.parquet(zDir).filter($"user_id".between(100, 149))
      .select($"event_id").as[Long].collect().sorted.toSeq
    assert(a === b && a.nonEmpty)
  }

  test("bucketed tables join with no exchange and no sort, rows identical to unbucketed") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-bucket").toFile.getPath
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"value")
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val sortMeta = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val oldBcast = spark.conf.get(bcast)
    spark.conf.set(bcast, "-1")
    // scan-side sort elimination needs the sorted-bucket metadata
    // opt-in (defaulted off in SPARK-28595 because it requires one
    // file per bucket — which bucketWrite guarantees)
    spark.conf.set(sortMeta, "true")
    try {
      Layout.bucketWrite(clicks, "graft_bkt_clicks", s"$base/clicks", 4, "user_id")
      Layout.bucketWrite(purchases, "graft_bkt_purchases", s"$base/purchases", 4, "user_id")
      val joined = spark.table("graft_bkt_clicks")
        .join(spark.table("graft_bkt_purchases"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(!plan.contains("+- Sort "), s"bucketed join re-sorted:\n$plan")
      // decimal sum: order-independent, unlike a double fold
      val got = joined.agg(count(lit(1)), sum($"value".cast("decimal(20,2)"))).head()
      val want = clicks.join(purchases, "user_id")
        .agg(count(lit(1)), sum($"value".cast("decimal(20,2)"))).head()
      assert(got === want)
      assert(got.getLong(0) > 0)
    } finally {
      spark.conf.set(bcast, oldBcast)
      spark.conf.unset(sortMeta)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_clicks")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_purchases")
    }
  }

  test("compactDir collapses a small-file dir to the byte-derived count, rows identical") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val docs = Tables.load(spark, sf0001, "documents")
    // simulate a micro-batch-sinked dir: 40 tiny files
    docs.repartition(40).write.parquet(s"$base/in")
    val p = new org.apache.hadoop.fs.Path(s"$base/in")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def files(dir: String) = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      var n = 0; var bytes = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) { n += 1; bytes += f.getLen }
      }
      (n, bytes)
    }
    val (nIn, bytesIn) = files(s"$base/in")
    assert(nIn === 40)
    val target = bytesIn / 4 + 1
    val nOut = Layout.compactDir(spark, s"$base/in", s"$base/out", target,
      sortCols = Seq($"doc_id"))
    assert(nOut === ((bytesIn + target - 1) / target).toInt)
    assert(files(s"$base/out")._1 === nOut)
    assert(nOut < nIn)
    // content survives byte-for-byte as rows
    val a = spark.read.parquet(s"$base/in").orderBy($"doc_id").collect()
    val b = spark.read.parquet(s"$base/out").orderBy($"doc_id").collect()
    assert(a.toSeq === b.toSeq)
    // the in-file sort is re-established (min/max pruning survives):
    // within each output file, doc_id is non-decreasing
    import org.apache.spark.sql.functions.{input_file_name, col => c}
    val perFile = spark.read.parquet(s"$base/out")
      .select(input_file_name().as("f"), c("doc_id"))
      .collect().groupBy(_.getString(0))
    perFile.values.foreach { rows =>
      val ids = rows.map(_.getLong(1)).toSeq
      assert(ids === ids.sorted)
    }
    // self-overwrite refused
    val e = intercept[IllegalArgumentException] {
      Layout.compactDir(spark, s"$base/in", s"$base/in", target)
    }
    assert(e.getMessage.contains("differ"))
  }

  test("z-value interleave round-trips bucketed dims (locality sanity)") {
    // neighbors in both dims land within a bounded z-distance window:
    // the curve maps each 1x1 bucket step to a bounded bit change
    val z00 = zOf(0, 0); val z11 = zOf(1, 1)
    assert(z00 === 0L && z11 === 3L) // interleaved low bits
    assert(zOf(2, 0) === 4L && zOf(0, 2) === 8L)
  }

  private def zOf(u: Long, t: Long): Long =
    Seq((u, t)).toDF("u", "t")
      .select(Layout.zvalue(10, $"u", $"t")).head().getLong(0)
}
