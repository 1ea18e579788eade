package graft.queries

import org.apache.spark.sql._
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Ops

/** Multi-join analytic queries — the optimizer-facing workload: star
  * joins with broadcastable dims, selective pushed-down filters, top-N.
  * These exercise Catalyst join planning + AQE the way a reference
  * user's composed dataflow (input → key_on → join → fold → sort) would.
  */
object AnalyticQueries {

  private def d12(c: Column) = c.cast("decimal(12,2)")
  private def d6(c: Column) = c.cast("decimal(6,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q3-style: unshipped-order revenue for one segment, top 10
    "q3_topn" -> { (s, dir) =>
      import s.implicits._
      val cust = Tables.load(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val ord = Tables.load(s, dir, "orders")
        .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      val li = Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" > lit("1998-01-01").cast("timestamp"))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(CoreQueries.decDouble(sum(d12($"l_extendedprice") * d6(lit(1) - $"l_discount"))).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey".asc)
        .limit(10)
        .select($"l_orderkey",
          unix_millis($"o_orderdate".cast("timestamp")).as("o_date_ms"), $"revenue")
    },

    // TPC-H Q5-style: revenue per nation for one region (3 broadcast dims)
    "q5_region_revenue" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region").filter($"r_name" === "ASIA")
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy($"n_name")
        .agg(CoreQueries.decDouble(sum(d12($"l_extendedprice") * d6(lit(1) - $"l_discount"))).as("revenue"))
    },

    // composite pipeline: branch + window + join in one flow — orders
    // volume vs high-value volume per month
    "q_pipeline_monthly" -> { (s, dir) =>
      import s.implicits._
      val ord = Tables.load(s, dir, "orders")
      val (hi, lo) = Ops.branch(ord, $"o_totalprice" >= 150000)
      val month = (c: Column) => date_trunc("month", c)
      val hiAgg = hi.groupBy(month($"o_orderdate").as("m")).agg(count(lit(1)).as("hi_n"))
      val loAgg = lo.groupBy(month($"o_orderdate").as("m")).agg(count(lit(1)).as("lo_n"))
      hiAgg.join(loAgg, Seq("m"), "full_outer")
        .select(unix_millis($"m").as("month_ms"),
          coalesce($"hi_n", lit(0L)).as("hi_n"),
          coalesce($"lo_n", lit(0L)).as("lo_n"))
    })

  val oracle: Map[String, String] = Map(
    "q3_topn" ->
      """SELECT l_orderkey, epoch_ms(o_orderdate) AS o_date_ms,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(6,2))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(6,2))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q_pipeline_monthly" ->
      """WITH hi AS (SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS hi_n
        |            FROM orders WHERE o_totalprice >= 150000 GROUP BY 1),
        |     lo AS (SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS lo_n
        |            FROM orders WHERE NOT (o_totalprice >= 150000) GROUP BY 1)
        |SELECT epoch_ms(COALESCE(hi.m, lo.m)) AS month_ms,
        |  COALESCE(hi_n, 0) AS hi_n, COALESCE(lo_n, 0) AS lo_n
        |FROM hi FULL OUTER JOIN lo ON hi.m = lo.m""".stripMargin)
}
