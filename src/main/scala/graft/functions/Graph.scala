package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics over plain edge relations — the web-graph
  * curation face of the corpus toolkit: PageRank-style authority
  * scores are a standard quality prior for crawl corpora (Page et al.
  * 1999; Common Crawl publishes harmonic-centrality/rank files used
  * exactly this way in pretraining pipelines).
  *
  * Everything here is DETERMINISTIC EXACT-INTEGER arithmetic in
  * micro-units (decimal(38,0)), like the house Gopher/per-mille and
  * sampling operators: double summation order varies per partitioning
  * on Spark, so a float PageRank is not reproducible run-to-run —
  * while a corpus quality prior must be (retries, incremental
  * refreshes, and the DuckDB oracle all demand bit-stable scores).
  * The quantization error is bounded by one micro-unit per edge per
  * round (floor division), orders of magnitude below any ranking
  * decision at unit = 1e12.
  */
object Graph {

  /** Exact integer division on non-negative decimal(38,0) columns:
    * (a - a mod b) / b is exactly representable, so the decimal divide
    * (which would otherwise round at scale 6) is exact and the cast
    * back to scale 0 lossless. DuckDB mirror: HUGEINT `//`.
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("decimal(38,0)")

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Fixed-iteration PageRank over a directed edge relation whose
    * first two columns are (src, dst) node ids — returns (id, rank)
    * with rank in micro-units of `unit` (Σ ranks ≈ unit, minus
    * deterministic floor loss and dangling-node leakage).
    *
    * Semantics: r₀(v) = unit/N;
    * r₊(v) = ((1000−d)·unit/1000)/N + (d · Σ_{u→v} r(u)/out(u))/1000
    * with d = `dampingPermille` and every division a floor — the
    * classic power-iteration update in exact per-mille integer
    * arithmetic. Duplicate edges collapse (simple-graph semantics),
    * self-loops participate normally, dangling nodes (no out-edges)
    * leak their mass — the MapReduce-standard simplification;
    * re-normalize downstream if Σ rank must stay constant.
    *
    * Scale shape per iteration: one src-keyed join of the edge
    * relation against the N-row rank relation and one dst-keyed sum —
    * two hash exchanges, both partial-aggregable (decimal sums), no
    * window, no driver state; the plan nests LINEARLY in iterations
    * (each round references the previous once), so fixed small
    * iteration counts (PageRank needs ~10–20) compose as a pure plan.
    * Edge/degree relations are re-scanned once per round — at corpus
    * scale persist them (or write the 2-column projection) before
    * iterating.
    */
  def pageRank(edges: DataFrame, iterations: Int,
      dampingPermille: Int = 850, unit: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      s"dampingPermille in [0,1000], got $dampingPermille")
    require(unit > 0, "unit must be positive")
    val Array(cs, cd) = edges.columns.take(2)
    val e = edges.select(col(cs).as("src"), col(cd).as("dst")).distinct()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(dec(count(lit(1))).as("od"))
    // N and the constant per-node base term: a 1-row relation,
    // broadcast into the update — never a driver-side collect
    val n = nodes.agg(dec(count(lit(1))).as("n"))
      .select(col("n"),
        idiv(idiv(dec(lit(unit)) * dec(lit(1000 - dampingPermille)),
          dec(lit(1000))), col("n")).as("base"),
        idiv(dec(lit(unit)), col("n")).as("r0"))
    var rank = nodes.crossJoin(broadcast(n))
      .select(col("id"), col("r0").as("rank"))
    for (_ <- 0 until iterations) {
      val contrib = e.join(rank, e("src") === rank("id"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("id"), idiv(col("rank"), col("od")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).cast("decimal(38,0)").as("agg"))
      rank = nodes.join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(n))
        .select(col("id"),
          (col("base") + idiv(dec(lit(dampingPermille)) *
            coalesce(col("agg"), dec(lit(0))), dec(lit(1000))))
            .cast("decimal(38,0)").as("rank"))
    }
    rank
  }

  /** Per-node degree report: (id, out_deg, in_deg) over the
    * simple-graph edge set — the sanity face next to [[pageRank]]
    * (hubs, dangling nodes, isolated-side checks), two count
    * aggregates and one full-outer merge.
    */
  def degrees(edges: DataFrame): DataFrame = {
    val Array(cs, cd) = edges.columns.take(2)
    val e = edges.select(col(cs).as("src"), col(cd).as("dst")).distinct()
    val out = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
