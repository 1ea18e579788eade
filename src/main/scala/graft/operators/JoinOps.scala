package graft.operators

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Keyed N-way join with the reference's insert/emit mode matrix
  * (reference: pysrc/bytewax/operators/__init__.py:2072-2372;
  * `insert_mode` semantics :2123-2135, `emit_mode` :2138-2154,
  * `_JoinState`/`_JoinLogic` :2075-2190).
  *
  * Spark-first mapping (SURVEY §2.6):
  *  - emit_mode=final  → plain relational joins / group-aggregates —
  *    Catalyst picks broadcast vs shuffle, AQE handles skew.
  *  - emit_mode=complete / running → order-sensitive per-key state
  *    machines; batch form uses the secondary-sort engine in
  *    [[StatefulOps.statefulBatch]] (one shuffle + in-partition sort,
  *    streams per key — no group buffering).
  */
object JoinOps {

  sealed trait InsertMode
  case object InsertFirst extends InsertMode
  case object InsertLast extends InsertMode
  case object InsertProduct extends InsertMode

  /** Per-side inputs for the order-sensitive modes: each side is a
    * DataFrame with `keyCol`, `orderCol` (global arrival order) and one
    * value column.
    */
  final case class Side(df: DataFrame, valueCol: String)

  /** emit_mode="final", insert_mode="last"/"first": keep one value per
    * side per key, emit one row per key at EOF with nulls for absent
    * sides (reference `_LONE_NONE` null-fill, operators/__init__.py:2072,
    * 2095-2100 ⇔ full-outer null semantics).
    */
  def joinFinal(
      keyCol: String,
      insert: InsertMode,
      orderCol: String,
      sides: Side*): DataFrame = {
    require(insert != InsertProduct, "use joinProduct for insert_mode=product")
    val picked = sides.map { s =>
      val agg = insert match {
        case InsertFirst => min_by(col(s.valueCol), col(orderCol))
        case _           => max_by(col(s.valueCol), col(orderCol))
      }
      s.df.groupBy(col(keyCol)).agg(agg.as(s.valueCol))
    }
    picked.reduce((a, b) => a.join(b, Seq(keyCol), "full_outer"))
  }

  /** insert_mode="product", emit_mode="final": keep all values per side,
    * emit the cartesian product per key at EOF. Spark-first: a plain
    * inner equi-join per key IS the keyed cartesian product — shuffled
    * or broadcast by Catalyst, skew-split by AQE.
    */
  def joinProduct(keyCol: String, sides: Side*): DataFrame =
    sides.map(_.df).reduce((a, b) => a.join(b, Seq(keyCol), "inner"))

  /** emit_mode="complete": emit the product the moment every side has a
    * value, then clear state (reference `_JoinLogic.on_item`
    * :2164-2181). Order-sensitive: rows are processed per key in
    * `orderCol` order across all sides.
    *
    * Output: key, orderCol of the completing row, one column per side.
    */
  def joinComplete(
      spark: SparkSession,
      keyCol: String,
      orderCol: String,
      insert: InsertMode,
      sides: Side*): DataFrame =
    runStateMachine(spark, keyCol, orderCol, sides, emitRunning = false, insert)

  /** emit_mode="running": emit the current joined row on *every* arrival,
    * retain state forever (reference :2150-2154). No Spark builtin — this
    * is the per-key state machine the reference composes; batch form via
    * secondary sort.
    *
    * Output: key, orderCol of each arrival, one column per side (nulls
    * for sides not yet seen).
    */
  def joinRunning(
      spark: SparkSession,
      keyCol: String,
      orderCol: String,
      insert: InsertMode,
      sides: Side*): DataFrame =
    runStateMachine(spark, keyCol, orderCol, sides, emitRunning = true, insert)

  private def runStateMachine(
      spark: SparkSession,
      keyCol: String,
      orderCol: String,
      sides: Seq[Side],
      emitRunning: Boolean,
      insert: InsertMode): DataFrame = {
    import spark.implicits._
    val n = sides.size
    // Tag and union the sides: (key, order, sideIdx, value-as-string cols)
    val tagged = sides.zipWithIndex.map { case (s, i) =>
      s.df.select(
        col(keyCol).cast("string").as("key"),
        col(orderCol).cast("long").as("ord"),
        lit(i).as("side"),
        col(s.valueCol).cast("string").as("value"))
    }
    val all = tagged.reduce(_.unionByName(_))

    // per-side value lists (⇔ the reference's `_JoinState`, one List per
    // side); first/last keep one slot, product keeps all
    def astuples(state: Array[Vector[String]]): Iterator[Array[String]] = {
      // cartesian product, `null` filling empty sides (⇔ `_LONE_NONE`)
      state.foldLeft(Iterator.single(Vector.empty[String])) { (acc, side) =>
        val vals = if (side.isEmpty) Vector[String](null) else side
        acc.flatMap(prefix => vals.iterator.map(v => prefix :+ v))
      }.map(_.toArray)
    }

    val out = StatefulOps.statefulBatch[Array[Vector[String]], (String, Long, Array[String])](
      all,
      "key",
      Seq(col("ord")),
      init = _ => Array.fill(n)(Vector.empty[String]),
      onItem = (state, row) => {
        val side = row.getInt(row.fieldIndex("side"))
        val v = row.getString(row.fieldIndex("value"))
        val ord = row.getLong(row.fieldIndex("ord"))
        val key = row.getString(row.fieldIndex("key"))
        state(side) = insert match {
          case InsertFirst   => if (state(side).isEmpty) Vector(v) else state(side)
          case InsertLast    => Vector(v)
          case InsertProduct => state(side) :+ v
        }
        if (emitRunning) {
          (state, astuples(state).map(t => (key, ord, t)))
        } else if (state.forall(_.nonEmpty)) {
          val emitted = astuples(state).map(t => (key, ord, t)).toVector
          (Array.fill(n)(Vector.empty[String]), emitted.iterator) // clear after complete
        } else (state, Iterator.empty)
      })

    val cols = Seq(col("_1").as("key"), col("_2").as("ord")) ++
      (0 until n).map(i => col("_3").getItem(i).as(s"side$i"))
    out.toDF().select(cols: _*)
  }
}
