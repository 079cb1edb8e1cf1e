package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J2/J3 — interval containment join with explode-on-overlap + residual
  * anti branch (reference: TableBorderProcessor.java:123-162 assigns content
  * chunks to every cell range that contains them; :84-92 keeps the
  * unassigned residue).
  *
  * Spark-first shape: a naive `events JOIN windows ON ts BETWEEN s AND e`
  * plans as BroadcastNestedLoopJoin — O(n·m) and a driver OOM once windows
  * outgrow the broadcast cap. Instead both sides are mapped onto a fixed
  * time GRID: a window explodes to the cells it covers, an event lands in
  * exactly one cell, and the join becomes a plain shuffled EQUI-join on
  * (key, cell) + an exact range filter. Each (event, window) assignment is
  * produced exactly once (the event's own cell), so no post-distinct.
  */
object IntervalJoin {

  /** @param events  rows with `keyCol`, `eventIdCol`, `tsCol` (micros)
    * @param windows rows with `keyCol`, `windowIdCol`, `startCol`/`endCol`
    *                (micros, [start, end) semantics)
    * @param cellMicros grid width — choose ≈ median window length so a
    *                   window explodes to O(1) cells
    * @return one row per (event, containing window)
    */
  def assign(events: DataFrame, windows: DataFrame, keyCol: String,
             tsCol: String, startCol: String, endCol: String,
             cellMicros: Long): DataFrame = {
    // integer `div`, never floor(double/double): a double quotient can round
    // up across the cell boundary for near-multiple micros values
    val wCells = windows.withColumn("__cell",
      explode(sequence(expr(s"$startCol div ${cellMicros}L"),
        expr(s"($endCol - 1) div ${cellMicros}L"))))
    val eCells = events.withColumn("__cell", expr(s"$tsCol div ${cellMicros}L"))
    eCells.join(wCells, Seq(keyCol, "__cell"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__cell")
  }

  /** The J3 residue: events contained by NO window (left anti on the same
    * grid join).
    */
  def residual(events: DataFrame, windows: DataFrame, keyCol: String,
               eventIdCol: String, tsCol: String, startCol: String,
               endCol: String, cellMicros: Long): DataFrame = {
    val hit = assign(events, windows, keyCol, tsCol, startCol, endCol, cellMicros)
      .select(col(keyCol), col(eventIdCol)).distinct()
    events.join(hit, Seq(keyCol, eventIdCol), "left_anti")
  }
}
