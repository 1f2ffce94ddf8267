package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * As-of join: for every left row, attach the most recent right row with
 * right.ts <= left.ts within the same key — the point-in-time lookup
 * (trades->quotes, events->snapshots) that Spark has no built-in operator
 * for. Composed from a tagged union + one running-last window:
 *
 *   union(left, right) -> window(partition key, order (ts, side)) ->
 *   last_value(right payload, ignoreNulls) -> keep left rows
 *
 * Scale: ONE shuffle on the key and one sort — the same cost profile as a
 * sort-merge join, with no range-explosion (a naive
 * `left.ts >= right.ts` range join would be O(|L|x|R|) per key). Ties
 * (left.ts == right.ts) take the right row: "at or before" semantics,
 * matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` used as the oracle.
 */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its `valueCols` are attached)
    * @param keyCol    equi-key column name (both sides)
    * @param tsCol     event-time column name (both sides, same type)
    * @param valueCols right-side columns to carry (renamed as given) */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side 0 = right sorts before side 1 = left at equal ts -> inclusive match
    val l = left.withColumn("__side", lit(1))
    val r = right.withColumn("__side", lit(0))
    val rVals = valueCols.map { case (src, dst) => col(src).as(s"__r_$dst") }
    val lNulls = valueCols.map { case (_, dst) => lit(null).as(s"__r_$dst") }
    val unioned = l.select(
      (leftCols.map(col) :+ col("__side")) ++ lNulls: _*)
      .unionByName(r.select(
        (leftCols.map(c => if (c == keyCol || c == tsCol) col(c) else lit(null).as(c)) :+
          col("__side")) ++ rVals: _*))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(unioned) { case (df, (_, dst)) =>
      df.withColumn(s"__f_$dst", last(col(s"__r_$dst"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map { case (_, dst) => col(s"__f_$dst").as(dst) }: _*)
  }
}
