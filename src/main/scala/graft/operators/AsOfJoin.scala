package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Backward as-of join: for every left row, the most recent right row with
 * `right.ts <= left.ts` within the same key group (the time-series join
 * Spark lacks natively; DuckDB's ASOF JOIN is the battery oracle).
 *
 * Implementation is the sort-merge "union trick", not a per-key range
 * join: tag both sides, union, and take a running `last_value(ignore
 * nulls)` of the right payload over (keys) ordered by (ts, side) — right
 * rows sort before left rows at equal timestamps, so a left row sees a
 * same-instant right row. ONE shuffle + sort on the key columns, linear
 * scan — survives any scale where a key group's timeline fits a task
 * (salt the key with a time bucket if one key dominates).
 */
object AsOfJoin {

  /**
   * @param valueCols right-side columns to carry to the matched left rows
   *                  (each emitted as `asof_<name>`)
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // union-aligned projections: left keeps its columns, right carries the
    // payload in __v_* slots; side 0 = right so it precedes left at ties
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).filterNot(_ == leftTs)
          .map(c => col(c).as(s"__l_$c")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"__v_$c")): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side")) ++
        leftCols.filterNot(keys.contains).filterNot(_ == leftTs)
          .map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedCols = valueCols.map(c =>
      last(col(s"__v_$c"), ignoreNulls = true).over(w).as(s"asof_$c"))

    l.unionByName(r)
      .select((col("*") +: matchedCols): _*)
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++
          Seq(col("__ts").as(leftTs)) ++
          leftCols.filterNot(keys.contains).filterNot(_ == leftTs)
            .map(c => col(s"__l_$c").as(c)) ++
          valueCols.map(c => col(s"asof_$c")): _*)
  }
}
