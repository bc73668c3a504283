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
    // The matched right ROW rides as one struct: last(struct, ignoreNulls)
    // skips only unmatched (left) rows — a matched right row whose payload
    // column is genuinely NULL still wins (ASOF semantics: the match's
    // NULL is returned, not an older row's value). A bare
    // last(payload, ignoreNulls) would skip it.
    val vStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    // union-aligned projections: left keeps its columns, right carries its
    // payload struct in __vr; side 0 = right so it precedes left at ties
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).filterNot(_ == leftTs)
          .map(c => col(c).as(s"__l_$c")) :+
        lit(null).cast(vStructType).as("__vr"): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side")) ++
        leftCols.filterNot(keys.contains).filterNot(_ == leftTs)
          .map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) :+
        struct(valueCols.map(c => col(c).as(c)): _*).as("__vr"): _*)

    // deterministic tie-break: among right rows at one (key, ts), the
    // struct-greatest row wins — stable across runs and partitionings
    // (DuckDB leaves this tie unspecified; we pin it)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__vr").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__m", last(col("__vr"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++
          Seq(col("__ts").as(leftTs)) ++
          leftCols.filterNot(keys.contains).filterNot(_ == leftTs)
            .map(c => col(s"__l_$c").as(c)) ++
          valueCols.map(c => col(s"__m.$c").as(s"asof_$c")): _*)
  }
}
