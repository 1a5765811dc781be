package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the single right row with the
  * largest right-time ≤ left-time for the same key — the point-in-time
  * primitive training pipelines need (feature snapshots without leakage).
  * Spark has no built-in as-of join; the scalable shape is NOT a range
  * join but union + one window pass:
  *
  *   tag sides → union → window `last(right_struct, ignoreNulls)` ordered
  *   by (time, side) per key → keep left rows.
  *
  * ONE shuffle on the key, linear in |L|+|R|, no per-row range probing —
  * the same trade pandas' merge_asof and DuckDB's ASOF JOIN make, executed
  * as a Spark window. Right rows must be unique per (key, time); ties on
  * equal time resolve to the right row (at-or-before is inclusive).
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val l = left.select(
      col(leftKey).cast("long").as("__k"),
      col(leftTime).as("__t"),
      lit(1).as("__side"),
      struct(lCols.map(col): _*).as("__l"),
      lit(null).cast(right.select(struct(rCols.map(col): _*)).schema.head.dataType)
        .as("__r"))
    val r = right.select(
      col(rightKey).cast("long").as("__k"),
      col(rightTime).as("__t"),
      lit(0).as("__side"), // right sorts before left at equal time → inclusive
      lit(null).cast(left.select(struct(lCols.map(col): _*)).schema.head.dataType)
        .as("__l"),
      struct(rCols.map(col): _*).as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val lOut = lCols.map(c => col(s"__l.$c").as(c))
    val rOut = rCols.map(c => col(s"__match.$c").as(c))
    picked.select(lOut ++ rOut: _*)
  }
}
