package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: match each point row to the interval rows of the
  * same key that contain it. Spark plans a naive `t BETWEEN start AND end`
  * predicate as a nested-loop per key; the scalable shape bins time:
  * intervals explode to one row per covered bin, points map to exactly one
  * bin, and the match becomes an equi-join on (key, bin) + a residual
  * BETWEEN filter. Each point meets a containing interval in exactly one
  * bin (its own), so no dedup pass is needed. `binWidth` trades explode
  * fan-out (long intervals) against join selectivity (busy bins): set it
  * near the typical interval length.
  */
object RangeJoin {

  def intervalJoin(points: DataFrame, intervals: DataFrame,
      pointKey: String, intervalKey: String,
      pointTime: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // temp bin column must not clobber caller columns
    var bin = "__bin"
    while (points.columns.contains(bin) || intervals.columns.contains(bin))
      bin += "_"
    val binned = intervals.withColumn(bin,
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    val p = points.withColumn(bin,
      floor(col(pointTime) / binWidth).cast("long"))
    p.join(binned,
        p(pointKey) === binned(intervalKey) &&
          p(bin) === binned(bin) &&
          col(pointTime).between(col(startCol), col(endCol)))
      .drop(bin)
  }
}
