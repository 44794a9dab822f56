package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single latest right row with
  * the same key at-or-before the left row's event time. Spark has no
  * primitive for this; the naive spellings are a per-key range join
  * (plans as broadcast-nested-loop, O(|L| x |R|) per key) or a
  * windowed subquery per row. The scale-safe form implemented here:
  * tag and union both sides, shuffle ONCE on the key, sort each key's
  * partition by (ts, side) and carry the last-seen right id forward
  * with last_value(ignore nulls) — O((|L|+|R|) log) in one exchange.
  *
  * Ties: at equal timestamps the right side sorts first (side 0 < 1),
  * giving >= ("at-or-before") semantics; if several right rows share
  * (key, ts) the LARGEST right id wins — the window orders asof_rid
  * ascending and last() takes the final one — so the result is
  * deterministic whenever the right id column is unique.
  */
object AsofJoin {

  /** left(keyCol, tsCol, leftIdCol) x right(keyCol, tsCol, rightIdCol)
    * -> (leftId, key, asofRightId nullable). Both id columns must be
    * LONG (the absent side is padded with a typed null).
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, leftIdCol: String, rightIdCol: String)
      : DataFrame = {
    // as-of is undefined without an event time: a null-ts right row
    // would sort NULLS FIRST and match every left row as "earliest";
    // drop null-ts rows from both sides instead (left rows with null
    // ts are likewise excluded from the output)
    val left0 = left.filter(col(tsCol).isNotNull)
    val right0 = right.filter(col(tsCol).isNotNull)
    val l = left0.select(col(keyCol).as("asof_k"), col(tsCol).as("asof_ts"),
      lit(null).cast("long").as("asof_rid"),
      col(leftIdCol).as("asof_lid"), lit(1).as("asof_side"))
    val r = right0.select(col(keyCol).as("asof_k"), col(tsCol).as("asof_ts"),
      col(rightIdCol).as("asof_rid"),
      lit(null).cast("long").as("asof_lid"), lit(0).as("asof_side"))
    val w = Window.partitionBy(col("asof_k"))
      .orderBy(col("asof_ts").asc, col("asof_side").asc,
        col("asof_rid").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("asof_match",
        last(col("asof_rid"), ignoreNulls = true).over(w))
      .filter(col("asof_lid").isNotNull)
      .select(col("asof_lid").as(leftIdCol), col("asof_k").as(keyCol),
        col("asof_match").as("asof_" + rightIdCol))
  }
}
