package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-prior) join — the canonical time-series operator Spark
  * lacks. Built by composition (the brief's preference order (a)): tag
  * and union both inputs, sort within each key by (time, side, tiebreak),
  * carry the right side's values forward with `last(_, ignoreNulls)` over
  * a running window, keep the left rows. One shuffle on the key — no
  * range-condition nested loop, no per-key collect; at 100 TB this is a
  * single sort-merge pass like any windowed aggregate.
  *
  * Ties are deterministic: right rows at the same timestamp sort before
  * left rows (an event at t sees an order at t), and among right rows the
  * larger `rightTiebreak` wins (later-sorted row is carried forward).
  */
object AsOfJoin {

  /** @param left       probe side (each row gets the latest right row at
    *                    or before its time)
    * @param right      reference side
    * @param leftKey/rightKey    equi key
    * @param leftTime/rightTime  ordering column (same comparable type)
    * @param rightTiebreak       deterministic winner among equal-time
    *                            right rows
    * @param carryCols  right columns to attach (null when no prior row)
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTiebreak: String,
      carryCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!carryCols.contains(leftTime) && !leftCols.intersect(carryCols).nonEmpty,
      "carry columns must not collide with left columns")

    val taggedLeft = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .select(Seq(col("__key"), col("__t"), col("__side"), col("__tie")) ++
        leftCols.map(col) ++ carryCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)

    val taggedRight = right
      .withColumn("__key", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(rightTiebreak).cast("long"))
      .select(Seq(col("__key"), col("__t"), col("__side"), col("__tie")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        carryCols.map(col): _*)

    val unioned = taggedLeft.unionByName(taggedRight)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carryCols.foldLeft(unioned) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ carryCols.map(col): _*)
  }
}
