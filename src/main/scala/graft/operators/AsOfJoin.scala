package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the most recent
  * right-side values at or before the left row's time, per key — the
  * canonical tick-to-bar alignment operator in market data (the reference
  * approximates it with its last-20-rows refresh frame,
  * `pipeline/warehouse.py:170-176`; SURVEY.md §2.3 notes the engine gets
  * as-of capability via the window-lag pattern).
  *
  * Implementation is the scalable union-scan form, not a range join:
  * tag left/right rows, union, ONE hash shuffle on the key, sort each
  * partition by (time, tag), and carry right values forward with
  * `last(ignoreNulls)` over the running frame. Cost is a single
  * shuffle + sort over |L|+|R| — no per-row range probe, no broadcast
  * requirement, skew-bounded by the key's own cardinality. Right rows at
  * exactly the left timestamp are included (inclusive semantics, ties
  * broken right-before-left in the sort).
  */
object AsOfJoin {

  /** @param key       equi-join key columns (present in both sides)
    * @param leftTime  left event-time column name
    * @param rightTime right event-time column name
    * @param valueCols right-side columns to carry onto left rows (null
    *                  when no right row precedes the left row)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTime: String, rightTime: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(key.contains)
    val t = "_asof_t"
    val tag = "_asof_is_left"
    // value columns ride under collision-proof temp names (trades.px vs
    // quotes.px is the natural shape); on output a value column whose
    // name already exists on the left surfaces as "<name>_asof"
    val v = "_asof_vals"
    // suffix until free so chained as-of joins (px -> px_asof -> px_asof_asof)
    // never emit duplicate names
    val outName = valueCols.map { c =>
      var name = c
      while (left.columns.contains(name)) name += "_asof"
      name
    }
    // all value columns travel as ONE struct: last(ignoreNulls) then
    // selects the most recent right ROW atomically — a null FIELD on that
    // row stays null (matching ASOF semantics) instead of being skipped
    // in favor of an older row's value, and fields can never mix rows
    val valStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c).copy(name = c)))
    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(tag, lit(1))
      .select(key.map(col) ++ Seq(col(t), col(tag)) ++ leftCols.map(col) :+
        lit(null).cast(valStructType).as(v): _*)
    val r = right
      .withColumn(t, col(rightTime))
      .withColumn(tag, lit(0))
      .select(key.map(col) ++ Seq(col(t), col(tag)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col): _*).as(v): _*)
    // the value struct itself is the final sort key: right rows sharing
    // an exact (key, time) would otherwise carry whichever row happened
    // to sort last (partitioning-dependent). Ordering by the orderable
    // struct makes the carried row the struct-max — deterministic across
    // runs and engines. Left rows all have a null struct there, so their
    // relative order is unaffected.
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(t).asc, col(tag).asc, col(v).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(
        (key.map(col) ++ Seq(col(t), col(tag)) ++ leftCols.map(col) :+
          last(col(v), ignoreNulls = true).over(w).as(v)): _*)
    // leftTime rides along inside leftCols; drop the helper columns and
    // restore the original left column order
    carried.where(col(tag) === 1)
      .select(left.columns.map(col) ++
        valueCols.zip(outName).map { case (c, o) => col(s"$v.$c").as(o) }: _*)
  }
}
