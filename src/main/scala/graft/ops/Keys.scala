package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SERIAL surrogate-key allocation (SURVEY §7.4 risk 1): Spark has no
  * sequences, so new rows get keys either
  *   - deterministically: dense row_number over an explicit total
  *     order, offset past the current max (reproducible runs, needed
  *     when the oracle or an idempotent retry must see stable ids), or
  *   - cheaply: monotonically_increasing_id offset past the max
  *     (unique, gap-ridden, no sort — for ids that only need
  *     uniqueness).
  */
object Keys {

  /** Deterministic dense ids: maxExisting + row_number over `order`.
    * The window is global (single partition for the NEW rows only) —
    * appropriate for batch inserts, which are small relative to the
    * table; never run it over the full table. */
  def allocateDense(newRows: DataFrame, idCol: String, maxExisting: Long,
                    order: Seq[Column]): DataFrame =
    newRows.withColumn(idCol,
      lit(maxExisting) + row_number().over(Window.orderBy(order: _*)).cast("long"))

  /** Unique-only ids: maxExisting + monotonically_increasing_id + 1.
    * No shuffle, no sort; ids are sparse (partition-encoded). */
  def allocateUnique(newRows: DataFrame, idCol: String, maxExisting: Long): DataFrame =
    newRows.withColumn(idCol,
      lit(maxExisting) + monotonically_increasing_id() + 1L)

  /** Current max of an id column (0 for an empty table). */
  def currentMax(df: DataFrame, idCol: String): Long = {
    val r = df.agg(max(col(idCol))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}
