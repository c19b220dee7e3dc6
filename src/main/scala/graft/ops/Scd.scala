package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) kernels: turn a changelog into a
  * versioned history with validity intervals, and apply change batches
  * incrementally — the lakehouse-standard way to keep dimension
  * attributes queryable "as of" any point in time. The reference keeps
  * only current rows and overwrites in place (e.g. the statistics
  * cache, `portfolio.js:427-445`, and profile updates); SCD2 is the
  * scale-out generalization a 100 TB warehouse actually stores.
  *
  * Scale shape: everything is per-key window work — one shuffle on the
  * key, no self-joins, no collect. [[merge]] touches ONLY the keys
  * present in the batch (semi-join restriction); unaffected history
  * passes through untouched.
  */
object Scd {

  /** Changelog → type-2 history.
    *
    * Input: one row per observed change `(keys..., ts, ord, attrs...)`
    * — `ord` breaks same-timestamp ties deterministically (an event
    * id). Consecutive rows whose tracked attributes are unchanged are
    * collapsed into their first row (no-op changes create no version);
    * each surviving version is valid `[valid_from, valid_to)` (any orderable time type)
    * with NULL `valid_to` marking the current row. */
  def historize(changelog: DataFrame, keys: Seq[String], ts: String,
                ord: String, attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(ord))
    // a row opens a new version iff any tracked attr differs from the
    // previous change (or it is the key's first change). NULL-safe:
    // <=> treats NULL = NULL as equal.
    val unchanged = attrs.map(a => col(a) <=> lag(col(a), 1).over(w))
      .reduce(_ && _)
    val marked = changelog
      .withColumn("__first", lag(col(ts), 1).over(w).isNull)
      .withColumn("__open", col("__first") || !unchanged)
      .filter(col("__open"))
    val w2 = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(ord))
    marked
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys.map(col) ++ attrs.map(col) ++ Seq(
        col("valid_from"), col("valid_to"), col("is_current"))): _*)
  }

  /** Incrementally apply a change batch to an existing type-2 history.
    *
    * History rows for keys absent from the batch pass through
    * untouched (anti-join). For affected keys, the per-key changelog
    * is reconstructed from the history's version rows (each version is
    * a change at its `valid_from`), unioned with the batch, and
    * re-historized.
    *
    * EXACTNESS CONTRACT (property-tested): for APPEND-STYLE batches —
    * every batch row's `ts` strictly after all of its key's prior
    * changes — the result equals `historize` over the full original
    * changelog. That is the normal CDC feed shape. A LATE
    * (out-of-order) batch row still splices into consistent,
    * correctly-chained intervals, but against the RETAINED history:
    * changes that historize collapsed as no-ops are unrecoverable (a
    * late row landing before a collapsed change re-opens the earlier
    * value for the rest of the interval), and on a `ts` tie with an
    * existing version the existing version sorts first (its
    * reconstruction `ord` is `Long.MinValue`), regardless of original
    * event order. Feed batches from the raw changelog if exact late
    * replay matters. */
  def merge(history: DataFrame, batch: DataFrame, keys: Seq[String],
            ts: String, ord: String, attrs: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val batchKeys = batch.select(keyCols: _*).distinct()
    val untouched = history.join(batchKeys, keys, "left_anti")
    // Reconstruction ords: version rows predate any same-instant batch
    // change, and keep their RELATIVE order deterministically — a
    // per-key rank over (valid_from, valid_to NULLS LAST) rather than
    // one shared sentinel, which would leave same-valid_from versions
    // (a same-instant A→B pair) tied and ordered by physical row
    // order. valid_to NULLS LAST puts a zero-length [t, t) version
    // before its successor [t, null).
    val wVer = Window.partitionBy(keyCols: _*)
      .orderBy(col("valid_from").asc, col("valid_to").asc_nulls_last)
    val affectedLog = history.join(batchKeys, keys, "left_semi")
      .withColumn("__vord", lit(Long.MinValue) + row_number().over(wVer))
      .select((keys.map(col) ++ Seq(col("valid_from").as(ts),
        col("__vord").as(ord)) ++ attrs.map(col)): _*)
      .unionByName(batch.select(
        (keys.map(col) ++ Seq(col(ts), col(ord).cast("long").as(ord))
          ++ attrs.map(col)): _*))
    untouched.unionByName(historize(affectedLog, keys, ts, ord, attrs))
  }

  /** Point-in-time lookup over a type-2 history: the version of each
    * key valid at `at` (interval contains the instant). */
  def asOf(history: DataFrame, at: org.apache.spark.sql.Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
