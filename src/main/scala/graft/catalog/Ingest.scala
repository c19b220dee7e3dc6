package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Schemas
import graft.ops.{Kernels, Validate}

/** Ingest boundary for the OHLCV fact table — the engine's version of
  * the reference's CSV load path (`SP500History.csv` → Stocks,
  * SURVEY §2 S2) plus the normalization and dimension upkeep it does
  * per insert:
  *   - `upper(symbol)` at the boundary (`stocks.js:46` et al. —
  *     the app upper-cases before every query);
  *   - StockSymbols dimension refresh (`stocks.js:137-142`,
  *     `schema.sql:87-89`: INSERT … SELECT DISTINCT ON CONFLICT DO
  *     NOTHING ≡ union+distinct);
  *   - constraint audit (PK uniqueness, CHECKs) as violating-row
  *     frames, not exceptions.
  */
object Ingest {

  /** Read an OHLCV CSV with the declared schema — never inferred. */
  def readOhlcvCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.stocks).option("header", "true").csv(path)
      .withColumn("symbol", upper(col("symbol")))

  /** Append new bars to an existing stocks frame with PK semantics:
    * existing (symbol, timestamp) rows win (ON CONFLICT DO NOTHING —
    * the reference's insert errors on PK conflict; do-nothing is the
    * idempotent batch form). Returns (table, refreshed symbol dim,
    * audit violations). */
  def appendBars(existing: DataFrame, fresh: DataFrame,
                 symbolDim: DataFrame): (DataFrame, DataFrame, Seq[(String, Long)]) = {
    val cleaned = fresh.withColumn("symbol", upper(col("symbol")))
    val merged = Kernels.insertIfAbsent(existing, cleaned, Seq("symbol", "timestamp"))
    val dim = symbolDim.union(cleaned.select(col("symbol"))).distinct()
    val audit = Validate.audit(Map(
      "pk_stocks" -> Validate.primaryKey(merged, Seq("symbol", "timestamp")),
      "check_volume_nonneg" -> Validate.check(merged,
        col("volume").isNull || col("volume") >= 0),
      "check_prices_positive" -> Validate.check(merged,
        col("close").isNull || col("close") > 0)))
    (merged, dim, audit)
  }
}
