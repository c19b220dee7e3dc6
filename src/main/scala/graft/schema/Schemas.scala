package graft.schema

import org.apache.spark.sql.types._

/** Declared StructTypes for the reference's 11-table model — the
  * engine never infers domain schemas (SURVEY §1.3). Types follow the
  * §1.2 mapping exactly: DECIMAL for money, DOUBLE for statistics,
  * LongType for SERIAL surrogate keys (allocation via row_number /
  * monotonically_increasing_id at the ingest boundary — Spark has no
  * sequences).
  *
  * Source-of-truth citations are the reference DDL
  * (`sql/schema.sql`, lines noted per table).
  */
object Schemas {

  /** Stocks(symbol, timestamp, OHLCV) — schema.sql:1-10, composite
    * PK (symbol, timestamp) becomes the storage layout (Layout). */
  val stocks: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("timestamp", DateType, nullable = false),
    StructField("open", DecimalType(10, 2)),
    StructField("high", DecimalType(10, 2)),
    StructField("low", DecimalType(10, 2)),
    StructField("close", DecimalType(10, 2)),
    StructField("volume", LongType)))

  /** users — schema.sql:12-17 (unique email enforced by Validate). */
  val users: StructType = StructType(Seq(
    StructField("userid", LongType, nullable = false),
    StructField("fullname", StringType),
    StructField("email", StringType, nullable = false),
    StructField("passwordhash", StringType),
    StructField("created_at", TimestampType)))

  /** friend(userid1 < userid2) — schema.sql:19-24, normalized edge. */
  val friend: StructType = StructType(Seq(
    StructField("userid1", LongType, nullable = false),
    StructField("userid2", LongType, nullable = false),
    StructField("created_at", TimestampType)))

  /** request — schema.sql:26-32, status ∈ PENDING|ACCEPTED|REJECTED. */
  val request: StructType = StructType(Seq(
    StructField("requestid", LongType, nullable = false),
    StructField("fromuserid", LongType, nullable = false),
    StructField("touserid", LongType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("created_at", TimestampType)))

  /** stocklist — schema.sql:34-39. */
  val stocklist: StructType = StructType(Seq(
    StructField("listid", LongType, nullable = false),
    StructField("ownerid", LongType, nullable = false),
    StructField("name", StringType),
    StructField("is_public", BooleanType, nullable = false)))

  /** review — schema.sql:41-49, UNIQUE(listid, userid). */
  val review: StructType = StructType(Seq(
    StructField("reviewid", LongType, nullable = false),
    StructField("listid", LongType, nullable = false),
    StructField("userid", LongType, nullable = false),
    StructField("content", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)))

  /** stocklist_shared_with — schema.sql:52-56. */
  val sharedWith: StructType = StructType(Seq(
    StructField("listid", LongType, nullable = false),
    StructField("userid", LongType, nullable = false)))

  /** stockin (list membership) — schema.sql:58-63. */
  val stockin: StructType = StructType(Seq(
    StructField("listid", LongType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("shares", DecimalType(38, 18))))

  /** Portfolio — schema.sql:68-73. */
  val portfolio: StructType = StructType(Seq(
    StructField("portfolioid", LongType, nullable = false),
    StructField("userid", LongType, nullable = false),
    StructField("name", StringType),
    StructField("cashbalance", DecimalType(38, 18))))

  /** Transaction ledger — schema.sql:75-81 (append-only, signed). */
  val transaction: StructType = StructType(Seq(
    StructField("transactionid", LongType, nullable = false),
    StructField("portfolioid", LongType, nullable = false),
    StructField("amount", DecimalType(12, 2), nullable = false),
    StructField("detail", StringType),
    StructField("createdat", TimestampType)))

  /** Holdings — schema.sql:91-99, Shares >= 0 enforced by Validate. */
  val holdings: StructType = StructType(Seq(
    StructField("portfolioid", LongType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("shares", IntegerType, nullable = false),
    StructField("avgcostbasis", DecimalType(12, 4))))

  /** statistics_cache — schema.sql:101-110 (see StatsCache). */
  val statisticsCache: StructType = StructType(Seq(
    StructField("portfolio_id", LongType, nullable = false),
    StructField("start_date", DateType, nullable = false),
    StructField("end_date", DateType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("cov", DoubleType),
    StructField("beta", DoubleType),
    StructField("updated_at", TimestampType)))

  /** StockSymbols dimension — schema.sql:83-85 (derived, distinct). */
  val stockSymbols: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false)))

  val all: Map[String, StructType] = Map(
    "stocks" -> stocks, "users" -> users, "friend" -> friend,
    "request" -> request, "stocklist" -> stocklist, "review" -> review,
    "stocklist_shared_with" -> sharedWith, "stockin" -> stockin,
    "portfolio" -> portfolio, "transaction" -> transaction,
    "holdings" -> holdings, "statistics_cache" -> statisticsCache,
    "stocksymbols" -> stockSymbols)
}
