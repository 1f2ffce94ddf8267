package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The `events` fixture's `ts` column has shifted physical types across
 * driver data generations: parquet TIMESTAMP(NANOS) (which Spark refuses
 * by default — [PARQUET_TYPE_ILLEGAL] — and reads as LONG under the legacy
 * conf) and plain TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Normalize
 * either to a session-zone microsecond TimestampType column so every
 * downstream query is layout-agnostic. For the nanos form, integer `div`
 * keeps full precision (a ~1.7e18 nanos value does not fit a double's
 * 53-bit mantissa), and truncation toward zero matches how nanosecond
 * readers (e.g. DuckDB) downcast to microseconds; for the NTZ form the
 * cast interprets the naive value in the session zone (UTC here), exactly
 * as DuckDB treats it.
 */
object EventsTable {
  def load(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp")) // TIMESTAMP_NTZ
    }
  }
}
