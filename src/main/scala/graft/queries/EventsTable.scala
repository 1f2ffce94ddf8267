package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The `events` fixture is written with parquet TIMESTAMP(NANOS), which Spark
 * refuses by default ([PARQUET_TYPE_ILLEGAL]). Read nanos as LONG via the
 * legacy conf and convert to a microsecond TimestampType column ourselves.
 * Integer `div` keeps full precision (a ~1.7e18 nanos value does not fit a
 * double's 53-bit mantissa), and truncation toward zero matches how
 * nanosecond readers (e.g. DuckDB) downcast to microseconds.
 */
object EventsTable {
  def load(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
