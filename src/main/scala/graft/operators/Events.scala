package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import graft.Tables

/** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's parquet
  * reader only surfaces as a raw long (spark.sql.legacy.parquet.nanosAsLong
  * — set by GraftSession/Verify/Bench). This helper normalizes `ts` to a
  * microsecond TimestampType column so every downstream operator sees one
  * schema. DuckDB truncates ns→us the same way (floor division, positive
  * epochs), so oracle comparisons line up.
  *
  * DOMAIN CONTRACT — `ts >= epoch (1970-01-01)`, i.e. non-negative
  * epoch-ms. Every day/hour/minute bucketing downstream (q59 cohort_day,
  * q62 gap buckets, q67 range arithmetic, q70 day, the stream rate-limit
  * ring) divides epoch-ms with Spark `div`, which truncates toward zero,
  * while the DuckDB oracles' `//` floors — the two agree ONLY on
  * non-negative values, so a pre-1970 timestamp would silently diverge
  * between engines (and between prod and oracle plans) rather than fail.
  * Event streams are captured-at timestamps, so the domain is natural;
  * ingesting historical pre-epoch data would need an explicit
  * floor-division expression in BOTH engines instead.
  */
object Events {
  def withEventTime(s: SparkSession, d: String): DataFrame = {
    val raw = Tables.events(s, d)
    raw.schema("ts").dataType match {
      // Integer division (DIV) — ns epochs exceed double's 53-bit mantissa,
      // so a float divide here would corrupt timestamps.
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => raw
      case other => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}
