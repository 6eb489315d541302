package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** events.ts layout drifted across testdata generations:
  * TIMESTAMP(NANOS) parquet (read as int64 epoch nanos under
  * spark.sql.legacy.parquet.nanosAsLong=true) vs TIMESTAMP(MICROS)
  * (read natively as timestamp / timestamp_ntz). Queries written for
  * one layout silently fail on the other — 7 event-time queries
  * dropped out of the correctness suite when the testdata switched to
  * micros. Normalize at the read site so every query states which
  * shape it needs and works with either layout.
  */
private[queries] object EventTs {

  /** ts → TimestampType/TimestampNTZ (micros), whatever the on-disk layout. */
  def toTimestamp(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      // int64 nanos: integer-div to micros (double division of ~1.7e18
      // ns exceeds 2^53 and loses up to ~128ns near hour boundaries)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case _ =>
      // NTZ→TIMESTAMP is exact under the UTC session timezone; streaming
      // watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE)
      df.withColumn("ts", col("ts").cast(TimestampType))
  }

  /** ts → int64 epoch nanos (for RANGE frames / tolerance arithmetic). */
  def toNanos(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case _ =>
      // NTZ→TIMESTAMP cast under the UTC session timezone is exact
      df.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
  }
}
