package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Fixture-schema normalization.
  *
  * The driver has shipped the `events` table in two vintages: parquet
  * TIMESTAMP(NANOS), which Spark 4 surfaces as long nanoseconds under
  * the `spark.sql.legacy.parquet.nanosAsLong` session flag, and plain
  * TIMESTAMP(MICROS), which reads as a proper TimestampType column.
  * Everything downstream (event-time windows, sessionization, as-of and
  * range joins, streaming ingest) wants exactly one shape, so the
  * readers funnel through [[normalizeTs]] and operators can assume
  * `ts: timestamp` unconditionally. Microsecond longs, where an
  * operator needs them, come from `unix_micros(col("ts"))` — exact on
  * the int64 domain (no double round-trip).
  */
object Fixtures {

  /** If `df` carries a long `ts` column (nanosAsLong vintage), convert
    * it in place to a microsecond-precision timestamp; a TIMESTAMP_NTZ
    * `ts` (plain-MICROS vintage) is cast to session-zone TIMESTAMP —
    * the engine sessions pin UTC, so the instant is unchanged and
    * `unix_micros` applies. Integer-divide ns→μs on longs — a double
    * division would lose precision past 2^53.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
}
