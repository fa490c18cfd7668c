package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver's testdata tables.
  *
  * The synthetic `events` table stores `ts` as parquet TIMESTAMP(NANOS),
  * which Spark's TimestampType (µs) cannot hold; with
  * `spark.sql.legacy.parquet.nanosAsLong=true` (set by [[graft.GraftSession]])
  * the column arrives as epoch-nanos LONG and is converted here to a µs
  * TimestampType column. All downstream semantics are at minute/hour
  * granularity, so the ns→µs truncation is lossless for every operator.
  */
object Tables {

  def read(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Tick/event stream with `ts` normalized to TimestampType. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = read(s, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // tz-naive parquet TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ under
      // Spark 4's NTZ inference; the session tz is pinned to UTC, so the
      // cast re-labels the same wall-clock as an instant (what the DuckDB
      // oracle's epoch conversion assumes too) and unix_millis-based
      // operators keep working unchanged.
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def documents(s: SparkSession, dir: String): DataFrame = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")
  def lineitem(s: SparkSession, dir: String): DataFrame = read(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = read(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = read(s, dir, "customer")
}
