package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the benchmark tables
  * (`/root/testdata/sf&lt;sf&gt;/name.parquet`, schemas in FIXTURES.md §3).
  *
  * One quirk needs central handling: `events.parquet` stores `ts` as
  * Parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects
  * outright. We flip the session to read nanos as raw longs and rebuild a
  * proper (microsecond) timestamp column — one multiply-free `div 1000`
  * inside codegen, applied before any consumer sees the frame. All other
  * tables load as-is.
  */
object Tables {

  /** Load a table by name from an sf directory. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // the nanos conf must be set BEFORE the footer read: without it the
    // events scan throws on the TIMESTAMP(NANOS) column and the rebuild
    // case below is unreachable — by-name loads must work like events()
    if (name == "events") configure(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    name match {
      case "events" if df.schema("ts").dataType.typeName == "long" =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }

  /** Session config required before the first events read: nanosecond
    * Parquet timestamps surface as longs instead of failing the scan. */
  def configure(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    configure(spark)
    load(spark, sfDir, "events")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
