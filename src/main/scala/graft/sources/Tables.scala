package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet source layer for the test corpus (TESTDATA.md).
  *
  * The reference engine has no persistent sources at all — data lives in
  * GPU/host RAM and dies with the process (`/root/reference/src/main.cu:25-64`).
  * Spark-first replacement: schema-on-read Parquet scans. All loaders return
  * *lazy* DataFrames so Catalyst can push filters/projections into the scan
  * (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  *
  * Scale note (100 TB): these are plain `spark.read.parquet` scans, so
  * partition pruning, predicate pushdown and column pruning all apply
  * unchanged on a directory of thousands of files; nothing here assumes
  * single-file input.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is physically TIMESTAMP(NANOS) parquet, which Spark 4
    * rejects by default ([PARQUET_TYPE_ILLEGAL]). Read the raw nanos as
    * long and truncate to microseconds — exactly what DuckDB's
    * `CAST(ts AS TIMESTAMP)` does, so oracle parity is preserved.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer division: `/` on longs is DOUBLE division in Spark, and at
    // ~1.7e18 ns the double ulp is 256 ns, which truncated 163 sf0.01
    // events one microsecond early vs DuckDB's exact conversion
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
