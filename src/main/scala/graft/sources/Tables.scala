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
  /** `events.ts` has shipped as two physical parquet types across corpus
    * generations: TIMESTAMP(NANOS) (which Spark 4 rejects by default,
    * [PARQUET_TYPE_ILLEGAL] — read as long nanos and truncate to micros,
    * matching DuckDB's `CAST(ts AS TIMESTAMP)`) and plain TIMESTAMP(MICROS)
    * without UTC adjustment (read as TIMESTAMP_NTZ). Normalize both to
    * session-zone TimestampType (sessions run UTC, so the NTZ cast is
    * value-preserving) so every downstream consumer sees one type.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer division: `/` on longs is DOUBLE division in Spark, and
        // at ~1.7e18 ns the double ulp is 256 ns, which truncated 163
        // sf0.01 events one microsecond early vs DuckDB's exact conversion
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
