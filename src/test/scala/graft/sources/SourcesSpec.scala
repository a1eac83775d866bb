package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Source/sink coverage (SURVEY.md §2.2: the reference has NO persistence at
  * all — Spark supplies parquet/csv/json/orc; these roundtrips pin the
  * engine's schema fidelity across formats).
  */
class SourcesSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toFile.getAbsolutePath

  private lazy val cust = Tables.customer(spark, sf("sf0.001"))

  test("csv roundtrip preserves rows and values (schema re-applied)") {
    val dir = tmp("csv")
    cust.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(cust.schema).csv(dir)
    assert(back.count() == cust.count())
    val a = cust.orderBy(col("c_custkey")).collect().map(_.toSeq)
    val b = back.orderBy(col("c_custkey")).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("json roundtrip preserves rows and values") {
    val dir = tmp("json")
    cust.write.mode("overwrite").json(dir)
    val back = spark.read.schema(cust.schema).json(dir)
    val a = cust.orderBy(col("c_custkey")).collect().map(_.toSeq)
    val b = back.orderBy(col("c_custkey")).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("orc roundtrip preserves rows and values") {
    val dir = tmp("orc")
    cust.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    val a = cust.orderBy(col("c_custkey")).collect().map(_.toSeq)
    val b = back.orderBy(col("c_custkey")).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp("part")
    cust.withColumn("seg", col("c_mktsegment"))
      .write.mode("overwrite").partitionBy("seg").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("seg") === "BUILDING")
    val plan = one.queryExecution.executedPlan.toString
    val expected = cust.filter(col("c_mktsegment") === "BUILDING").count()
    assert(one.count() == expected)
    // partition filter must be pruned at the source, not post-scanned
    assert(plan.contains("PartitionFilters") ||
      !plan.contains("seg#"), s"partition pruning missing:\n$plan")
  }
}
