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

  test("bucketed tables co-locate the join: no shuffle exchange on either side") {
    // bucketing is THE pre-shuffle strategy for repeated big-big joins at
    // scale: both sides bucketed on the join key join with zero exchanges
    // (warehouse.dir is a static conf; tables land in ./spark-warehouse,
    // dropped below and gitignored)
    val ord = Tables.orders(spark, sf("sf0.001"))
    val li = Tables.lineitem(spark, sf("sf0.001"))
    ord.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
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
