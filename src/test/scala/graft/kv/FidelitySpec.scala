package graft.kv

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Reference-fidelity checks for SURVEY.md §1:
  *  - §1.1 packed metadata word layout [epoch16|rts16|wts16] @ 32/16/0;
  *  - §1.2 the five reference TypeIds map onto Spark types and round-trip
  *    through parquet;
  *  - §1.2 CmpBool {CmpFalse, CmpTrue, CmuNull} ≡ Spark's native
  *    three-valued NULL logic.
  */
class FidelitySpec extends SparkSpec {

  test("metadata word packs/unpacks at the reference's bit offsets") {
    import spark.implicits._
    val df = Seq((0, 0, 0), (1, 2, 3), (65535, 65535, 65535), (7, 0, 42))
      .toDF("e", "r", "w")
      .withColumn("word", MetadataWord.pack($"e", $"r", $"w"))
    val back = df.select($"e", $"r", $"w",
      MetadataWord.epoch($"word").as("e2"),
      MetadataWord.rts($"word").as("r2"),
      MetadataWord.wts($"word").as("w2"),
      $"word")
    back.collect().foreach { row =>
      assert(row.getInt(0) == row.getInt(3))
      assert(row.getInt(1) == row.getInt(4))
      assert(row.getInt(2) == row.getInt(5))
    }
    // exact reference layout: epoch<<32 | rts<<16 | wts
    val w = df.filter($"e" === 1 && $"r" === 2 && $"w" === 3)
      .select($"word").collect()(0).getLong(0)
    assert(w == ((1L << 32) | (2L << 16) | 3L))
  }

  test("the five reference TypeIds round-trip through parquet") {
    // BOOLEAN, INTEGER, DECIMAL, VARCHAR, TIMESTAMP (type.h:9-16)
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("b", BooleanType),
      StructField("i", IntegerType),
      StructField("d", DecimalType(10, 2)),
      StructField("s", StringType),
      StructField("t", TimestampType)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(true, 7, new java.math.BigDecimal("12.34"),
        "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val df = spark.createDataFrame(rows, schema)
    val dir = java.nio.file.Files.createTempDirectory("graft-types")
      .toFile.getAbsolutePath
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema == schema)
    assert(back.collect()(0) == df.collect()(0))
  }

  test("CmpBool three-valued logic: NULL comparisons behave as the reference sketched") {
    import spark.implicits._
    val df = Seq((Some(1), Some(1)), (Some(1), Some(2)), (Some(1), None),
      (None: Option[Int], None: Option[Int])).toDF("a", "b")
    val r = df.select(
      ($"a" === $"b").as("eq"),         // CmpTrue / CmpFalse / CmuNull
      ($"a" <=> $"b").as("nseq"),       // null-safe variant
      ($"a" === $"b").isNull.as("isUnknown"))
      .collect()
    assert(r(0).getBoolean(0) && r(0).getBoolean(1))       // 1 = 1
    assert(!r(1).getBoolean(0) && !r(1).getBoolean(1))     // 1 = 2
    assert(r(2).isNullAt(0) && !r(2).getBoolean(1)         // 1 = NULL -> unknown
      && r(2).getBoolean(2))
    assert(r(3).isNullAt(0) && r(3).getBoolean(1))         // NULL <=> NULL
    // unknown filters drop rows; aggregates skip NULLs
    assert(df.filter($"a" === $"b").count() == 1)
    assert(df.agg(count($"b")).collect()(0).getLong(0) == 2)
  }
}
