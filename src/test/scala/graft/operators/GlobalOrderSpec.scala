package graft.operators

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Laws for the two-pass global ordering primitive [[GlobalOrder]]:
  * bit-equality with the single-window form on a total order, the
  * closed-form ntile arithmetic vs Spark's own ntile for awkward (n, k)
  * shapes, and the plan property that motivates the primitive — no
  * unpartitioned Window node anywhere in its output plan.
  */
class GlobalOrderSpec extends SparkSpec {

  private def sampleDf(n: Int, parts: Int = 7) = {
    import spark.implicits._
    // keys deliberately adversarial to range boundaries: clustered runs +
    // a unique tie-break, values signed
    (1 to n).map(i => ((i * 37) % 19, i.toLong, ((i * 13) % 29 - 7).toLong))
      .toDF("grp", "id", "v")
      .repartition(parts)
  }

  test("rank matches a global row_number window on a total order") {
    import spark.implicits._
    val df = sampleDf(500)
    val (ranked, n) =
      GlobalOrder.rank(df, Seq($"grp".desc, $"id"), "rnk", parts = 5)
    assert(n === 500L)
    val expected = df.withColumn("rnk",
      row_number().over(Window.orderBy($"grp".desc, $"id")).cast("long"))
    val got = ranked.select($"id", $"rnk").orderBy($"id").collect()
    val want = expected.select($"id", $"rnk").orderBy($"id").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("cumsum matches a global running-sum window and reports the total") {
    import spark.implicits._
    val df = sampleDf(401)
    val (cum, total) =
      GlobalOrder.cumsum(df, Seq($"grp", $"id"), $"v", "cs", parts = 6)
    val expected = df.withColumn("cs",
      sum($"v").over(Window.orderBy($"grp", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = cum.select($"id", $"cs").orderBy($"id").collect()
    val want = expected.select($"id", $"cs").orderBy($"id").collect()
    assert(got.toSeq === want.toSeq)
    val direct = df.agg(sum($"v")).head().getLong(0)
    assert(total === direct)
  }

  test("ntileFromRank matches Spark ntile for ragged and tiny (n, k)") {
    import spark.implicits._
    for ((n, k) <- Seq((100, 5), (101, 5), (104, 5), (7, 10), (10, 10),
        (23, 4), (1, 3))) {
      val df = (1 to n).map(i => (i.toLong * 11 % 997, i.toLong))
        .toDF("key", "id")
      val (ranked, total) =
        GlobalOrder.rank(df, Seq($"key", $"id"), "rnk", parts = 3)
      assert(total === n.toLong)
      val got = ranked
        .withColumn("b", GlobalOrder.ntileFromRank($"rnk", total, k)
          .cast("long"))
        .select($"id", $"b").orderBy($"id").collect()
      val want = df
        .withColumn("b", ntile(k).over(Window.orderBy($"key", $"id"))
          .cast("long"))
        .select($"id", $"b").orderBy($"id").collect()
      assert(got.toSeq === want.toSeq, s"(n=$n, k=$k)")
    }
  }

  test("the primitive's plan contains no unpartitioned Window node") {
    import spark.implicits._
    val df = sampleDf(200)
    val (ranked, _) = GlobalOrder.rank(df, Seq($"id"), "rnk", parts = 4)
    val bad = ranked.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "two-pass form must not plan a global window")
  }

  test("stat_exact_percentiles == in-memory sorted-rank recount") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val sorted = graft.sources.Tables.lineitem(spark, dir)
      .select(round($"l_extendedprice" * 100).cast("long").as("v"))
      .collect().map(_.getLong(0)).sorted
    val n = sorted.length.toLong
    val want = Seq(250L, 500L, 750L, 900L, 990L).map { p =>
      p -> sorted((math.max(1L, (p * n + 999) / 1000) - 1).toInt)
    }
    val got = Relational.statExactPercentiles(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got === want)
  }

  test("rank is stable across repeated evaluation (pinned partitioning)") {
    import spark.implicits._
    val df = sampleDf(300, parts = 5)
    val (ranked, _) = GlobalOrder.rank(df, Seq($"v", $"id"), "rnk")
    val a = ranked.orderBy($"id").collect()
    val b = ranked.orderBy($"id").collect() // re-evaluates the same frame
    assert(a.toSeq === b.toSeq)
  }
}
