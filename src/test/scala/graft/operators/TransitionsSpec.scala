package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** transitions / interArrival: conservation and bucket-boundary laws over
  * the per-user timeline windows they share.
  */
class TransitionsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("transitions conserve per-user step counts and row-normalize") {
    import spark.implicits._
    val tr = Events.transitions(spark, dir).localCheckpoint(true)
    val ev = Tables.events(spark, dir)
    val totalSteps = ev.count() - ev.select($"user_id").distinct().count()
    assert(tr.agg(sum($"n")).head().getLong(0) == totalSteps,
      "every event except each user's first is exactly one transition")

    // row-normalization: floors sum to ≤ 1000 and within one unit per cell
    val rows = tr.groupBy($"from_type")
      .agg(sum($"p_permille").as("pm"), count(lit(1)).as("k"))
    assert(rows.filter($"pm" > 1000L).count() == 0)
    assert(rows.filter($"pm" <= lit(1000L) - $"k").count() == 0)

    // p_permille arithmetic against the row mass
    val mass = tr.groupBy($"from_type").agg(sum($"n").as("row_n"))
    val bad = tr.join(mass, Seq("from_type"))
      .filter($"p_permille" =!=
        floor($"n" * 1000L / $"row_n").cast("long"))
    assert(bad.count() == 0)
  }

  test("interArrival buckets conserve gaps and respect boundaries") {
    import spark.implicits._
    val ia = Events.interArrival(spark, dir).localCheckpoint(true)
    val ev = Tables.events(spark, dir)
    val totalGaps = ev.count() - ev.select($"user_id").distinct().count()
    assert(ia.agg(sum($"n")).head().getLong(0) == totalGaps)

    val bounds = Map(
      "a_lt1m" -> (0L, 60000L),
      "b_1to5m" -> (60000L, 300000L),
      "c_5mto1h" -> (300000L, 3600000L),
      "d_ge1h" -> (3600000L, Long.MaxValue))
    val viol = ia.as[(String, String, Long, Long)].collect().filter {
      case (_, b, n, mx) =>
        val (lo, hi) = bounds(b)
        n <= 0 || mx < lo || mx >= hi
    }
    assert(viol.isEmpty, viol.mkString(", "))
  }
}
