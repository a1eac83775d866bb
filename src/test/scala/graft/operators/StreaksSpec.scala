package graft.operators

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** streaks: conservation against the distinct (user, day) set and an
  * independent plain-Scala recomputation of the longest run per user.
  */
class StreaksSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("streaks conserve active days and match a naive recomputation") {
    import spark.implicits._
    val st = Events.streaks(spark, dir).localCheckpoint(true)
    assert(st.filter($"best_streak" > $"n_days").count() == 0)
    assert(st.filter($"n_streaks" < 1 || $"best_streak" < 1).count() == 0)

    val days = Tables.events(spark, dir)
      .select($"user_id", date_trunc("day", $"ts").cast("date").as("day"))
      .distinct()
    // n_days conserves the distinct (user, day) set
    assert(st.agg(sum($"n_days")).head().getLong(0) == days.count())

    // independent recomputation: sort each user's days, count runs of
    // consecutive dates
    val naive = days.as[(Long, java.sql.Date)].collect()
      .groupBy(_._1).map { case (u, rows) =>
        val ds = rows.map(_._2.toLocalDate).sortBy(_.toEpochDay)
        val runs = ds.foldLeft(List.empty[(LocalDate, Long)]) {
          case ((last, len) :: tail, d) if last.plusDays(1) == d =>
            (d, len + 1) :: tail
          case (acc, d) => (d, 1L) :: acc
        }
        (u, ds.length.toLong, runs.map(_._2).max, runs.length.toLong)
      }.toSet
    val got = st.as[(Long, Long, Long, Long)].collect().toSet
    assert(got == naive)
  }
}
