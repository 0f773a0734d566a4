package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.CurationOps

/** ScalaCheck property: the distributed lag+cumsum sessionizer equals a
  * sequential per-user fold on arbitrary event streams — duplicate
  * timestamps, boundary-exact gaps, single-event users and all.
  */
class SessionizePropSpec extends SparkSpec {
  import spark.implicits._

  private val GapUs = 1800L * 1000000L

  /** Sequential oracle: walk a user's events in (us, event_id) order,
    * split when the gap strictly exceeds GapUs, aggregate per session.
    */
  private def scalaSessions(evts: Seq[(Long, Long, Long, Long)]): Map[(Long, Long), (Long, Long, Long, Long)] = {
    // (user, eid, us, cents) -> key (user, sessIdx) -> (start, end, n, sum)
    evts.groupBy(_._1).flatMap { case (user, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      var sess = 0L; var prev = Long.MinValue
      sorted.map { case (_, _, us, cents) =>
        if (prev != Long.MinValue && us - prev > GapUs) sess += 1
        prev = us
        (user, sess, us, cents)
      }.groupBy(t => (t._1, t._2)).map { case (k, ss) =>
        k -> (ss.map(_._3).min, ss.map(_._3).max, ss.size.toLong, ss.map(_._4).sum)
      }
    }
  }

  test("sessionize == sequential fold on 300 arbitrary events (dup ts, exact-gap boundaries)") {
    val base = 1700000000000000L
    val genEvt = for {
      user <- Gen.chooseNum(1L, 5L)
      // offsets cluster around multiples of the gap so exact boundaries
      // (diff == gap: same session) and off-by-one-us cases both occur
      k <- Gen.chooseNum(0L, 6L)
      jit <- Gen.oneOf(-1L, 0L, 1L, 500000L)
      cents <- Gen.chooseNum(-500L, 500L)
    } yield (user, k * GapUs + jit, cents)
    val raw = Gen.listOfN(300, genEvt)
      .pureApply(Gen.Parameters.default, Seed(42L)).zipWithIndex
      .map { case ((u, off, c), i) => (u, i.toLong, base + off, c) }
    val df = raw.toDF("user_id", "event_id", "us", "cents")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"), (col("cents") / 100.0).as("value"))
    val got = CurationOps.sessionize(df, gapSec = 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val want = scalaSessions(raw)
    assert(got === want)
  }
}
