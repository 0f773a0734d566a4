package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** Edge semantics of the composed temporal joins: equal-ts inclusion,
  * no-prior-build NULL, range gaps, block-boundary containment.
  */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  test("asOf picks the latest build at or before the probe ts, NULL before any build") {
    val probe = Seq((1L, 10L, 100L), (1L, 15L, 101L), (1L, 20L, 102L), (2L, 5L, 103L))
      .toDF("k", "ts", "eid")
    val build = Seq((1L, 10L, 7L), (1L, 16L, 8L)).toDF("k", "ts", "v")
    val out = AsOf.asOf(probe, build, "k", "ts", "v", Seq("eid"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out === Map(
      100L -> Some(7L), // equal ts: build applies to same-ts probe
      101L -> Some(7L), // between builds: earlier one
      102L -> Some(8L),
      103L -> None))    // key with no build rows
  }

  test("rangeJoin matches containment exactly across block boundaries, NULL in gaps") {
    // block size 8; range [6, 13] spans two blocks; [20, 21] within one
    val ranges = Seq((6L, 13L, "a"), (20L, 21L, "b")).toDF("rs", "re", "org")
    val probe = Seq(5L, 6L, 13L, 14L, 20L, 22L).map(Tuple1(_)).toDF("k")
    val out = AsOf.rangeJoin(probe, ranges, "k", "rs", "re", "org", Seq(), blockSize = 8)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out === Map(5L -> None, 6L -> Some("a"), 13L -> Some("a"),
      14L -> None, 20L -> Some("b"), 22L -> None))
  }

  test("asOf plan has no non-equi join (single key-shuffle window)") {
    val probe = Seq((1L, 10L, 100L)).toDF("k", "ts", "eid")
    val build = Seq((1L, 10L, 7L)).toDF("k", "ts", "v")
    val plan = AsOf.asOf(probe, build, "k", "ts", "v", Seq("eid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not fall back to a non-equi join:\n$plan")
  }
}
