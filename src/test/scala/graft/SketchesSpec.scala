package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches
import graft.sources.Tables

/** Semantic guarantees of the sketches that the value-equality oracle
  * can't falsify: the CMS one-sided error bound (est ≥ exact, always —
  * even under forced collisions) and the HLL error band.
  */
class SketchesSpec extends SparkSpec {

  private val SfBig = "/root/testdata/sf0.1"

  test("count-min never underestimates, even with forced collisions (w=16)") {
    val vals = Tables.tokens(spark, SfBig).select(explode(col("tokens")).as("tok"))
    val out = Sketches.countMinTopK(vals, "tok", d = 4, w = 16, topK = 20).collect()
    assert(out.length === 20)
    out.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS underestimated: tok=${r.get(0)} exact=$exact est=$est")
    }
    // at w=16 with thousands of distinct tokens, collisions MUST inflate
    // at least some estimates — otherwise the sketch isn't being exercised
    assert(out.exists(r => r.getLong(2) > r.getLong(1)))
  }

  test("HLL estimate stays within 3x the theoretical error band per source") {
    val vals = Tables.tokens(spark, SfBig)
      .select(col("source"), explode(col("tokens")).as("tok"))
    val m = 64
    val band = 3 * 1.04 / math.sqrt(m) // ~0.39
    val rows = Sketches.hllDistinct(vals, "source", "tok", m).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      val err = math.abs(est - exact).toDouble / exact
      assert(err <= band, s"${r.getString(0)}: est=$est exact=$exact err=$err > $band")
    }
  }
}
