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

  test("KMV: salted two-level rank == sequential kth; exact below k; sane error band") {
    import spark.implicits._
    val P = 2147483647L
    def h(v: Long): Long = ((2654435761L % P) * (v % P) + 1013904223L % P) % P
    // groups far above k exercise the estimator; one group below k (the
    // sketch IS the exact set there)
    val vals = ((1L to 5000L).map(v => ("big", v)) ++
      (1L to 10L).map(v => ("tiny", v * 7777))).toDF("g", "v")
    val out = Sketches.kmvDistinct(vals, "g", "v", k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("tiny") === ((10L, 10L))) // below k: sketch = exact set
    // sequential reference for the kth smallest distinct hash
    val kth = (1L to 5000L).map(h).distinct.sorted.apply(63)
    assert(out("big")._1 === 63L * P / kth, "two-level rank diverged from sequential kth")
    // Beyer et al. stderr ~ 1/sqrt(k-2) ≈ 12.7%; 4 sigma is a safe CI bound
    val (est, exact) = out("big")
    assert(math.abs(est - exact).toDouble / exact < 0.51,
      s"KMV estimate $est too far from exact $exact at k=64")
  }

  test("bloom decontamination: superset of exact, hits >= exact overlap per doc") {
    import graft.ops.{CurationOps, DedupOps}
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val rows = DedupOps.shingleRows(docs, "doc_id", "text", 8).localCheckpoint(true)
    val evalPred = col("sid") % 89 === 7
    val exact = CurationOps.decontaminate(rows, evalPred, minShared = 60)
      .select(col("did"), col("eval_partners")).collect()
      .map(r => r.getLong(0)).toSet
    val bloom = Sketches.bloomDecontaminate(rows, evalPred, m = 1 << 20, k = 3,
      minHits = 60).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // no false negatives: every exactly-contaminated doc is quarantined
    // (exact partners >= 1 with >= 60 shared shingles implies >= 60 hits)
    assert(exact.nonEmpty)
    exact.foreach(d => assert(bloom.contains(d), s"bloom missed exact-contaminated $d"))
    // hit counts are >= the doc's true distinct shared-shingle count with
    // the eval UNION: spot-check via a direct overlap count
    val trueShared = rows.where(!evalPred).join(
        rows.where(evalPred).select(col("tok")).distinct(), "tok")
      .groupBy("sid").agg(count(lit(1)).as("sh")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    bloom.foreach { case (d, hits) =>
      assert(hits >= trueShared.getOrElse(d, 0L),
        s"doc $d: bloom hits $hits < true shared ${trueShared.getOrElse(d, 0L)}")
    }
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
