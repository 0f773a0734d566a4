package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (query set broadcast, corpus scanned
  * once). Scale paths, all built on one shared primitive — deterministic
  * integer projection sketches:
  *
  *  - [[sketchRerankTopK]] — compressed-scan + exact rerank: score the
  *    corpus by 32-d sketch cosine (8× less data than the 64-d f32 vectors,
  *    whole-stage-codegen'd integer arithmetic), keep the top fraction via
  *    a two-pass quantized-histogram threshold (no per-query corpus sort —
  *    per-query window state is bounded by the bucket range at any scale),
  *    re-score only those with exact cosine. Candidate fraction is an exact
  *    knob (default 1/5); measured recall@5 ≈ 0.89 on the synthetic corpus.
  *  - [[multiTableLshTopK]] — L independent sign-bucket tables from the same
  *    sketch bits, candidates = union over tables (the standard multi-table
  *    LSH construction; key cardinality L·2^bits, so no low-cardinality
  *    shuffle key at scale).
  *  - [[ivfTopK]] — IVF with data-derived centroids (stride-sampled corpus
  *    vectors) and nProbe>1 query fan-out.
  *
  * On THIS corpus the embeddings are isotropic (near-random: neighbor cos
  * ≈0.4 vs bulk σ=0.125, measured), so bucket-only methods (LSH/IVF) cannot
  * reach high recall at low candidate fractions — no planted cluster
  * structure exists to exploit. The sketch-rerank path does not depend on
  * cluster structure (its recall follows the Johnson–Lindenstrauss noise
  * bound) and is the one that meets recall ≥ 0.8 at ≤ 20% candidates;
  * AnnRecallSpec measures all three against the brute-force baseline.
  *
  * Determinism across engines: sketches and centroid assignments are pure
  * int64 arithmetic over round(x·1e6) microunits — order-independent sums,
  * so DuckDB reproduces them bit-exactly; doubles appear only in final
  * ratios computed in identical expression order on both sides.
  */
object Ann {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product (left-to-right, IEEE double → oracle-exact). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)

  /** Scale-safe per-query top-k over (q_id, c_id, cos) rows. A direct
    * `Window.partitionBy(q_id)` rank sorts ALL of a query's candidate rows
    * in one task — at 100× data that is a single-task corpus sort per
    * query. Two-level instead: rank within (q_id, salt) partitions first
    * (any global top-k row is necessarily in its salt bucket's local
    * top-k), then rank the ≤ salts·k survivors per query. Output is
    * identical to the direct global rank (same orderBy, same tie-break);
    * the final window holds at most salts·k rows per query regardless of
    * corpus size. Same partial-top-k-then-merge shape as e02/k03's
    * TakeOrderedAndProject, expressed per query group.
    */
  private def topKPerQuery(scored: DataFrame, k: Int, salts: Int = 32): DataFrame = {
    val wLocal = Window.partitionBy(col("q_id"), pmod(hash(col("c_id")), lit(salts)))
      .orderBy(col("cos").desc, col("c_id"))
    val pruned = scored.withColumn("__lr", row_number().over(wLocal))
      .where(col("__lr") <= k).drop("__lr")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    pruned.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "c_id", "cos", "rank")
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Deterministic tie-break on (cos desc, id).
    */
  def bruteForceTopK(emb: DataFrame, queryFilter: Column, k: Int): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.where(queryFilter).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val c = e.select(col("vec_id").as("c_id"), col("v").as("cv"))
    val scored = q.join(c, col("c_id") =!= col("q_id")) // broadcast(q) auto: q is tiny
      .withColumn("cos", cosine(col("qv"), col("cv")))
    topKPerQuery(scored.select("q_id", "c_id", "cos"), k)
  }

  /** Semi-hard negative mining (FaceNet, Schroff et al. 2015 §3.2): per
    * anchor, the top-k most-similar negatives INSIDE the semi-hard band —
    * less similar than the positive but by no more than the margin
    * (pos_cos − margin ≤ neg_cos < pos_cos). Random negatives (i04) are
    * mostly too easy to produce gradient; semi-hard ones train a metric
    * embedding without collapsing it. The positive is the brute-force
    * top-1. Band compares run on int64 e6 microunits of the 6-dp-rounded
    * cosine — the established cross-engine float contract.
    *
    * Shape at scale: the Q×N scored frame materializes ONCE
    * (localCheckpoint — it feeds both the positive top-1 and the band
    * filter; unmaterialized it would score the corpus twice, the a04
    * lesson), the |Q|-row positive side re-joins by broadcast, and both
    * rank passes use the salted two-level top-k — no single-task corpus
    * sort per query at any corpus size.
    */
  def semiHardNegatives(emb: DataFrame, queryFilter: Column, k: Int,
                        marginE6: Long): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.where(queryFilter).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val c = e.select(col("vec_id").as("c_id"), col("v").as("cv"))
    val scored = q.join(c, col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(cosine(col("qv"), col("cv")) * 1e6).cast("long").as("cos"))
      .localCheckpoint(true)
    val pos = topKPerQuery(scored, 1)
      .select(col("q_id"), col("c_id").as("pos_id"), col("cos").as("pos_cos"))
    val band = scored.join(broadcast(pos), "q_id")
      .where(col("c_id") =!= col("pos_id") &&
        col("cos") < col("pos_cos") && col("cos") >= col("pos_cos") - lit(marginE6))
    topKPerQuery(band.select("q_id", "c_id", "cos"), k)
      .join(broadcast(pos), "q_id")
      .select(col("q_id").as("anchor"), col("pos_id"),
        col("pos_cos").as("pos_cos_e6"), col("c_id").as("neg_id"),
        col("cos").as("neg_cos_e6"), col("rank"))
  }

  /** Projection weight for sketch row t (0-based), component i0 (1-based):
    * an LCG with a per-row multiplier so rows are decorrelated (a shared
    * multiplier makes every row the same sequence shifted — measured recall
    * collapse). Values in [-3, 3]; pure int64, identical in SQL.
    */
  def projWeight(t: Int, i0: Column): Column =
    (i0 * lit((2L * t + 3L) * 2654435761L) + lit((t + 1L) * 1013904223L)) % 1000003L % 7L - 3L

  /** SQL twin of [[projWeight]] for a 1-based component expression. */
  def projWeightSql(t: Int, i0: String): String =
    s"(($i0 * ${(2L * t + 3L) * 2654435761L} + ${(t + 1L) * 1013904223L}) % 1000003 % 7 - 3)"

  /** Integer projection sketches: kProj int64 columns s0..s{kProj-1} per
    * vector, from round(x·1e6) microunits. Computed with posexplode +
    * groupBy integer sums — codegen'd, map-side combined, order-independent
    * (exact), one shuffled row per vector. This is the 100 TB shape: the
    * sketch table is the small scan-side artifact.
    */
  def sketches(emb: DataFrame, kProj: Int): DataFrame = {
    val px = emb
      .select(col("vec_id"), posexplode(asDouble(col("embedding"))).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).cast("long").as("i0"),
        floor(col("x") * 1e6 + lit(0.5)).cast("long").as("xi"))
    val aggs = (0 until kProj).map(t => sum(col("xi") * projWeight(t, col("i0"))).as(s"s$t"))
    px.groupBy("vec_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Sketch cosine between prefixed sketch column sets — a flat codegen'd
    * arithmetic chain (no HOFs), left-associated like its SQL twin.
    */
  private def sketchCos(kProj: Int, qp: String, cp: String): Column = {
    def chain(f: Int => Column): Column = (0 until kProj).map(f).reduce(_ + _)
    val d = chain(t => col(s"$qp$t").cast("double") * col(s"$cp$t"))
    val nq = sqrt(chain(t => col(s"$qp$t").cast("double") * col(s"$qp$t")))
    val nc = sqrt(chain(t => col(s"$cp$t").cast("double") * col(s"$cp$t")))
    d / (nq * nc)
  }

  /** Compressed-scan + exact-rerank top-k, two-pass threshold form: keep
    * every candidate whose sketch cosine clears the per-query cut value,
    * exact-cosine only those.
    *
    * The cut is derived WITHOUT ranking the corpus per query (a
    * `Window.partitionBy(q_id)` rank over the Q×N scored rows would sort
    * the whole corpus in one task per query): sketch cosines are quantized
    * to integer micro-units (floor(x·1e6) — bit-identical doubles in both
    * engines, so the quantization is too), pass 1 builds a per-(q_id,
    * bucket) histogram — a map-side-combined aggregate whose per-query size
    * is bounded by the 2·1e6+1 bucket range REGARDLESS of corpus size —
    * and the threshold bucket (largest bucket at which the descending
    * cumulative count reaches ceil(cnt/candDiv)) falls out of a window over
    * that bounded histogram. Pass 2 re-scans the sketch pairs and keeps
    * ski ≥ threshold; boundary-bucket ties are all kept (candidates may
    * slightly exceed cnt/candDiv — recall can only improve, and both
    * engines keep the identical set, so the oracle stays exact).
    */
  def sketchRerankTopK(emb: DataFrame, queryFilter: Column, k: Int,
                       kProj: Int = 32, candDiv: Int = 5): DataFrame = {
    // materialized once: both passes consume it (at cluster scale the
    // sketch table is the persisted compressed-scan artifact)
    val sk = sketches(emb, kProj).localCheckpoint(true)
    val qs = sk.where(queryFilter)
      .select(col("vec_id").as("q_id") +: (0 until kProj).map(t => col(s"s$t").as(s"qs$t")): _*)
    val cs = sk
      .select(col("vec_id").as("c_id") +: (0 until kProj).map(t => col(s"s$t").as(s"cs$t")): _*)
    // materialized once: the Q×N sketch-cosine join feeds BOTH the histogram
    // pass and the threshold re-scan — without this the dominant join + 32-term
    // cosine chain runs twice per query batch (at cluster scale: persist to the
    // shuffle service / a scratch table instead of local disk)
    val scored = qs.join(cs, col("c_id") =!= col("q_id"))
      .withColumn("ski", floor(sketchCos(kProj, "qs", "cs") * lit(1e6)).cast("long"))
      .select("q_id", "c_id", "ski")
      .localCheckpoint(true)
    val hist = scored.groupBy("q_id", "ski").agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy(col("q_id")).orderBy(col("ski").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = hist
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("cnt", sum(col("n")).over(Window.partitionBy(col("q_id"))))
      .where(col("cum") >= expr(s"(cnt + ${candDiv - 1}) div $candDiv"))
      .groupBy("q_id").agg(max(col("ski")).as("thr"))
    val cand = scored.join(thr, "q_id")
      .where(col("ski") >= col("thr"))
      .select("q_id", "c_id")
    rerankExact(emb, cand, k)
  }

  /** Exact-cosine rerank of (q_id, c_id) candidate pairs → top-k per query
    * (two-level salted rank — see [[topKPerQuery]]).
    */
  def rerankExact(emb: DataFrame, pairs: DataFrame, k: Int): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val scored = pairs
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv")), "q_id")
      .join(e.select(col("vec_id").as("c_id"), col("v").as("cv")), "c_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
    topKPerQuery(scored.select("q_id", "c_id", "cos"), k)
  }

  /** Multi-table multi-probe LSH: table t's bucket = sign bits of sketch
    * rows t·bits..t·bits+bits-1; candidates = union over tables, deduped.
    * Key cardinality is tables·2^bits — sized so no single join key funnels
    * the corpus at scale.
    *
    * Multi-probe (Lv et al., VLDB 2007): each QUERY additionally probes
    * every bucket within Hamming distance `probeRadius` of its own — the
    * corpus side still emits one bucket per table, so the index size and
    * the shuffle-key cardinality are unchanged; only the query fan-out
    * grows (Σ_{d≤r} C(bits,d) probe rows per query per table — 37 at
    * bits=8, r=2). On an isotropic corpus where a neighbor bit agrees with
    * probability p ≈ 0.6–0.65, radius 2 lifts the per-table hit rate from
    * p^8 ≈ 0.03 to Σ_{d≤2} C(8,d)·p^(8-d)·(1-p)^d ≈ 0.35 — measured
    * recall@5 0.07 → ≥0.8 over 4 tables (AnnRecallSpec) at a candidate
    * fraction that still vanishes as 2^bits is sized up with the corpus.
    */
  def multiTableLshTopK(emb: DataFrame, queryFilter: Column, k: Int,
                        tables: Int = 4, bits: Int = 8, probeRadius: Int = 2): DataFrame = {
    val kProj = tables * bits
    val sk = sketches(emb, kProj)
    def bucket(t: Int): Column =
      (0 until bits).map(j => when(col(s"s${t * bits + j}") >= 0, lit(1L << j)).otherwise(0L))
        .reduce(_ + _)
    val tb = sk.select(col("vec_id"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"), bucket(t).as("bkt"))): _*)).as("b"))
      .select(col("vec_id"), col("b.tbl").as("tbl"), col("b.bkt").as("bkt"))
    val qIds = emb.where(queryFilter).select(col("vec_id").as("q_id"))
    val masks = (0 until (1 << bits)).filter(m => Integer.bitCount(m) <= probeRadius)
    val qb = tb.join(qIds, tb("vec_id") === qIds("q_id"))
      .select(col("q_id"), col("tbl"),
        explode(array(masks.map(m => col("bkt").bitwiseXOR(lit(m.toLong))): _*)).as("bkt"))
    val pairs = qb.join(tb, Seq("tbl", "bkt"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id")).distinct()
    rerankExact(emb, pairs, k)
  }

  /** Binary sign-code + Hamming rerank — the memory-optimal scale path:
    * each vector compresses to ONE long of sign bits from the shared
    * integer projections (8 bytes vs 256 bytes of f32 — 32×), the corpus
    * scan is `bit_count(xor)` per pair (a single fused instruction per
    * word on real hardware; flat codegen here), and per-query candidate
    * selection needs NO sort at all: Hamming over `bits` bits takes only
    * bits+1 distinct values, so the per-query threshold histogram is ≤ 33
    * rows at ANY corpus size — the a04 bounded-histogram construction in
    * its smallest possible form. Top num/den fraction by Hamming asc →
    * exact-cosine rerank top-k. Recall sits between the bucket paths and
    * a04's int-sketch scan (the 1-bit quantization loses magnitude
    * information; AnnRecallSpec measures it) — the trade is 32× less scan
    * I/O than exact and 32× less than the int sketch.
    */
  def hammingRerankTopK(emb: DataFrame, queryFilter: Column, k: Int,
                        bits: Int = 32, den: Int = 5): DataFrame = {
    require(bits <= 63, "codes pack into one long")
    val sk = sketches(emb, bits)
    val code = (0 until bits)
      .map(j => when(col(s"s$j") >= 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    val codes = sk.select(col("vec_id"), code.as("code"))
    val q = codes.join(emb.where(queryFilter).select(col("vec_id")), "vec_id")
      .select(col("vec_id").as("q_id"), col("code").as("qc"))
    // the Hamming scan feeds BOTH the threshold histogram and the candidate
    // join — materialize once or the sketch+code pipeline executes twice
    val scored = codes.select(col("vec_id").as("c_id"), col("code").as("cc"))
      .join(broadcast(q), col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        bit_count(col("cc").bitwiseXOR(col("qc"))).as("ham"))
      .localCheckpoint(true)
    // bounded per-query histogram → integer ceil cut (same (cnt+den-1) div
    // den arithmetic as a04 — exact in both engines, no double fractions)
    val hist = scored.groupBy("q_id", "ham").agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy("q_id").orderBy("ham")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = hist
      .withColumn("cum", sum("n").over(wCum))
      .withColumn("cnt", sum("n").over(Window.partitionBy("q_id")))
      .where(col("cum") >= expr(s"(cnt + ${den - 1}) div $den"))
      .groupBy("q_id").agg(min("ham").as("thr"))
    val cand = scored.join(thr, "q_id").where(col("ham") <= col("thr"))
      .select("q_id", "c_id")
    rerankExact(emb, cand, k)
  }

  /** Product-quantization ANN (Jégou et al. 2011): the 64-d vector splits
    * into m contiguous subspaces; each sub-vector is coded as its nearest
    * of kCent codebook entries, so the scanned index is m small codes per
    * vector (m=8, kCent=16 → 8 nibbles — 4 bytes, vs 256 for the floats).
    * Queries scan by ADC (asymmetric distance): a per-query m×kCent table
    * of exact sub-vector distances to every codebook entry, candidate
    * distance = Σ_s table[s][code_s] — a broadcast join on (subspace,
    * code) whose build side is ≤ Q·m·kCent rows, then the top 1/den
    * fraction reranks by exact cosine.
    *
    * Codebooks are the kCent smallest-hash-draw corpus vectors' sub-vectors
    * (the seeded-sample convention of a03/i03, reproducible in any engine;
    * at real scale train them with the i03 Lloyd loop — the scan is
    * unchanged). Everything before the rerank is exact int64 over
    * floor(x·1e6+0.5) microunits, and each per-subspace argmin is a MIN
    * over the composite key dist·100+cid, so assignment ties break on cid
    * identically in both engines — no argmin/min_by semantics to match.
    *
    * Shape at 100 TB: encode and the distance table are broadcast cross
    * joins against the kCent-row codebook; the ADC scan reads only the
    * codes column and fans by queries; and the candidate cut is the a04
    * bounded-histogram construction over adist div bucket — the bucket
    * count is bounded by the VALUE RANGE (m·subDims·maxDiff²/bucket),
    * never by the corpus, so no per-query corpus-fraction sort exists
    * anywhere in the plan.
    */
  def pqTopK(emb: DataFrame, queryFilter: Column, k: Int, m: Int = 8,
             kCent: Int = 16, den: Int = 5, dims: Int = 64,
             bucket: Long = 100000000L): DataFrame = {
    val (codesLong, dt) = pqCodesAndTable(emb, queryFilter, m, kCent, dims)
    val adist = codesLong.join(broadcast(dt),
        codesLong("s") === dt("s") && codesLong("code") === dt("cid"))
      .where(col("c_id") =!= col("q_id"))
      .groupBy("q_id", "c_id").agg(sum("qd").as("adist"))
    rerankExact(emb, bucketCutCandidates(adist, den, bucket), k)
  }

  /** The PQ index artifacts shared by [[pqTopK]] and [[ivfPqTopK]]: the
    * per-vector code rows in long form (c_id, s, code) and the per-query
    * ADC distance table (q_id, s, cid, qd) — ≤ Q·m·kCent rows, always the
    * broadcast side. Exact int64 microunit arithmetic throughout; argmin
    * ties break on cid via the min(dist·100+cid) composite.
    */
  private def pqCodesAndTable(emb: DataFrame, queryFilter: Column, m: Int,
                              kCent: Int, dims: Int): (DataFrame, DataFrame) = {
    require(dims % m == 0, "subspaces must tile the vector")
    val sub = dims / m
    val e6cols = (1 to dims).map(d =>
      floor(element_at(col("embedding"), d).cast("double") * 1e6 + lit(0.5))
        .cast("long").as(s"x$d"))
    val base = emb.select(col("vec_id") +: e6cols: _*).localCheckpoint(true)
    val draw = col("vec_id") % lit(1000003L) * lit(2654435761L) % lit(1000003L)
    val wSeed = Window.orderBy(col("__d"), col("vec_id")) // kCent rows only
    val cents = base.withColumn("__d", draw)
      .orderBy(col("__d"), col("vec_id")).limit(kCent)
      .withColumn("cid", row_number().over(wSeed))
      .select(col("cid") +: (1 to dims).map(d => col(s"x$d").as(s"c$d")): _*)
    def distS(s: Int): Column = (1 to sub).map { d0 =>
      val d = s * sub + d0
      val diff = col(s"x$d") - col(s"c$d"); diff * diff
    }.reduce(_ + _)
    // encode: one map-side-combined aggregate, all m argmins in one pass
    val codeAggs = (0 until m).map(s => min(distS(s) * 100L + col("cid")).as(s"k$s"))
    val codes = base.crossJoin(broadcast(cents))
      .groupBy("vec_id").agg(codeAggs.head, codeAggs.tail: _*)
      .select(col("vec_id").as("c_id") +:
        (0 until m).map(s => (col(s"k$s") % 100).cast("int").as(s"code$s")): _*)
    // per-query ADC table, long form (q_id, s, cid, qd) — ≤ Q·m·kCent rows
    val dt = base.join(emb.where(queryFilter).select(col("vec_id")), "vec_id")
      .crossJoin(broadcast(cents))
      .select(col("vec_id").as("q_id"), col("cid"),
        explode(array((0 until m).map(s =>
          struct(lit(s).as("s"), distS(s).as("qd"))): _*)).as("e"))
      .select(col("q_id"), col("e.s").as("s"), col("cid"), col("e.qd").as("qd"))
    val codesLong = codes.select(col("c_id"),
        explode(array((0 until m).map(s =>
          struct(lit(s).as("s"), col(s"code$s").as("code"))): _*)).as("e"))
      .select(col("c_id"), col("e.s").as("s"), col("e.code").as("code"))
    (codesLong, dt)
  }

  /** Bounded bucket histogram → integer ceil cut over ADC distances (the
    * a04/a05 arithmetic): keep the top 1/den fraction by bucketed distance
    * asc. Bucket count is bounded by the value range, never the corpus.
    */
  private def bucketCutCandidates(adist: DataFrame, den: Int, bucket: Long): DataFrame = {
    // the ADC frame feeds BOTH the histogram and the candidate join —
    // unmaterialized, its whole upstream (code join + coarse stage in the
    // IVF-PQ case) would execute twice (the a04/t08 branch-recompute trap)
    val b = adist.withColumn("bk", expr(s"adist div $bucket")).localCheckpoint(true)
    val wCum = Window.partitionBy("q_id").orderBy("bk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = b.groupBy("q_id", "bk").agg(count(lit(1)).as("n"))
      .withColumn("cum", sum("n").over(wCum))
      .withColumn("cnt", sum("n").over(Window.partitionBy("q_id")))
      .where(col("cum") >= expr(s"(cnt + ${den - 1}) div $den"))
      .groupBy("q_id").agg(min("bk").as("thr"))
    b.join(thr, "q_id").where(col("bk") <= col("thr"))
      .select("q_id", "c_id")
  }

  /** IVF with data-derived centroids, assignment in SKETCH space: centroids
    * are stride-sampled corpus vectors (vec_id ≡ 7 mod 13, first nCells by
    * id — a seeded sample that any engine reproduces), and both corpus and
    * centroids are represented by their shared 32-d integer sketches (the
    * same persisted artifact a04 scans — coarse quantization in the
    * projected space, the standard IVF-on-reduced-dim construction).
    * Corpus vectors live in their best cell, queries probe their top nProbe
    * cells; the final rerank is exact full-dim cosine. The assignment is a
    * broadcast cross join with a flat 32-term int64 chain per row —
    * whole-stage codegen, no explode, ~2.5× less arithmetic than full-dim
    * microunit assignment (measured 3.5 → ~1.5 s at sf0.1).
    *
    * Cell count must scale with the corpus: the candidate stage equi-joins
    * on `cid`, so nCells IS the shuffle-key cardinality — a handful of
    * cells funnels the corpus through a handful of reducers. Default 256
    * (≈√N at the bench scale; at real scale pick 1024–4096), with nProbe
    * sized to hold the candidate fraction ≈ nProbe/nCells at the target
    * recall/cost point.
    */
  /** Lloyd k-means in sketch space — the clustering stage of semantic
    * dedup (SemDeDup: cluster embeddings, then prune near-identical
    * members within each cluster) and of a trained-IVF index build.
    *
    * Cross-engine-exact by construction: centroids are SUMS, not means —
    * ranking by dot(v, Σc)/|Σc| equals ranking by dot(v, Σc/n)/|Σc/n|
    * (the member count cancels), so no division ever happens and every
    * centroid component stays an exact int64. Scores are computed as
    * left-associated double chains identical to the SQL twin (products
    * exceed 2^53, but IEEE rounding is deterministic and both engines
    * evaluate the same expression tree). Init = the same stride-sampled
    * corpus rows as [[ivfTopK]]; iterations unroll into the oracle as one
    * CTE pair each.
    *
    * Per iteration: one broadcast cross-join assignment (k·N codegen'd
    * rows, window bounded by k rows per vector) + one map-side-combined
    * sum aggregate — no driver-side state; empty clusters drop from the
    * centroid table identically in both engines.
    */
  private def kmAssign(sk: DataFrame, cents: DataFrame, kProj: Int): DataFrame = {
    val dotChain = (0 until kProj).map(t => col(s"s$t").cast("double") * col(s"c$t")).reduce(_ + _)
    val cnormChain = (0 until kProj).map(t => col(s"c$t").cast("double") * col(s"c$t")).reduce(_ + _)
    // per-vector argmax as a map-side-combined AGGREGATE, not a window: the
    // window form exchanged and sorted all k·N scored rows per assignment
    // pass; max(struct(score, -cid)) picks the same (score desc, cid asc)
    // winner — struct ordering compares score first, then -cid, so ties
    // break to the SMALLEST cid exactly like the row_number orderBy — and
    // the broadcast cross join preserves sk's partitioning, so the
    // aggregate needs no exchange at all (guide §2.3/§2.4).
    sk.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (dotChain / sqrt(cnormChain)).as("score"))
      .groupBy("vec_id")
      .agg(max(struct(col("score"), (-col("cid")).as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("cid"))
  }

  /** A ≤ k-row MODEL ARTIFACT rebuilt as a local relation: collect the
    * trained rows and re-create them as a literal frame. Same legitimacy
    * class as the collected DSIR model (a bounded trained artifact, never
    * corpus-sized); vs localCheckpoint it truncates the per-iteration
    * lineage without a checkpoint job, and every later broadcast build is
    * a LocalTableScan instead of replaying a query stage.
    */
  private[ops] def localModel(df: DataFrame): DataFrame = {
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(df.collect(): _*)
    df.sparkSession.createDataFrame(rows, df.schema)
  }

  /** The trained sum-centroids after `iters` Lloyd rounds — shared by
    * [[kmeansSketch]] and the i12 quality report.
    */
  private def kmCents(sk: DataFrame, k: Int, iters: Int, kProj: Int): DataFrame = {
    // the seed is a ≤ k-row model artifact like every later round's
    // centroids — materializing it the same way makes ALL iterations'
    // plans shape-identical (sk × LocalRelation → aggregates), so the
    // generated-class cache compiles one round and reuses it for the rest
    var cents = localModel(
      sk.where(col("vec_id") % 13 === 7).orderBy(col("vec_id")).limit(k)
        .select(col("vec_id").as("cid") +: (0 until kProj).map(t => col(s"s$t").as(s"c$t")): _*))
    for (_ <- 1 to iters) {
      val sums = (0 until kProj).map(t => sum(col(s"s$t")).as(s"c$t"))
      cents = localModel(kmAssign(sk, cents, kProj).join(sk, "vec_id")
        .groupBy("cid").agg(sums.head, sums.tail: _*))
    }
    cents
  }

  def kmeansSketch(emb: DataFrame, k: Int = 16, iters: Int = 2, kProj: Int = 32): DataFrame = {
    val sk = sketches(emb, kProj).localCheckpoint(true)
    kmAssign(sk, kmCents(sk, k, iters, kProj), kProj)
      .select(col("vec_id"), col("cid").as("cluster"))
  }

  /** Cluster-quality audit of the [[kmeansSketch]] partition — the report
    * a pipeline reads before trusting a semantic-dedup or IVF index built
    * on these clusters (the k-means sibling of the i11 cell-balance
    * report): per cluster, member count, COHESION = mean member→centroid
    * cosine, and SEPARATION = the centroid's nearest-other-centroid
    * cosine (a Davies-Bouldin-flavored pair; cohesion high + separation
    * low = a well-separated cluster). Cosines against the SUM centroid
    * equal cosines against the mean (scale cancels); per-member values
    * floor to e6 microunits before the order-independent integer mean —
    * the sign-safe floor-mean identity (se + n·1e6) div n − 1e6 keeps
    * both engines exact for any sign.
    *
    * Shape at scale: one assignment pass (broadcast ≤k centroids), one
    * map-side-combined rollup, and a ≤k×k centroid self-join — output k
    * rows at any corpus size.
    */
  def kmeansQuality(emb: DataFrame, k: Int = 16, iters: Int = 2,
                    kProj: Int = 32): DataFrame = {
    val sk = sketches(emb, kProj).localCheckpoint(true)
    val cents = kmCents(sk, k, iters, kProj) // already a ≤ k-row local model
    val dotF = (0 until kProj).map(t => col(s"s$t").cast("double") * col(s"c$t")).reduce(_ + _)
    val knorm = (0 until kProj).map(t => col(s"s$t").cast("double") * col(s"s$t")).reduce(_ + _)
    val cnorm = (0 until kProj).map(t => col(s"c$t").cast("double") * col(s"c$t")).reduce(_ + _)
    // ONE fused pass computes the final assignment AND the member→centroid
    // cosine: the old shape ran kmAssign (a full sk×cents scan), then
    // re-joined sk and cents back just to recompute the same dot products.
    // The winner's ce6 rides the argmax struct as a trailing field —
    // (score, -cid) is already a total order per vector (cid is unique),
    // so the extra field never influences which row wins, and both the
    // score and ce6 expressions are byte-identical to the unfused forms.
    val scored = sk.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (dotF / sqrt(cnorm)).as("score"),
        floor(dotF / (sqrt(knorm) * sqrt(cnorm)) * 1e6).cast("long").as("ce6"))
    val win = scored.groupBy("vec_id")
      .agg(max(struct(col("score"), (-col("cid")).as("nc"), col("ce6"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("cid"), col("m.ce6").as("ce6"))
    val per = win
      .groupBy("cid").agg(count(lit(1)).as("n"), sum(col("ce6")).as("se"))
      .select(col("cid").as("cluster"), col("n"),
        expr("(se + n * 1000000) div n - 1000000").as("mean_cos_e6"))
    val c2 = cents.select(col("cid").as("cid2") +:
      (0 until kProj).map(t => col(s"c$t").as(s"d$t")): _*)
    val dotCC = (0 until kProj).map(t => col(s"c$t").cast("double") * col(s"d$t")).reduce(_ + _)
    val n2 = (0 until kProj).map(t => col(s"d$t").cast("double") * col(s"d$t")).reduce(_ + _)
    val nn = cents.crossJoin(broadcast(c2)).where(col("cid") =!= col("cid2"))
      .withColumn("ce6", floor(dotCC / (sqrt(cnorm) * sqrt(n2)) * 1e6).cast("long"))
      .groupBy("cid").agg(max(col("ce6")).as("nn_cent_cos_e6"))
    per.join(nn, per("cluster") === nn("cid")).drop("cid")
  }

  def ivfTopK(emb: DataFrame, queryFilter: Column, k: Int,
              nCells: Int = 256, nProbe: Int = 32, kProj: Int = 32): DataFrame =
    rerankExact(emb, ivfPairs(emb, queryFilter, nCells, nProbe, kProj), k)

  /** The IVF coarse assignment ranks shared by [[ivfTopK]]/[[ivfPqTopK]]
    * (via ivfPairs — the distinct (q_id, c_id) candidate pairs where the
    * corpus vector's best cell is among the query's nProbe probed cells;
    * see [[ivfTopK]]'s scaladoc for the shuffle-key and exactness
    * analysis) and the i11 cell-balance report: per vector, centroids
    * ranked by sketch-space cosine, cut at nProbe.
    */
  /** The shared IVF coarse artifacts: the checkpointed sketch frame and the
    * nCells stride-sampled sketch-space centroids.
    */
  private def ivfBase(emb: DataFrame, nCells: Int, kProj: Int): (DataFrame, DataFrame) = {
    val sk = sketches(emb, kProj).localCheckpoint(true)
    // ≤ nCells-row coarse-centroid model as a local relation (see
    // [[localModel]]): evaluated once instead of once per broadcast build
    val cents = localModel(
      sk.where(col("vec_id") % 13 === 7).orderBy(col("vec_id")).limit(nCells)
        .select(col("vec_id").as("cid") +: (0 until kProj).map(t => col(s"s$t").as(s"c$t")): _*))
    (sk, cents)
  }

  /** per (vector, centroid) int64 sketch dot; within a vector the rank by
    * dot/sqrt(cnorm) equals the sketch-cosine order (the vector's own norm
    * is a positive constant across its partition). |s_t| ≤ ~2e8 so the
    * 32-term product sum stays well inside int64 — exact in both engines.
    */
  private def cellScores(sk: DataFrame, cents: DataFrame, kProj: Int): DataFrame = {
    val dotChain = (0 until kProj).map(t => col(s"s$t") * col(s"c$t")).reduce(_ + _)
    val cnormChain = (0 until kProj).map(t => col(s"c$t") * col(s"c$t")).reduce(_ + _)
    sk.crossJoin(broadcast(cents))
      .withColumn("score", dotChain.cast("double") / sqrt(cnormChain.cast("double")))
      .select("vec_id", "cid", "score")
  }

  /** Corpus cell assignment (nearest coarse centroid per vector) — the
    * index-build artifact the i11 balance report audits. The per-vector
    * argmax is a map-side-combined aggregate (same (score desc, cid)
    * winner as the old rank-1 window via max(struct(score, -cid)) — see
    * [[kmAssign]]); the N×nCells scored frame never exchanges or sorts.
    */
  def ivfAssignment(emb: DataFrame, nCells: Int = 256,
                    kProj: Int = 32): DataFrame = {
    val (sk, cents) = ivfBase(emb, nCells, kProj)
    bestCellAgg(cellScores(sk, cents, kProj))
  }

  private def bestCellAgg(scores: DataFrame): DataFrame =
    scores.groupBy("vec_id")
      .agg(max(struct(col("score"), (-col("cid")).as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("cid"))

  private def ivfPairs(emb: DataFrame, queryFilter: Column,
                       nCells: Int, nProbe: Int, kProj: Int): DataFrame = {
    val (sk, cents) = ivfBase(emb, nCells, kProj)
    // corpus best cell: aggregate argmax over the checkpointed sk — one
    // no-exchange pass (the window form sorted all N×nCells rows); the
    // query probe list re-scores ONLY the query vectors (|Q|×nCells rows),
    // so its bounded rank window costs nothing at any corpus size
    val corpusCell = bestCellAgg(cellScores(sk, cents, kProj))
      .select(col("vec_id").as("c_id"), col("cid"))
    val qIds = emb.where(queryFilter).select(col("vec_id").as("q_id"))
    val qSk = sk.join(qIds, sk("vec_id") === qIds("q_id")).drop("q_id")
    val wC = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("cid"))
    val queryCells = cellScores(qSk, cents, kProj)
      .withColumn("cr", row_number().over(wC))
      .where(col("cr") <= nProbe)
      .select(col("vec_id").as("q_id"), col("cid"))
    queryCells.join(corpusCell, Seq("cid"))
      .where(col("c_id") =!= col("q_id"))
      .select("q_id", "c_id").distinct()
  }

  /** IVF-PQ (Jégou et al. 2011 §IV — the FAISS `IVFPQR`-style scale path):
    * the coarse inverted-file stage cuts the corpus to the query's probed
    * cells, the PQ-ADC stage ranks ONLY those candidates by asymmetric
    * distance and keeps the top 1/den, and the survivors rerank by exact
    * cosine. This is the composition every billion-vector deployment runs:
    * the cell equi-join bounds which code rows are read (≈ nProbe/nCells
    * of the corpus), and each read costs m code bytes, not the full
    * vector — here 4 bytes vs 256, on ~1/4 of the corpus.
    *
    * Both stages are the already-verified artifacts ([[ivfPairs]],
    * [[pqCodesAndTable]]); the glue is one equi-join on c_id (pairs fan
    * out ×m code rows) plus the broadcast ADC table keyed (q_id, s, code).
    * All exact int64 until the final cosine — the a03/a06 oracle CTEs
    * compose unchanged.
    */
  def ivfPqTopK(emb: DataFrame, queryFilter: Column, k: Int,
                nCells: Int = 256, nProbe: Int = 64, kProj: Int = 32,
                m: Int = 8, kCent: Int = 16, den: Int = 2, dims: Int = 64,
                bucket: Long = 100000000L): DataFrame = {
    val pairs = ivfPairs(emb, queryFilter, nCells, nProbe, kProj)
    val (codesLong, dt) = pqCodesAndTable(emb, queryFilter, m, kCent, dims)
    val dtr = dt.select(col("q_id").as("dq"), col("s").as("ds"),
      col("cid").as("dcid"), col("qd"))
    val adist = pairs.join(codesLong, "c_id")
      .join(broadcast(dtr),
        col("q_id") === col("dq") && col("s") === col("ds") &&
          col("code") === col("dcid"))
      .groupBy("q_id", "c_id").agg(sum("qd").as("adist"))
    rerankExact(emb, bucketCutCandidates(adist, den, bucket), k)
  }

  /** Pure sketch-space top-k ranking — the cheap retrieval RUN (no exact
    * rerank): candidates ordered by the integer sketch cosine, ties on
    * c_id. This is what a fast first-stage retriever returns; compose
    * with [[rrfFuse]] to fuse it with other runs. Same salted two-level
    * rank as [[bruteForceTopK]] — no corpus-sized per-query window.
    */
  def sketchTopK(emb: DataFrame, queryFilter: Column, k: Int,
                 kProj: Int = 32): DataFrame = {
    val sk = sketches(emb, kProj).localCheckpoint(true)
    val qs = sk.where(queryFilter)
      .select(col("vec_id").as("q_id") +: (0 until kProj).map(t => col(s"s$t").as(s"qs$t")): _*)
    val cs = sk
      .select(col("vec_id").as("c_id") +: (0 until kProj).map(t => col(s"s$t").as(s"cs$t")): _*)
    val scored = qs.join(cs, col("c_id") =!= col("q_id"))
      .withColumn("cos", floor(sketchCos(kProj, "qs", "cs") * lit(1e6)).cast("long"))
      .select("q_id", "c_id", "cos")
    topKPerQuery(scored, k)
      .select(col("q_id"), col("c_id"), col("cos").as("ski"), col("rank"))
  }

  /** Reciprocal Rank Fusion (Cormack et al. 2009): fuse several retrieval
    * runs' rankings of the same query set by score Σ 1/(kRrf + rank),
    * here in exact ppm integers (1e6 div (kRrf + rank)) so the fused
    * order is engine-exact. A doc missing from a run simply contributes
    * nothing — the standard RRF treatment. The hybrid-retrieval staple:
    * an exact dense run and a cheap sketch run disagree on tails, RRF
    * promotes docs both runs rank well.
    *
    * Shape at scale: each run is already a top-k cut, so the union holds
    * ≤ runs·k rows per query — the per-query rank window is BOUNDED, and
    * the fusion aggregate combines map-side.
    */
  def rrfFuse(runs: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    val contrib = runs.map(_.select(col("q_id"), col("c_id"),
      expr(s"1000000 div ($kRrf + rank)").as("pts"))).reduce(_ unionByName _)
    val fused = contrib.groupBy("q_id", "c_id").agg(sum(col("pts")).as("rrf_e6"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("rrf_e6").desc, col("c_id"))
    fused.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Maximal Marginal Relevance diversified top-k (Carbonell & Goldstein
    * 1998): from each query's `poolK` nearest candidates, greedily pick k
    * results maximizing λ·relevance − (1−λ)·max-similarity-to-already-
    * picked — the diversity-aware selection used to de-redundify retrieved
    * exemplars / few-shot context. The first pick is pure relevance
    * (empty selected set ⇒ the redundancy term is 0).
    *
    * Everything the greedy argmax compares is exact int64: relevance and
    * pairwise similarities are e6-rounded cosines, λ is ppm, so
    * mmr = λppm·rel_e6 − (1e6−λppm)·maxsim_e6 (≤ 7e11) and ties break on
    * min c_id — bit-identical to the unrolled DuckDB CTE twin.
    *
    * Shape at scale: the candidate pool and its pairwise similarity frame
    * are per-query BOUNDED (poolK and poolK² rows), both checkpointed once;
    * each of the k−1 greedy rounds is an equi-join + map-side-combined max
    * on (q_id, c_id) and a per-query argmax via `max(struct(...))` — an
    * aggregate, never a corpus-wide window. Work is (queries × poolK²) ×
    * k — linear in the query count, independent of corpus size after the
    * pool cut.
    */
  def mmrSelect(emb: DataFrame, queryFilter: Column, poolK: Int = 20,
                k: Int = 5, lambdaPpm: Long = 700000L): DataFrame = {
    val mu = 1000000L - lambdaPpm
    val pool = bruteForceTopK(emb, queryFilter, poolK)
      .select(col("q_id"), col("c_id"),
        round(col("cos") * 1e6).cast("long").as("rel"))
      .localCheckpoint(true)
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val av = pool.select(col("q_id"), col("c_id").as("a_id"))
      .join(e.select(col("vec_id").as("a_id"), col("v").as("av")), "a_id")
    val bv = pool.select(col("q_id"), col("c_id").as("b_id"))
      .join(e.select(col("vec_id").as("b_id"), col("v").as("bv")), "b_id")
    val sims = av.join(bv, Seq("q_id")).where(col("a_id") =!= col("b_id"))
      .select(col("q_id"), col("a_id"), col("b_id"),
        round(cosine(col("av"), col("bv")) * 1e6).cast("long").as("sim"))
      .localCheckpoint(true)
    def argmax(scored: DataFrame, pick: Int): DataFrame =
      scored.groupBy("q_id")
        .agg(max(struct(col("mmr"), (-col("c_id")).as("ni"))).as("m"))
        .select(col("q_id"), (-col("m.ni")).as("c_id"),
          lit(pick).as("pick"), col("m.mmr").as("mmr"))
    // the running selection is ≤ Q·k rows by construction — a bounded
    // result artifact; per round a local relation (localModel) replaces an
    // eager checkpoint, so each greedy round re-joins a literal table
    // instead of re-materializing a query-stage chain
    var selected = localModel(argmax(
      pool.select(col("q_id"), col("c_id"), (col("rel") * lambdaPpm).as("mmr")),
      pick = 1))
    (2 to k).foreach { i =>
      val selIds = selected.select(col("q_id"), col("c_id"))
      val cand = pool.join(selIds, Seq("q_id", "c_id"), "left_anti")
      val maxsim = sims
        .join(selIds.withColumnRenamed("c_id", "b_id"), Seq("q_id", "b_id"))
        .groupBy(col("q_id"), col("a_id").as("c_id"))
        .agg(max(col("sim")).as("maxsim"))
      val scored = cand.join(maxsim, Seq("q_id", "c_id"))
        .select(col("q_id"), col("c_id"),
          (col("rel") * lambdaPpm - col("maxsim") * mu).as("mmr"))
      selected = localModel(selected.unionByName(argmax(scored, i)))
    }
    selected
  }
}
