package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project, Window => LWindow, WindowGroupLimit}
import org.apache.spark.sql.functions._

import graft.ops.DedupOps
import graft.sources.Tables

/** Physical/logical plan shape assertions for the plans whose scale
  * behavior depends on exact join/sort structure — the guarantees an
  * `explain` eyeball check would verify, encoded as tests so a refactor
  * cannot silently regress them.
  */
class PlanAuditSpec extends SparkSpec {

  test("d04 jaccard intersection join carries (doc, token) equi-keys explicitly") {
    val sh = Tables.documents(spark, Sf)
      .select(col("doc_id").cast("long").as("sid"),
        DedupOps.shingleTokens(col("text"), 8).as("stoks"))
    val pairs = DedupOps.lshCandidates(sh, "sid", col("stoks"), k = 16, r = 4)
    val jac = DedupOps.jaccard(sh, "sid", col("stoks"), pairs)
    // the intersection join's condition must bind BOTH the doc key and the
    // token equality — if the token predicate were a post-join filter, each
    // candidate pair would materialize |A|×|B| rows before filtering
    val joins = jac.queryExecution.optimizedPlan.collect { case j: Join => j }
    val tokenJoin = joins.filter { j =>
      val c = j.condition.map(_.toString).getOrElse("")
      c.contains("tok_a") && c.contains("tok_b")
    }
    assert(tokenJoin.nonEmpty, "no join carries the tok_a = tok_b key")
    tokenJoin.foreach { j =>
      val c = j.condition.get.toString
      assert(c.contains("doc_b") || c.contains("__doc_b"),
        s"token join must also key on the doc id, got: $c")
    }
  }

  test("e02 top-purchasers compiles to TakeOrderedAndProject (no global sort)") {
    val q = SparkEntry.queries("e02_top_purchasers")(spark, Sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected parallel partial top-k, plan was:\n$plan")
  }

  test("a04 sketch-rerank has no single-task corpus sort per query") {
    // every Window partitioned on q_id alone must consume a BOUNDED input:
    // either the quantized-sketch histogram (an Aggregate — per-query size
    // capped by the 2e6+1 bucket range regardless of corpus size) or the
    // salted local-rank survivors (a Filter on the __lr <= k local rank —
    // ≤ salts·k rows per query). A q_id-only window directly over the raw
    // Q×N scored pairs would sort the whole corpus in one task per query.
    val q = SparkEntry.queries("a04_ann_sketch")(spark, Sf)
    val wins = q.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.filter(_.partitionSpec.size == 1).foreach { w =>
      // walk through Project/Filter wrappers to the window's real input
      def boundedInput(p: LogicalPlan, sawLocalRankCut: Boolean): Boolean = p match {
        case _: Aggregate => true
        // rank-limit pushdown (InferWindowGroupLimit): each task prunes its
        // groups to the top `limit` rows map-side before any shuffle/sort
        case _: WindowGroupLimit => true
        case f: Filter =>
          boundedInput(f.child, sawLocalRankCut || f.condition.toString.contains("__lr"))
        case pr: Project => boundedInput(pr.child, sawLocalRankCut)
        // a stacked window adds no rows: bounded iff what feeds the stack is
        case w2: LWindow => sawLocalRankCut || boundedInput(w2.child, sawLocalRankCut)
        case _ => sawLocalRankCut
      }
      assert(boundedInput(w.child, sawLocalRankCut = false),
        s"q_id-only window over unbounded input:\n${w.child.treeString}")
    }
  }

  test("d07 embedding near-dup joins on (label, block), not label alone") {
    val nd = DedupOps.embeddingNearDup(Tables.embeddings(spark, Sf), window = 200, minCos = 0.35)
    val joins = nd.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.exists { j =>
      val c = j.condition.map(_.toString).getOrElse("")
      c.contains("label") && c.contains("blk")
    }, "near-dup join must carry the id-block in its equi-key")
  }

  test("d10 decontamination, t08 LM familiarity, s04 bloom broadcast their small side") {
    // s04's bounded side is the bloom POSITION SET (≤ m rows at any eval
    // size) — the corpus must probe it broadcast-side, never shuffle on
    // the shingle key
    for (name <- Seq("d10_decontaminate", "t08_lm_familiarity", "s04_bloom_decontam")) {
      val plan = SparkEntry.queries(name)(spark, Sf).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$name must broadcast its bounded side (eval set / LM table):\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$name fell back to a non-equi join")
    }
  }

  test("k12 temperature mix reduces the corpus before the scalar-attachment join") {
    val q = SparkEntry.queries("k12_temp_mix")(spark, Sf)
    val joins = q.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.size === 1, "expected exactly the normalizer attachment join")
    // the cross join must be |domains| × 1 — both inputs already aggregated,
    // so the corpus never reaches the nested-loop side
    joins.foreach { j =>
      def hasAgg(p: LogicalPlan): Boolean = p.collectFirst { case a: Aggregate => a }.nonEmpty
      assert(hasAgg(j.left) && hasAgg(j.right),
        s"scalar attachment over unaggregated input:\n${j.simpleString(3)}")
    }
  }

  test("k01 packing shuffles boundary fragments, not per-token rows") {
    val q = SparkEntry.queries("k01_pack")(spark, Sf)
    val plan = q.queryExecution.optimizedPlan.toString
    // the cut must slice token ARRAYS per covered sequence (O(docs +
    // fragments) exchange rows); a posexplode of the token column would
    // put one row per token through the shuffle — several× corpus size
    assert(!plan.toLowerCase.contains("posexplode"),
      s"per-token explode leaked back into the packing plan:\n$plan")
    assert(plan.contains("slice("), s"expected array-slice fragments:\n$plan")
  }

  test("d14 span merge windows are per-document and its count join is an equi-join") {
    val q = SparkEntry.queries("d14_dup_spans")(spark, Sf)
    val plan = q.queryExecution
    // every window partitions on the document id — its state is bounded by
    // one document's length, never the corpus
    val wins = plan.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      assert(w.partitionSpec.exists(_.toString.contains("sid")),
        s"d14 window not partitioned by sid:\n${w.partitionSpec}")
    }
    // the shared-position probe is a hash equi-join on the window hash
    val phys = plan.executedPlan.toString
    assert(!phys.contains("CartesianProduct") &&
      !phys.contains("BroadcastNestedLoopJoin"), s"non-equi join in d14:\n$phys")
  }

  test("d16 canonicalization has no per-cluster window sort and no cartesian") {
    val q = SparkEntry.queries("d16_cluster_canon")(spark, Sf)
    val plan = q.queryExecution
    // representative choice is an aggregate (max struct), NOT a window — a
    // pathologically large component must never become one task's sort
    assert(plan.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "d16 should pick representatives via aggregate, not a window")
    val phys = plan.executedPlan.toString
    assert(!phys.contains("CartesianProduct") &&
      !phys.contains("BroadcastNestedLoopJoin"), s"non-equi join in d16:\n$phys")
  }

  test("d17 line dedup joins on the fixed-width md5 key, never the raw line (300-copy footer)") {
    import spark.implicits._
    // a planted boilerplate footer: ~1.9 KB of text appearing in 300 docs —
    // the hot-key-and-long-key combination that made the raw-line join the
    // one perf_weak construct of round 5
    val footer = "accept cookies and subscribe to our newsletter " * 40
    val framed = (1 to 300).map(i => (i.toLong, s"unique body $i\n$footer\nalso unique $i"))
      .toDF("did", "raw")
    val out = graft.ops.CurationOps.lineDedup(framed, maxDocFreq = 2)
    val rows = out.collect()
    assert(rows.length == 300 &&
      rows.forall(r => r.getAs[Long]("n_lines") == 3 &&
        r.getAs[Long]("kept") == 2 && r.getAs[Long]("dropped") == 1),
      "every doc keeps its 2 unique lines and drops the footer")
    // the doc-frequency join and distinct must key on lh (md5, fixed 32
    // chars) — keyed on the raw line, each of the footer's 300 occurrences
    // would carry its ~1.9 KB text into one shuffle partition
    val joins = out.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      val c = j.condition.map(_.toString).getOrElse("")
      assert(c.contains("lh#"), s"join must key on the md5 hash, got: $c")
      assert(!c.contains("line#"), s"raw line text used as a join key: $c")
    }
    val aggs = out.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    aggs.foreach { a =>
      assert(!a.groupingExpressions.exists(_.toString.contains("line#")),
        s"raw line text used as a grouping key:\n${a.groupingExpressions}")
    }
  }

  test("k10 token-budget selection has no window over corpus-sized input") {
    val q = SparkEntry.queries("k10_token_budget")(spark, Sf)
    val wins = q.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    // every window must sit above an Aggregate (the ≤101-row band table)
    wins.foreach { w =>
      def aggBelow(p: LogicalPlan): Boolean = p match {
        case _: Aggregate => true
        case f: Filter => aggBelow(f.child)
        case pr: Project => aggBelow(pr.child)
        case j: Join => j.children.exists(aggBelow)
        case _ => false
      }
      assert(aggBelow(w.child),
        s"k10 window runs over non-aggregated (corpus-sized) input:\n${w.child.treeString}")
    }
  }
}
