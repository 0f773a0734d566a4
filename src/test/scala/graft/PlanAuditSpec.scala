package graft

import org.apache.spark.sql.catalyst.plans.logical.Join
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

  test("d07 embedding near-dup joins on (label, block), not label alone") {
    val nd = DedupOps.embeddingNearDup(Tables.embeddings(spark, Sf), window = 200, minCos = 0.35)
    val joins = nd.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.exists { j =>
      val c = j.condition.map(_.toString).getOrElse("")
      c.contains("label") && c.contains("blk")
    }, "near-dup join must carry the id-block in its equi-key")
  }
}
