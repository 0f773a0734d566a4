package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Ann
import graft.sources.Tables

/** Recall of the approximate ANN paths against the brute-force baseline —
  * the accuracy/cost trade both scale paths exist to make measurable.
  */
class AnnRecallSpec extends SparkSpec {

  private def topSet(df: DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recall(approx: DataFrame, exact: DataFrame): Double = {
    val a = topSet(approx); val e = topSet(exact)
    val scores = e.map { case (q, truth) =>
      a.get(q).map(g => (g intersect truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    scores.sum / scores.size
  }

  test("LSH and IVF recall vs brute force is measurable and non-degenerate") {
    val emb = Tables.embeddings(spark, Sf)
    val qf = col("vec_id") < 20
    val exact = Ann.bruteForceTopK(emb, qf, k = 5)
    val lsh = Ann.lshTopK(emb, qf, k = 5, bits = 4)
    val ivf = Ann.ivfTopK(emb, qf, k = 5, nCells = 4)
    val rLsh = recall(lsh, exact)
    val rIvf = recall(ivf, exact)
    info(f"recall@5: lsh=$rLsh%.3f ivf=$rIvf%.3f")
    // approximate paths trade recall for a 2^bits / nCells candidate-set cut;
    // they must return full result sets and beat the random floor
    assert(topSet(lsh).size === 20 && topSet(ivf).size === 20)
    assert(rLsh > 0.05 && rLsh <= 1.0)
    assert(rIvf > 0.05 && rIvf <= 1.0)
  }
}
