package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Retrieval

/** ScalaCheck properties: the distributed BM25 and tf-idf keyword
  * operators equal sequential single-threaded references on arbitrary
  * corpora — repeated terms, docs with no query terms, empty-ish docs,
  * tied frequencies. The references evaluate the SAME double chains, so
  * equality is exact (e6-floored), not approximate.
  */
class RetrievalPropSpec extends SparkSpec {
  import spark.implicits._

  private val Vocab = Vector("hash", "join", "scan", "merge", "sort", "row",
    "key", "agg", "spark", "window", "batch", "filter")
  private val Terms = Seq("hash", "merge", "window", "spark")

  private def genCorpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val genDoc = for {
      n <- Gen.chooseNum(1, 24)
      ws <- Gen.listOfN(n, Gen.oneOf(Vocab))
    } yield ws.mkString(" ")
    Gen.listOfN(nDocs, genDoc)
      .pureApply(Gen.Parameters.default, Seed(seed)).zipWithIndex
      .map { case (t, i) => ((i + 1).toLong, t) }
  }

  private def words(t: String): Seq[String] = t.split(" ").filter(_.nonEmpty).toSeq

  test("bm25TopK == sequential reference on random corpora (3 seeds)") {
    val (k1, b) = (1.2, 0.75)
    Seq(7L, 21L, 99L).foreach { seed =>
      val corpus = genCorpus(seed, 60)
      val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), Terms, k = 60)
        .as[(Long, Long)].collect().toMap
      // sequential reference, same chains
      val lens = corpus.map { case (id, t) => id -> words(t).size.toLong }.toMap
      val n = corpus.size.toLong
      val avgdl = lens.values.sum.toDouble / n.toDouble
      val tf = corpus.flatMap { case (id, t) =>
        words(t).filter(Terms.contains).groupBy(identity).map { case (w, g) => (id, w, g.size.toLong) }
      }
      val df = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      def idf(d: Long): Double = ((n - d).toDouble + 0.5) / (d.toDouble + 0.5)
      def tfn(f: Long, len: Long): Double =
        (f.toDouble * (k1 + 1)) / (f.toDouble + k1 * ((1 - b) + b * (len.toDouble / avgdl)))
      val byDoc = tf.groupBy(_._1).view.mapValues(_.map { case (_, w, f) => w -> f }.toMap)
      val exp = byDoc.map { case (id, m) =>
        val score = Terms.map(t => m.get(t).map(f => idf(df(t)) * tfn(f, lens(id))).getOrElse(0.0))
          .reduceLeft(_ + _)
        id -> math.floor(score * 1e6).toLong
      }.toMap
      assert(got === exp, s"seed $seed")
    }
  }

  test("tfidfKeywords == sequential reference on random corpora (3 seeds)") {
    Seq(5L, 13L, 77L).foreach { seed =>
      val corpus = genCorpus(seed, 40)
      val got = Retrieval.tfidfKeywords(corpus.toDF("doc_id", "text"), m = 3)
        .select("did", "term", "rank", "score_e6")
        .as[(Long, String, Int, Long)].collect().toSet
      val n = corpus.size.toLong
      val tf = corpus.map { case (id, t) =>
        id -> words(t).groupBy(identity).view.mapValues(_.size.toLong).toMap
      }.toMap
      val df = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val exp = tf.flatMap { case (id, m) =>
        val scored = m.toSeq.map { case (w, f) =>
          (w, f.toDouble * (((n - df(w)).toDouble + 0.5) / (df(w).toDouble + 0.5)))
        }.sortBy { case (w, s) => (-s, w) }.take(3)
        scored.zipWithIndex.map { case ((w, s), i) =>
          (id, w, i + 1, math.floor(s * 1e6).toLong)
        }
      }.toSet
      assert(got === exp, s"seed $seed")
    }
  }
}
