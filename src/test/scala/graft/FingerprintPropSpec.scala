package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** ScalaCheck property: the codegen'd TokenFingerprint equals the pure-Scala
  * fold on arbitrary int arrays — including empty arrays, negative token
  * ids, and Int extremes (the codegen and interpreted paths share one
  * semantics).
  */
class FingerprintPropSpec extends SparkSpec {
  import spark.implicits._

  private def scalaFold(ts: Seq[Int]): Long =
    ts.foldLeft(0L)((acc, t) => (acc * 31L + t) % 1000000007L)

  test("token_fingerprint == scala fold on 200 arbitrary arrays (incl. empty/negative/extreme)") {
    val genArr = Gen.listOf(Gen.oneOf(
      Gen.chooseNum(Int.MinValue, Int.MaxValue), Gen.chooseNum(-10, 10)))
    val samples: Seq[Seq[Int]] =
      Gen.listOfN(197, genArr).sample.get.map(_.toSeq) ++
        Seq(Seq.empty[Int], Seq(Int.MinValue), Seq(Int.MaxValue, Int.MinValue, 0))
    val df = samples.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "tokens")
    val got = df.select(expr("token_fingerprint(tokens)")).as[Long].collect()
    val want = samples.map(scalaFold)
    assert(got.toSeq === want)
  }
}
