package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Templates
import graft.streaming.Templates.{NfRec, TplState}

/** Template-driven stateful decode (NetFlow v9 TemplatesBox analog):
  * cross-batch state via flatMapGroupsWithState, order within a group by
  * seq, data-before-template emitted undecoded (reference counts & skips —
  * /root/reference/src/parser/netflow.rs:125-137).
  */
class TemplatesSpec extends SparkSpec {
  import spark.implicits._

  private def tpl(exp: String, tid: Int, seq: Long, widths: Seq[Int]) =
    NfRec(exp, tid, seq, isTemplate = true, widths, "")
  private def dat(exp: String, tid: Int, seq: Long, payload: String) =
    NfRec(exp, tid, seq, isTemplate = false, Seq.empty, payload)

  test("batch fold: template in force at each seq decodes; redefinition applies forward") {
    val recs = Seq(
      tpl("e1", 256, 1, Seq(4, 4)),            // u16,u16 as 4 hex chars each
      dat("e1", 256, 2, "00ff0010"),           // → 255, 16
      tpl("e1", 256, 3, Seq(8)),               // redefinition: one u32
      dat("e1", 256, 4, "000000ff"),           // → 255
      dat("e1", 999, 5, "dead"),               // unknown template → undecoded
      dat("e2", 256, 1, "beef")                // other exporter: no template yet
    )
    val out = Templates.decodeBatch(spark.createDataset(recs))
      .collect().map(d => (d.exporter, d.seq) -> (d.decoded, d.fields.toList)).toMap
    assert(out(("e1", 2L)) === (true, List(255L, 16L)))
    assert(out(("e1", 4L)) === (true, List(255L)))
    assert(out(("e1", 5L)) === (false, Nil))
    assert(out(("e2", 1L)) === (false, Nil))
  }

  test("foldGroup is order-insensitive to input permutation (sorts by seq)") {
    val recs = Seq(
      dat("e1", 7, 2, "0a0b"),
      tpl("e1", 7, 1, Seq(2, 2)))
    val (out, st) = Templates.foldGroup(recs.reverseIterator, TplState(Map.empty))
    assert(out.head.fields === Seq(10L, 11L))
    assert(st.widths(7) === Seq(2, 2))
  }

  test("streaming: template from batch 1 decodes data arriving in batch 2 (state persists)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[NfRec]
    val q = Templates.decodeStream(mem.toDS()).writeStream
      .format("memory").queryName("tpl_out").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(tpl("e1", 300, 1, Seq(4)), dat("e1", 300, 2, "00aa"))
      q.processAllAvailable()
      mem.addData(dat("e1", 300, 3, "00bb")) // no template in this batch — state must carry it
      q.processAllAvailable()
      val rows = spark.table("tpl_out").as[Templates.NfDecoded]
        .collect().map(d => d.seq -> (d.decoded, d.fields.toList)).toMap
      assert(rows(2L) === (true, List(170L)))
      assert(rows(3L) === (true, List(187L)))
    } finally q.stop()
  }
}
