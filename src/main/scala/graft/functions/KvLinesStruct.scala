package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass "Key: value" line-block extraction: one scan of the message
  * returning every requested key's value as a struct field.
  *
  * Why it exists: the declarative per-key form (`Elastic.msgValue` —
  * split + filter + element_at) is a higher-order-function chain, which is
  * CodegenFallback and re-inlines into every consumer after project
  * collapse: a 22-field sysmon layout re-splits and re-scans the same
  * message 22 times per row (SURVEY §4.3 — the same cost class
  * [[RegexpExtractStruct]] removes for grok parses). This Expression scans
  * the block once inside whole-stage codegen.
  *
  * Semantics are EXACTLY `msgValue`'s (the reference's split_message_part +
  * match-arm assignment, sysmon_csv.rs:357-360): a line splits on its FIRST
  * colon; key and value trim the `\s` class (space, tab, CR, LF, VT, FF —
  * covers CRLF payloads); lines without a colon are skipped; a repeated key
  * takes the LAST occurrence; a missing key is null. An equality law in
  * ElasticSpec holds the two forms together.
  */
case class KvLinesStruct(child: Expression, keys: Seq[String])
  extends UnaryExpression {

  @transient private lazy val keyIdx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    keys.zipWithIndex.foreach { case (k, i) => m.put(k, Integer.valueOf(i)) }
    m
  }

  override def dataType: DataType =
    StructType(keys.map(k => StructField(k, StringType, nullable = true)))

  override def prettyName: String = "kv_lines_struct"

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\u000B' || c == '\f'

  private def trimmed(s: String, from: Int, until: Int): String = {
    var a = from
    var b = until
    while (a < b && isWs(s.charAt(a))) a += 1
    while (b > a && isWs(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  /** One scan; called by both the interpreted eval and the generated code so
    * the two paths cannot diverge.
    */
  def scan(input: UTF8String): GenericInternalRow = {
    val s = input.toString
    val row = new GenericInternalRow(keys.length) // all-null start
    val len = s.length
    var start = 0
    while (start <= len) {
      var end = s.indexOf('\n', start)
      if (end < 0) end = len
      // colon search bounded to THIS line: an unbounded indexOf would
      // re-scan ahead to a later line's colon once per colonless line
      // (quadratic on adversarial blocks)
      var colon = start
      while (colon < end && s.charAt(colon) != ':') colon += 1
      if (colon < end) {
        val i = keyIdx.get(trimmed(s, start, colon))
        if (i != null)
          row.update(i.intValue(), UTF8String.fromString(trimmed(s, colon + 1, end)))
      }
      start = end + 1
    }
    row
  }

  override protected def nullSafeEval(input: Any): Any =
    scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kvLines", this, classOf[KvLinesStruct].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.scan($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): KvLinesStruct =
    copy(child = newChild)
}

object KvLinesStruct {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column API: one-pass extraction of `keys` from a "Key: value" block. */
  def of(message: Column, keys: Seq[String]): Column =
    GraftColumnBridge.column(
      KvLinesStruct(GraftColumnBridge.expression(message), keys))
}
