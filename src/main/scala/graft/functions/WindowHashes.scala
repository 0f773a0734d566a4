package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Every n-char window hash of a string in ONE linear pass — the sliding
  * form of the per-window polynomial fold `acc = (acc·31 + cp) mod 1e9+7`
  * that d12/t11's substring-duplication signals are defined over. The
  * windowed Catalyst chain evaluates n substr+ascii nodes per POSITION
  * (O(len·n) expression work per document, the dominant cost of
  * d12_repeat_substr); the slide `h' = ((h − c_out·31^{n−1})·31 + c_in)
  * mod p` produces bit-identical values in O(len) — a pure strength
  * reduction, so the DuckDB oracle (which keeps the per-window fold at
  * gate scale) is untouched.
  *
  * All arithmetic stays in int64: h < p ≈ 1e9, code points ≤ 0x10FFFF, so
  * c·31^{n−1} mod p products peak near 1.1e15. Characters are Unicode CODE
  * POINTS on the full range including the supplementary planes — the same
  * unit Spark's `ascii(substr(...))` chain and DuckDB's fold use
  * (`ascii('😀')` = 128512 in both engines; pinned by the non-BMP case in
  * FingerprintPropSpec), never UTF-16 units. Strings shorter than n yield
  * an empty array — `explode` then drops them, matching the windowed
  * chain's `length ≥ n` guard.
  *
  * A Catalyst `BinaryExpression` with `doGenCode`, so it runs inside
  * whole-stage codegen like [[TokenFingerprint]].
  */
case class WindowHashes(left: Expression, right: Expression,
                        p: Long = 1000000007L) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  private val P = p

  override def nullSafeEval(t: Any, nv: Any): Any = {
    val cps = t.asInstanceOf[UTF8String].toString.codePoints.toArray
    val n = nv.asInstanceOf[Int]
    val m = cps.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    var h = 0L
    var j = 0
    while (j < n) { h = (h * 31L + cps(j)) % P; j += 1 }
    out(0) = h
    var pw = 1L
    j = 1
    while (j < n) { pw = pw * 31L % P; j += 1 }
    var i = 1
    while (i < m) {
      h = (h - cps(i - 1) * pw % P + P) % P
      h = (h * 31L + cps(i + n - 1)) % P
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, nv) => {
      val cps = ctx.freshName("cps")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val pw = ctx.freshName("pw")
      s"""
         |int[] $cps = $t.toString().codePoints().toArray();
         |int $m = $cps.length - $nv + 1;
         |if ($m <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$m];
         |  long $h = 0L;
         |  for (int $i = 0; $i < $nv; $i++) { $h = ($h * 31L + $cps[$i]) % ${P}L; }
         |  $out[0] = $h;
         |  long $pw = 1L;
         |  for (int $i = 1; $i < $nv; $i++) { $pw = $pw * 31L % ${P}L; }
         |  for (int $i = 1; $i < $m; $i++) {
         |    $h = ($h - (long) $cps[$i - 1] * $pw % ${P}L + ${P}L) % ${P}L;
         |    $h = ($h * 31L + $cps[$i + $nv - 1]) % ${P}L;
         |    $out[$i] = $h;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): WindowHashes =
    copy(left = l, right = r)
}

object WindowHashes {
  /** Column DSL: `WindowHashes.of(col("text"), 24)` → array<long>. The
    * modulus defaults to 1e9+7 (the d12/t11 fold); the d-series shingles
    * pass 2^31−1. Stepwise mod equals the chains' single final mod for
    * either prime — mod is a ring homomorphism.
    */
  def of(text: Column, n: Int, p: Long = 1000000007L): Column =
    GraftColumnBridge.column(WindowHashes(GraftColumnBridge.expression(text), Literal(n), p))
}
