package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native codegen'd rolling polynomial hash over an `array<int>` token
  * column: acc = (acc·31 + t) mod 1e9+7 — an order-sensitive document
  * fingerprint (the reference fingerprints records by full-struct equality
  * for consecutive-dup detection, /root/reference/src/collector/zeek.rs:115;
  * a rolling hash is the constant-space analog for token sequences).
  *
  * Implemented as a Catalyst `UnaryExpression` with `doGenCode` so it stays
  * inside whole-stage codegen — no UDF boxing, no iterator breaks. The loop
  * reads ints straight out of the unsafe array format.
  */
case class TokenFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "token_fingerprint"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) { acc = (acc * 31L + arr.getInt(i)) % 1000000007L; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  $acc = ($acc * 31L + $c.getInt($i)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenFingerprint =
    copy(child = newChild)
}

object GraftFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "token_fingerprint" -> ((children: Seq[Expression]) => TokenFingerprint(children.head)),
    "window_hashes" -> ((children: Seq[Expression]) => WindowHashes(children(0), children(1)))
  )

  /** Register into an existing session (tests, Verify, Bench). */
  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` for
  * spark-submit deployments.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("token_fingerprint"),
      new ExpressionInfo(classOf[TokenFingerprint].getName, "token_fingerprint"),
      (children: Seq[Expression]) => TokenFingerprint(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("window_hashes"),
      new ExpressionInfo(classOf[WindowHashes].getName, "window_hashes"),
      (children: Seq[Expression]) => WindowHashes(children(0), children(1))))
  }
}
