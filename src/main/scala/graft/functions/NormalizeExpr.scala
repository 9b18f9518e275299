package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (polars `str.normalize`, §2.9 — one of the few
  * string functions with no Spark builtin). Forms: NFC/NFD/NFKC/NFKD via
  * `java.text.Normalizer`; DuckDB's `nfc_normalize` reproduces the NFC form
  * for the oracle. ASCII fast path skips the (allocating) normalizer —
  * ASCII is already in every normal form, and at 100 TB most bytes are
  * ASCII. */
case class NormalizeExpr(child: Expression, form: String) extends UnaryExpression {

  private val normForm = Normalizer.Form.valueOf(form.toUpperCase)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  protected override def nullSafeEval(input: Any): Any =
    NormalizeUtil.normalize(input.asInstanceOf[UTF8String], normForm)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("form", normForm, classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeUtil.normalize($c, $f);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)
}

object NormalizeUtil {
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) {
        // non-ASCII byte found: go through the JDK normalizer
        return UTF8String.fromString(Normalizer.normalize(s.toString, form))
      }
      i += 1
    }
    s // pure ASCII is normalization-invariant in all four forms
  }
}
