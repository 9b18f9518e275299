package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bit-level reinterpretation (polars `Expr.reinterpret` /
  * `bin.reinterpret`, reference
  * `crates/polars-ops/src/series/ops/reinterpret.rs` and
  * `chunked_array/binary.rs`): read a value's raw bits as another dtype —
  * never a numeric cast. Modes:
  *
  *  - `"f64_bits"`: Long → Double via `Double.longBitsToDouble`
  *  - `"i64_bits"`: Double → Long via `Double.doubleToRawLongBits`
  *  - `"i64_le"` / `"i64_be"`: 8-byte Binary → Long (explicit endianness,
  *    the polars `bin.reinterpret(endianness=...)` contract)
  *
  * Codegen emits the single JVM intrinsic / fixed 8-step byte fold inline —
  * stays inside whole-stage codegen, no boxing. */
case class ReinterpretExpr(child: Expression, mode: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (mode, child.dataType) match {
    case ("f64_bits", LongType)                  => TypeCheckResult.TypeCheckSuccess
    case ("i64_bits", DoubleType)                => TypeCheckResult.TypeCheckSuccess
    case ("i64_le" | "i64_be", BinaryType)       => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: unsupported mode=$mode for ${child.dataType.simpleString} " +
        "(f64_bits: long; i64_bits: double; i64_le/i64_be: 8-byte binary)")
  }

  override def dataType: DataType = mode match {
    case "f64_bits" => DoubleType
    case _          => LongType
  }
  override def prettyName: String = "graft_reinterpret"

  protected override def nullSafeEval(input: Any): Any = mode match {
    case "f64_bits" => java.lang.Double.longBitsToDouble(input.asInstanceOf[Long])
    case "i64_bits" => java.lang.Double.doubleToRawLongBits(input.asInstanceOf[Double])
    case "i64_le"   => ReinterpretUtil.bytesToLong(input.asInstanceOf[Array[Byte]], true)
    case "i64_be"   => ReinterpretUtil.bytesToLong(input.asInstanceOf[Array[Byte]], false)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = mode match {
    case "f64_bits" =>
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = Double.longBitsToDouble($c);")
    case "i64_bits" =>
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = Double.doubleToRawLongBits($c);")
    case "i64_le" =>
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ReinterpretUtil.bytesToLong($c, true);")
    case "i64_be" =>
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ReinterpretUtil.bytesToLong($c, false);")
  }

  override protected def withNewChildInternal(newChild: Expression): ReinterpretExpr =
    copy(child = newChild)
}

object ReinterpretUtil {
  /** 8-byte array → long with explicit endianness; rejects other widths
    * (the polars contract: reinterpret is width-exact, never padded). */
  def bytesToLong(b: Array[Byte], littleEndian: Boolean): Long = {
    if (b.length != 8)
      throw new IllegalArgumentException(
        s"reinterpret expects exactly 8 bytes, got ${b.length}")
    var v = 0L
    var i = 0
    while (i < 8) {
      val shift = if (littleEndian) 8 * i else 8 * (7 - i)
      v |= (b(i).toLong & 0xffL) << shift
      i += 1
    }
    v
  }
}
