package graft.functions

import java.time.ZoneId
import java.time.zone.ZoneRules

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, TimestampType}

/** Timezone offsets (polars `dt.base_utc_offset` / `dt.dst_offset`,
  * `py-polars/src/polars/expr/datetime.py` — chrono-tz's
  * `base_utc_offset`/`dst_offset`): for an instant and an IANA zone,
  * the zone's STANDARD (non-DST) offset and the DST savings in force,
  * in seconds. polars returns Duration columns; Spark has no duration
  * dtype, so seconds-as-long is the honest mapping (the same discipline
  * as the `dt.total_*` rows).
  *
  * `java.time.zone.ZoneRules` is the same tzdb chrono-tz compiles in.
  * The rules object is resolved once per zone at plan time and shipped
  * as a codegen reference — the hot loop is a binary search over the
  * zone's transition table, no allocation, full whole-stage codegen.
  */
case class TzOffsetExpr(child: Expression, zone: String, base: Boolean)
    extends UnaryExpression {

  @transient private lazy val rules: ZoneRules = ZoneId.of(zone).getRules

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires timestamp, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String =
    if (base) "graft_base_utc_offset" else "graft_dst_offset"

  protected override def nullSafeEval(input: Any): Any = {
    val micros = input.asInstanceOf[Long]
    if (base) TzOffsetUtil.baseOffsetSeconds(rules, micros)
    else TzOffsetUtil.dstSeconds(rules, micros)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("rules", rules, classOf[ZoneRules].getName)
    val fn = if (base) "baseOffsetSeconds" else "dstSeconds"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TzOffsetUtil.$fn($r, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TzOffsetExpr =
    copy(child = newChild)
}

object TzOffsetUtil {
  private def instant(micros: Long): java.time.Instant =
    java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)

  /** The zone's standard (winter/base) offset at the instant, seconds. */
  def baseOffsetSeconds(rules: ZoneRules, micros: Long): Long =
    rules.getStandardOffset(instant(micros)).getTotalSeconds.toLong

  /** Daylight savings in force at the instant (total − standard), seconds. */
  def dstSeconds(rules: ZoneRules, micros: Long): Long = {
    val i = instant(micros)
    (rules.getOffset(i).getTotalSeconds -
      rules.getStandardOffset(i).getTotalSeconds).toLong
  }
}
