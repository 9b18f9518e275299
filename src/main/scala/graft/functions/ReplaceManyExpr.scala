package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern literal replace in ONE pass over the string — polars
  * `str.replace_many` (reference
  * `crates/polars-ops/src/chunked_array/strings/find_many.rs:1-37,71+`,
  * Aho-Corasick with `MatchKind::LeftmostFirst`).
  *
  * Semantics (leftmost-first, matching the reference exactly):
  *   - scan positions left to right; the first position where ANY pattern
  *     matches wins (leftmost);
  *   - if several patterns match at that position, the one EARLIEST in the
  *     pattern list wins (first, not longest — `["Sam","Samwise"]` on
  *     `"Samwise"` replaces `"Sam"`);
  *   - the scan resumes AFTER the replaced span: replacement text is never
  *     rescanned, so `replace_many(["ab"->"ba"])` terminates and
  *     `["a"->"b","b"->"c"]` maps `"ab"` to `"bc"`, not `"cc"`.
  *
  * The chained-`replace` composition ([[graft.functions.replaceManyChained]])
  * differs on exactly those cascading/overlapping cases AND rescans the
  * string once per pattern — O(patterns) passes. This expression walks a
  * byte-trie built once on the driver: independent of pattern COUNT
  * (one shared trie descent per position, O(max pattern length) worst case,
  * O(1) typical — most positions miss on the first byte), the right shape
  * for PII-scrub lists with hundreds of patterns at 100 TB.
  *
  * Byte-level matching is UTF-8-safe: a valid pattern starts with a lead
  * byte, which can never equal a continuation byte, so matches always start
  * on a codepoint boundary. `asciiCaseInsensitive` mirrors the reference
  * flag (ASCII letters only; case folding preserves byte length).
  */
case class ReplaceManyExpr(
    child: Expression,
    patterns: Seq[String],
    replacements: Seq[String],
    asciiCaseInsensitive: Boolean = false)
  extends UnaryExpression {

  require(patterns.nonEmpty, "replace_many requires at least one pattern")
  require(patterns.length == replacements.length,
    s"patterns (${patterns.length}) and replacements (${replacements.length}) must align")
  require(patterns.forall(_.nonEmpty), "empty patterns are not allowed")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_replace_many"

  @transient private lazy val automaton: ReplaceManyUtil.Automaton =
    ReplaceManyUtil.build(patterns.toArray, replacements.toArray, asciiCaseInsensitive)

  override def nullSafeEval(input: Any): Any =
    ReplaceManyUtil.run(input.asInstanceOf[UTF8String], automaton)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val auto = ctx.addReferenceObj("automaton", automaton,
      classOf[ReplaceManyUtil.Automaton].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ReplaceManyUtil.run($c, $auto)")
  }

  override protected def withNewChildInternal(newChild: Expression): ReplaceManyExpr =
    copy(child = newChild)
}

/** polars `str.contains_any` (reference `find_many.rs:39-69`): true iff ANY
  * of the literal patterns occurs. Same automaton as [[ReplaceManyExpr]],
  * with early exit on the first hit. */
case class ContainsAnyExpr(
    child: Expression,
    patterns: Seq[String],
    asciiCaseInsensitive: Boolean = false)
  extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "contains_any requires non-empty patterns")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_contains_any"

  @transient private lazy val automaton: ReplaceManyUtil.Automaton =
    ReplaceManyUtil.build(patterns.toArray, patterns.toArray, asciiCaseInsensitive)

  override def nullSafeEval(input: Any): Any =
    ReplaceManyUtil.containsAny(input.asInstanceOf[UTF8String], automaton)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val auto = ctx.addReferenceObj("automaton", automaton,
      classOf[ReplaceManyUtil.Automaton].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ReplaceManyUtil.containsAny($c, $auto)")
  }

  override protected def withNewChildInternal(newChild: Expression): ContainsAnyExpr =
    copy(child = newChild)
}

/** polars `str.extract_many` / `str.find_many` (reference
  * `find_many.rs:143-230`): all pattern occurrences as a list — the matched
  * substrings (`findStarts = false`) or their UTF-8 byte start offsets
  * (`findStarts = true`, the reference's u32 offsets). `overlapping = false`
  * scans leftmost-first and resumes after each match (consistent with
  * [[ReplaceManyExpr]]); `overlapping = true` reports every match of every
  * pattern, ordered by (end offset, pattern index) like
  * `find_overlapping_iter`. */
case class ExtractManyExpr(
    child: Expression,
    patterns: Seq[String],
    asciiCaseInsensitive: Boolean = false,
    overlapping: Boolean = false,
    findStarts: Boolean = false)
  extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "extract_many requires non-empty patterns")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString}")
  }
  override def dataType: DataType =
    if (findStarts) ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
    else ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (findStarts) "graft_find_many" else "graft_extract_many"

  @transient private lazy val automaton: ReplaceManyUtil.Automaton =
    ReplaceManyUtil.build(patterns.toArray, patterns.toArray, asciiCaseInsensitive)

  override def nullSafeEval(input: Any): Any =
    ReplaceManyUtil.extractMany(input.asInstanceOf[UTF8String], automaton,
      overlapping, findStarts)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val auto = ctx.addReferenceObj("automaton", automaton,
      classOf[ReplaceManyUtil.Automaton].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ReplaceManyUtil.extractMany($c, $auto, $overlapping, $findStarts)")
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractManyExpr =
    copy(child = newChild)
}

/** Trie build + single-pass runner for [[ReplaceManyExpr]] and friends —
  * called from generated code. */
object ReplaceManyUtil {

  /** Byte trie with first-listed-pattern terminal priority. `next` is a
    * flattened (node, byte) -> node table (-1 = no edge); `term(node)` is
    * the smallest pattern index terminating at `node` (-1 = none). */
  final class Automaton(
      val next: Array[Int],
      val term: Array[Int],
      val patLen: Array[Int],
      val repl: Array[Array[Byte]]) extends Serializable

  def build(patterns: Array[String], replacements: Array[String],
            asciiCaseInsensitive: Boolean): Automaton = {
    val nodes = scala.collection.mutable.ArrayBuffer(new Array[Int](256))
    java.util.Arrays.fill(nodes(0), -1)
    val terms = scala.collection.mutable.ArrayBuffer(-1)
    val patLen = new Array[Int](patterns.length)

    def edge(node: Int, b: Int): Int = {
      var to = nodes(node)(b)
      if (to < 0) {
        to = nodes.length
        val row = new Array[Int](256)
        java.util.Arrays.fill(row, -1)
        nodes += row
        terms += -1
        nodes(node)(b) = to
        // case-insensitive: both cases of an ASCII letter share the edge
        if (asciiCaseInsensitive) {
          val other =
            if (b >= 'a' && b <= 'z') b - 32
            else if (b >= 'A' && b <= 'Z') b + 32
            else -1
          if (other >= 0) nodes(node)(other) = to
        }
      }
      to
    }

    var i = 0
    while (i < patterns.length) {
      val bytes = patterns(i).getBytes("UTF-8")
      patLen(i) = bytes.length
      var node = 0
      var j = 0
      while (j < bytes.length) {
        node = edge(node, bytes(j) & 0xff)
        j += 1
      }
      if (terms(node) < 0) terms(node) = i // duplicates: first listed wins
      i += 1
    }

    val flat = new Array[Int](nodes.length * 256)
    i = 0
    while (i < nodes.length) {
      System.arraycopy(nodes(i), 0, flat, i * 256, 256)
      i += 1
    }
    new Automaton(flat, terms.toArray, patLen,
      replacements.map(_.getBytes("UTF-8")))
  }

  /** Leftmost-first single pass. At each position, walk the trie as deep as
    * the input allows, keeping the smallest pattern index seen at any
    * terminal; on a match, emit the replacement and jump past the MATCHED
    * pattern's bytes (never rescanning the replacement). */
  def run(s: UTF8String, a: Automaton): UTF8String = {
    val in = s.getBytes
    val n = in.length
    var out: Array[Byte] = null // allocated lazily: no match -> return input
    var outLen = 0

    def ensure(extra: Int): Unit = {
      if (out == null) out = new Array[Byte](math.max(n + 16, outLen + extra))
      else if (outLen + extra > out.length)
        out = java.util.Arrays.copyOf(out, math.max(out.length * 2, outLen + extra))
    }

    var i = 0
    var copyFrom = 0 // start of the pending verbatim span
    while (i < n) {
      var node = a.next(in(i) & 0xff)
      if (node < 0) {
        i += 1 // fast path: no pattern starts here
      } else {
        var best = a.term(node)
        var j = i + 1
        while (j < n && node >= 0) {
          node = a.next(node * 256 + (in(j) & 0xff))
          if (node >= 0) {
            val t = a.term(node)
            if (t >= 0 && (best < 0 || t < best)) best = t
            j += 1
          }
        }
        if (best < 0) {
          i += 1
        } else {
          val span = i - copyFrom
          val r = a.repl(best)
          ensure(span + r.length)
          System.arraycopy(in, copyFrom, out, outLen, span)
          outLen += span
          System.arraycopy(r, 0, out, outLen, r.length)
          outLen += r.length
          i += a.patLen(best)
          copyFrom = i
        }
      }
    }
    if (out == null) s // zero matches: return the input untouched
    else {
      val span = n - copyFrom
      ensure(span)
      System.arraycopy(in, copyFrom, out, outLen, span)
      outLen += span
      UTF8String.fromBytes(out, 0, outLen)
    }
  }

  /** Any pattern present? Early-exits on the first terminal reached. */
  def containsAny(s: UTF8String, a: Automaton): Boolean = {
    val in = s.getBytes
    val n = in.length
    var i = 0
    while (i < n) {
      var node = a.next(in(i) & 0xff)
      var j = i + 1
      while (node >= 0) {
        if (a.term(node) >= 0) return true
        if (j >= n) node = -1
        else { node = a.next(node * 256 + (in(j) & 0xff)); j += 1 }
      }
      i += 1
    }
    false
  }

  /** All matches as substrings or byte-start offsets.
    * Non-overlapping: leftmost-first scan, resume after each match.
    * Overlapping: every (start, pattern) hit, ordered by (end, pattern
    * index) to mirror aho-corasick's find_overlapping_iter. */
  def extractMany(s: UTF8String, a: Automaton,
                  overlapping: Boolean, findStarts: Boolean): GenericArrayData = {
    val in = s.getBytes
    val n = in.length
    val acc = new scala.collection.mutable.ArrayBuffer[Long](8) // (end<<32 | pat)
    var i = 0
    while (i < n) {
      var node = a.next(in(i) & 0xff)
      var j = i + 1
      var best = -1
      while (node >= 0) {
        val t = a.term(node)
        if (t >= 0) {
          if (overlapping) acc += (j.toLong << 32) | t.toLong
          else if (best < 0 || t < best) best = t
        }
        if (j >= n) node = -1
        else { node = a.next(node * 256 + (in(j) & 0xff)); j += 1 }
      }
      if (!overlapping && best >= 0) {
        acc += ((i + a.patLen(best)).toLong << 32) | best.toLong
        i += a.patLen(best)
      } else i += 1
    }
    val arr = acc.toArray
    if (overlapping) java.util.Arrays.sort(arr) // (end, patIdx) order
    val out = new Array[Any](arr.length)
    var k = 0
    while (k < arr.length) {
      val end = (arr(k) >>> 32).toInt
      val pat = (arr(k) & 0xffffffffL).toInt
      val start = end - a.patLen(pat)
      out(k) =
        if (findStarts) start
        else UTF8String.fromBytes(in, start, a.patLen(pat))
      k += 1
    }
    new GenericArrayData(out)
  }
}
