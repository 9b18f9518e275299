package graft.testing

import org.apache.spark.sql.DataFrame

/** Frame-equality assertions (reference `py-polars/src/polars/testing/` —
  * `assert_frame_equal` / `assert_frame_not_equal`): the public testing
  * surface a reference user's test suite depends on.
  *
  * DRIVER-BOUNDED BY CONTRACT, like the reference: both frames are
  * collected. This is a test utility for fixture-sized data — comparing
  * two big frames distributedly is `a.exceptAll(b).isEmpty` twice, which
  * the library's own specs use.
  */
object Assertions {

  final class FrameNotEqualError(msg: String) extends AssertionError(msg)

  /** polars assert_frame_equal. `checkRowOrder=false` (sort both before
    * comparing) mirrors check_row_order; `checkDtypes` mirrors
    * check_dtype; `rtol`/`atol` apply to float comparisons. */
  def assertFrameEqual(left: DataFrame, right: DataFrame,
                       checkRowOrder: Boolean = true,
                       checkDtypes: Boolean = true,
                       rtol: Double = 1e-5, atol: Double = 1e-8): Unit = {
    val lc = left.columns.toSeq
    val rc = right.columns.toSeq
    if (lc != rc)
      throw new FrameNotEqualError(s"column names differ: $lc vs $rc")
    if (checkDtypes) {
      val lt = left.schema.fields.map(f => f.name -> f.dataType.simpleString)
      val rt = right.schema.fields.map(f => f.name -> f.dataType.simpleString)
      val diff = lt.zip(rt).filter { case (a, b) => a != b }
      if (diff.nonEmpty)
        throw new FrameNotEqualError(s"dtypes differ: ${diff.mkString(", ")}")
    }
    val lRows = left.collect().map(_.toSeq)
    val rRows = right.collect().map(_.toSeq)
    if (lRows.length != rRows.length)
      throw new FrameNotEqualError(
        s"row counts differ: ${lRows.length} vs ${rRows.length}")
    // Sort order: SCHEMA-driven — non-float columns compare first (exact,
    // injective renders), float-typed columns last and NUMERICALLY
    // (java.lang.Double total order — NaN and -0.0 sort deterministically).
    // Floats must stay LAST: a float column ahead of a discriminating
    // exact column would mis-pair rows whose float cells differ only
    // within rtol/atol (the two sides sort them differently, then the
    // exact column falsely mismatches). Float-ness comes from the COLUMN
    // type, not the runtime value, so a null float cell stays aligned with
    // its column instead of migrating to a different key group (which
    // truncated the compare and made distinct rows tie).
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    def isFloatType(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt == DoubleType || dt == FloatType
    val floatCol: Array[Boolean] =
      left.schema.fields.zip(right.schema.fields).map { case (l, r) =>
        isFloatType(l.dataType) && isFloatType(r.dataType)
      }
    val colOrder: Array[Int] = // stable sort: non-float columns first
      left.schema.indices.toArray.sortBy(i => floatCol(i))
    def toD(v: Any): Double = v match {
      case d: Double => d
      case f: Float  => f.toDouble
    }
    // Canonical render for non-float cells: length-prefixed elements make
    // the render INJECTIVE over nested shapes — a plain toString would
    // collide e.g. Seq("a, b") with Seq("a", "b") (the separator is data),
    // and colliding renders tie in the sort, mis-pairing rows across the
    // two (differently ordered) inputs. Matches scala.collection.Seq so
    // Spark's mutable.ArraySeq array cells take the recursive path; binary
    // cells render by content (Array[Byte].toString is an identity hash —
    // nondeterministic and never equal across instances).
    def render(v: Any): String = v match {
      case null => "n" // tag prefixes keep null, the string "n", and seqs distinct
      case s: scala.collection.Seq[_] =>
        s.map(render).map(e => e.length + ":" + e).mkString("[", ",", "]")
      case b: Array[Byte] => "B" + java.util.Arrays.toString(b)
      case r: org.apache.spark.sql.Row => "R" + render(r.toSeq)
      case other => "v" + String.valueOf(other)
    }
    object RowOrd extends Ordering[Seq[Any]] {
      private def cell(isFloat: Boolean, x: Any, y: Any): Int = (x, y) match {
        case (null, null) => 0
        case (null, _)    => -1
        case (_, null)    => 1
        case _ if isFloat => java.lang.Double.compare(toD(x), toD(y))
        case _            => render(x).compareTo(render(y))
      }
      def compare(a: Seq[Any], b: Seq[Any]): Int = {
        var k = 0
        while (k < colOrder.length) {
          val i = colOrder(k)
          val c = cell(floatCol(i), a(i), b(i)); if (c != 0) return c
          k += 1
        }
        0
      }
    }
    val (ls, rs) =
      if (checkRowOrder) (lRows, rRows)
      else (lRows.sorted(RowOrd), rRows.sorted(RowOrd))
    def near(a: Double, b: Double): Boolean =
      // the a == b fast path is what admits equal infinities — their
      // difference is NaN, which fails every tolerance test
      a == b || (a.isNaN && b.isNaN) ||
        math.abs(a - b) <= atol + rtol * math.abs(b)
    def same(a: Any, b: Any): Boolean = (a, b) match {
      case (null, null) => true
      case (null, _) | (_, null) => false
      case (x: Double, y: Double) => near(x, y)
      case (x: Float, y: Float) => near(x.toDouble, y.toDouble)
      // scala.collection.Seq: Spark's collected array cells are
      // mutable.ArraySeq, which the 2.13 immutable Seq alias won't match —
      // they'd fall to ==, losing per-element float tolerance
      case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
        x.length == y.length && x.lazyZip(y).forall { case (p, q) => same(p, q) }
      // Array[Byte] has reference ==; compare binary cells by content
      case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
      case (x: org.apache.spark.sql.Row, y: org.apache.spark.sql.Row) =>
        same(x.toSeq, y.toSeq)
      case (x, y) => x == y
    }
    ls.zip(rs).zipWithIndex.foreach { case ((a, b), i) =>
      a.zip(b).zipWithIndex.foreach { case ((x, y), j) =>
        if (!same(x, y))
          throw new FrameNotEqualError(
            s"row $i col ${lc(j)}: $x != $y (rtol=$rtol atol=$atol)")
      }
    }
  }

  /** polars assert_frame_not_equal. */
  def assertFrameNotEqual(left: DataFrame, right: DataFrame,
                          checkRowOrder: Boolean = true,
                          checkDtypes: Boolean = true,
                          rtol: Double = 1e-5, atol: Double = 1e-8): Unit = {
    val equal =
      try { assertFrameEqual(left, right, checkRowOrder, checkDtypes, rtol, atol); true }
      catch { case _: FrameNotEqualError => false }
    if (equal) throw new FrameNotEqualError("frames are equal; expected not equal")
  }

  /** polars assert_series_equal: a series is a one-column frame here (the
    * repo has no separate Series type — the Spark analogue of a polars
    * Series is a single-column Dataset). `checkNames=false` mirrors
    * check_names by comparing under a neutral name. Frames with more than
    * one column are rejected rather than silently projected. */
  def assertSeriesEqual(left: DataFrame, right: DataFrame,
                        checkNames: Boolean = true,
                        checkRowOrder: Boolean = true,
                        checkDtypes: Boolean = true,
                        rtol: Double = 1e-5, atol: Double = 1e-8): Unit = {
    def single(df: DataFrame, side: String): DataFrame = {
      if (df.columns.length != 1)
        throw new FrameNotEqualError(
          s"$side is not a series: ${df.columns.length} columns")
      if (checkNames) df else df.toDF("__series")
    }
    assertFrameEqual(single(left, "left"), single(right, "right"),
      checkRowOrder, checkDtypes, rtol, atol)
  }

  /** polars assert_series_not_equal. */
  def assertSeriesNotEqual(left: DataFrame, right: DataFrame,
                           checkNames: Boolean = true,
                           checkRowOrder: Boolean = true,
                           checkDtypes: Boolean = true,
                           rtol: Double = 1e-5, atol: Double = 1e-8): Unit = {
    val equal =
      try {
        assertSeriesEqual(left, right, checkNames, checkRowOrder,
          checkDtypes, rtol, atol); true
      } catch { case _: FrameNotEqualError => false }
    if (equal) throw new FrameNotEqualError("series are equal; expected not equal")
  }
}
