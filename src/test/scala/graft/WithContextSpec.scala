package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dsl.LazyFrame

/** LazyFrame.withContext — the two examples from the reference docs
  * (py-polars `LazyFrame.with_context`, frame.py:7055), plus the
  * null-padding contract for a context longer than the frame.
  */
class WithContextSpec extends SparkSpec {
  import spark.implicits._

  test("string concat with context .first() broadcast (reference example 1)") {
    // lf: a=[1,2,3], b=["a","c",null]; ctx: c=["foo","ham"]
    // select(col("b") + col("c").first()) → ["afoo", "cfoo", null]
    val lf = LazyFrame(Seq((1, Some("a")), (2, Some("c")), (3, None))
      .toDF("a", "b"))
    val ctx = LazyFrame(Seq((1, "foo"), (2, "ham")).toDF("ci", "c"))
    val out = lf.withContext(col("a"), (ctx, col("ci")))
      .select(concat(col("b"),
        first(col("c"), ignoreNulls = false)
          .over(Window.orderBy(col("a")))).as("bc"))
      .sort(col("bc").asc_nulls_last).df.collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("afoo"), Some("cfoo"), None))
  }

  test("fill_null from a context frame's median (reference example 2)") {
    // test: feature_0=[-1.0, null, 1]; ctx train: feature_0_train=[-1.0,0,1]
    // fill_null(col("feature_0"), col("feature_0_train").median()) → [-1,0,1]
    val test_ = LazyFrame(Seq((1, Some(-1.0)), (2, None), (3, Some(1.0)))
      .toDF("i", "feature_0"))
    val train = LazyFrame(Seq((1, -1.0), (2, 0.0), (3, 1.0))
      .toDF("ti", "feature_0_train"))
    val out = test_.withContext(col("i"), (train, col("ti")))
      .select(col("i"), coalesce(col("feature_0"),
        median(col("feature_0_train")).over(Window.partitionBy())).as("f"))
      .sort(col("i")).df.collect().map(_.getDouble(1))
    assert(out.toSeq == Seq(-1.0, 0.0, 1.0))
  }

  test("context longer than the frame null-pads the frame side") {
    val lf = LazyFrame(Seq((1, "x")).toDF("a", "b"))
    val ctx = LazyFrame(Seq((1, 10L), (2, 20L)).toDF("ci", "c"))
    val rows = lf.withContext(col("a"), (ctx, col("ci")))
      .select(col("b"), col("c")).sort(col("c")).df.collect()
    assert(rows.length == 2)
    assert(rows.map(r => (Option(r.getString(0)), r.getLong(1))).toSeq ==
      Seq((Some("x"), 10L), (None, 20L)))
  }

  test("a longer earlier context cannot steal later contexts' zip positions") {
    // ctx1 longer than the frame: its padding row must NOT become row 1 of
    // the ctx2 zip — the real a=1 row pairs with ctx2's first row
    val lf = LazyFrame(Seq((1, "x")).toDF("a", "b"))
    val c1 = LazyFrame(Seq((1, "p"), (2, "q")).toDF("i1", "s1"))
    val c2 = LazyFrame(Seq((1, 7L), (2, 8L)).toDF("i2", "s2"))
    val rows = lf.withContext(col("a"), (c1, col("i1")), (c2, col("i2")))
      .select(col("a"), col("s1"), col("s2"))
      .sort(col("s2")).df.collect()
      .map(r => (Option(r.get(0)), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((Some(1), "p", 7L), (None, "q", 8L)))
  }

  test("two contexts compose") {
    val lf = LazyFrame(Seq((1, 100), (2, 200)).toDF("a", "v"))
    val c1 = LazyFrame(Seq((1, "p"), (2, "q")).toDF("i1", "s1"))
    val c2 = LazyFrame(Seq((1, 7L)).toDF("i2", "s2"))
    val rows = lf.withContext(col("a"), (c1, col("i1")), (c2, col("i2")))
      .select(col("a"), col("s1"),
        max(col("s2")).over(Window.partitionBy()).as("m"))
      .sort(col("a")).df.collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "p", 7L), (2, "q", 7L)))
  }
}
