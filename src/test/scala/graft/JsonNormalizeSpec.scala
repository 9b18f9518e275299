package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{AlignFrames, JsonNormalize}

/** json_normalize + align_frames (round-11 additions; reference
  * py-polars/src/polars/convert/normalize.py and functions/eager.py). */
class JsonNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, """{"a":1,"b":{"c":"x","d":{"e":10,"f":11}},"g":true}"""),
    (2L, """{"a":2,"b":{"c":"y","d":{"e":20,"f":21}},"g":false}"""),
    (3L, """{"a":3,"b":{"c":"z","d":{"e":30,"f":31}}}""")
  ).toDF("id", "js")

  test("full flatten: nested keys joined with the separator, nulls for absent keys") {
    val out = JsonNormalize.normalize(rows, "js", schema = None)
    assert(out.columns.toSeq == Seq("id", "a", "b.c", "b.d.e", "b.d.f", "g"))
    val r = out.orderBy("id").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(r.map(_.getString(2)).toSeq == Seq("x", "y", "z"))
    assert(r.map(_.getLong(3)).toSeq == Seq(10L, 20L, 30L))
    // row 3 omits "g" — inference keeps the column, value is null
    assert(r(0).getBoolean(5) && !r(1).getBoolean(5) && r(2).isNullAt(5))
  }

  test("custom separator") {
    val out = JsonNormalize.normalize(rows, "js", schema = None, separator = "_")
    assert(out.columns.toSeq == Seq("id", "a", "b_c", "b_d_e", "b_d_f", "g"))
  }

  test("max_level stops recursion and JSON-encodes the remainder") {
    val out = JsonNormalize.normalize(rows, "js", schema = None, maxLevel = 2)
    assert(out.columns.toSeq == Seq("id", "a", "b.c", "b.d", "g"))
    val bd = out.orderBy("id").select("`b.d`").as[String].collect()
    assert(bd(0) == """{"e":10,"f":11}""")
    assert(bd(2) == """{"e":30,"f":31}""")
    // max_level=1: nothing below the top level expands
    val one = JsonNormalize.normalize(rows, "js", schema = None, maxLevel = 1)
    assert(one.columns.toSeq == Seq("id", "a", "b", "g"))
    assert(one.orderBy("id").select("b").as[String].head ==
      """{"c":"x","d":{"e":10,"f":11}}""")
  }

  test("explicit schema skips inference and is plan-only (no shuffle)") {
    val st = StructType(Seq(
      StructField("a", LongType), StructField("b", StructType(Seq(
        StructField("c", StringType))))))
    val out = JsonNormalize.normalize(rows, "js", schema = Some(st))
    assert(out.columns.toSeq == Seq("id", "a", "b.c"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"flatten must not shuffle:\n$plan")
  }

  test("align_frames: shared sorted spine, null injection, column order kept") {
    val f1 = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "x")
    val f2 = Seq((2, "b"), (3, "c"), (4, "d")).toDF("k", "y")
    val f3 = Seq((4, 40L)).toDF("k", "z")
    val out = AlignFrames.align(Seq(f1, f2, f3), Seq("k"))
    assert(out.forall(_.count() == 4)) // spine = {1,2,3,4} in every frame
    assert(out(0).columns.toSeq == Seq("k", "x"))
    val ks = out.map(_.select("k").as[Int].collect().toSeq)
    assert(ks.forall(_ == Seq(1, 2, 3, 4))) // row-aligned, sorted
    assert(out(0).orderBy("k").collect()(3).isNullAt(1)) // f1 lacks k=4
    assert(out(2).orderBy("k").collect()(0).isNullAt(1)) // f3 lacks k=1
  }

  test("align_frames how=left keys off the first frame only") {
    val f1 = Seq((1, 10.0), (2, 20.0)).toDF("k", "x")
    val f2 = Seq((2, "b"), (9, "zz")).toDF("k", "y")
    val out = AlignFrames.align(Seq(f1, f2), Seq("k"), how = "left")
    assert(out.forall(_.count() == 2)) // k=9 never enters the spine
    assert(out(1).orderBy("k").select("y").as[String].collect().toSeq ==
      Seq(null, "b"))
  }

  test("align_frames descending order") {
    val f1 = Seq((1, 10.0), (3, 30.0)).toDF("k", "x")
    val f2 = Seq((2, "b")).toDF("k", "y")
    val out = AlignFrames.align(Seq(f1, f2), Seq("k"), descending = true)
    assert(out(0).select("k").as[Int].collect().toSeq == Seq(3, 2, 1))
  }
}
