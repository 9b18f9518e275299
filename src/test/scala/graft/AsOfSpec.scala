package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("a", 1L, "l1"), ("a", 5L, "l2"), ("a", 10L, "l3"),
    ("b", 3L, "l4"), ("c", 2L, "l5")
  ).toDF("g", "k", "lv")

  private def right = Seq(
    ("a", 1L, "r1"), ("a", 4L, "r2"), ("a", 7L, "r3"),
    ("b", 9L, "r4")
  ).toDF("g", "k", "rv")

  private def run(strategy: String, tol: Option[Double] = None) =
    AsOf.join(left, right.withColumnRenamed("k", "rk"), "k", "rk",
      Seq("g"), strategy, tol.map(lit(_)))
      .select("g", "k", "rv").as[(String, Long, Option[String])]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("backward matches latest right key <= left key, inclusive") {
    assert(run("backward") == Seq(
      ("a", 1L, Some("r1")), ("a", 5L, Some("r2")), ("a", 10L, Some("r3")),
      ("b", 3L, None), ("c", 2L, None)))
  }

  test("forward matches earliest right key >= left key") {
    assert(run("forward") == Seq(
      ("a", 1L, Some("r1")), ("a", 5L, Some("r3")), ("a", 10L, None),
      ("b", 3L, Some("r4")), ("c", 2L, None)))
  }

  test("nearest picks closer side, tie prefers backward") {
    // a/5: backward r2 at 4 (d=1), forward r3 at 7 (d=2) -> r2
    // a/10: only backward r3 -> r3; b/3: only forward r4 -> r4
    assert(run("nearest") == Seq(
      ("a", 1L, Some("r1")), ("a", 5L, Some("r2")), ("a", 10L, Some("r3")),
      ("b", 3L, Some("r4")), ("c", 2L, None)))
  }

  test("tolerance nulls matches farther than tol, keeps rows") {
    assert(run("backward", Some(1.0)) == Seq(
      ("a", 1L, Some("r1")), ("a", 5L, Some("r2")), ("a", 10L, None),
      ("b", 3L, None), ("c", 2L, None)))
  }

  test("matched right key is surfaced under rightOn name") {
    val out = AsOf.join(left, right.withColumnRenamed("k", "rk"), "k", "rk",
      Seq("g"), "backward", None)
    assert(out.columns.contains("rk"))
    val m = out.filter(col("k") === 10L).select("rk").as[Option[Long]].head()
    assert(m.contains(7L))
  }
}
