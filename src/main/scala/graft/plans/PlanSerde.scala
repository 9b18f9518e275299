package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.json4s.{Formats, DefaultFormats, ShortTypeHints}
import org.json4s.jackson.Serialization

/** Logical-plan serialization — the Spark analogue of polars' plan
  * round-trip for remote execution (`LazyFrame::serialize`,
  * reference crates/polars-plan/src/client/mod.rs: the client serializes
  * the logical plan, a remote engine deserializes and executes it).
  *
  * Spark's own remote story is Spark Connect (the DataFrame API already
  * ships plans over the wire as protobuf), so this layer deliberately does
  * NOT reinvent a Column serializer: the DSL plan is a small JSON tree of
  * operators whose expressions are Spark SQL strings — the stable,
  * human-auditable wire form Spark itself exposes (`selectExpr`/`expr`).
  * Everything `expr()` can parse (scalar functions, aggregates, window
  * functions, HOFs) rides through unchanged, so the serializable surface
  * is the full SQL expression language, not a hand-picked subset.
  *
  * Contract: `build(spark, fromJson(toJson(plan)))` executes the same
  * logical plan as `build(spark, plan)` — pinned by PlanSerdeSpec over
  * scan/filter/select/agg/join/window/sort/limit shapes. */
object PlanSerde {

  /** One JSON-serializable logical operator. Expressions are Spark SQL
    * strings; children nest. */
  sealed trait Node

  /** `spark.read.format(format).load(path)`; `options` pass through. */
  case class Scan(format: String, path: String,
                  options: Map[String, String] = Map.empty) extends Node
  case class Filter(child: Node, predicate: String) extends Node
  /** `selectExpr(exprs: _*)` — aliases inside the strings. */
  case class Select(child: Node, exprs: Seq[String]) extends Node
  /** groupBy(keys).agg(aggs) — empty keys = global aggregate. */
  case class Agg(child: Node, keys: Seq[String], aggs: Seq[String])
    extends Node
  case class Join(left: Node, right: Node, on: Seq[String], how: String)
    extends Node
  case class Sort(child: Node, keys: Seq[SortKey]) extends Node
  case class Limit(child: Node, n: Int) extends Node

  /** A sort key: SQL expression + direction + null placement. */
  case class SortKey(sql: String, desc: Boolean = false,
                     nullsLast: Boolean = false)

  private implicit val formats: Formats = new DefaultFormats {
    override val typeHints = ShortTypeHints(List(
      classOf[Scan], classOf[Filter], classOf[Select], classOf[Agg],
      classOf[Join], classOf[Sort], classOf[Limit]))
  }

  def toJson(plan: Node): String = Serialization.write(plan)

  def fromJson(json: String): Node = Serialization.read[Node](json)

  private def sortCol(k: SortKey): Column = {
    val e = expr(k.sql)
    (k.desc, k.nullsLast) match {
      case (false, false) => e.asc_nulls_first
      case (false, true)  => e.asc_nulls_last
      case (true, false)  => e.desc_nulls_first
      case (true, true)   => e.desc_nulls_last
    }
  }

  /** Rebuild the DataFrame a plan describes. Pure plan construction —
    * nothing executes until an action. */
  def build(spark: SparkSession, plan: Node): DataFrame = plan match {
    case Scan(f, p, opts) => spark.read.format(f).options(opts).load(p)
    case Filter(c, p)     => build(spark, c).filter(expr(p))
    case Select(c, es)    => build(spark, c).selectExpr(es: _*)
    case Agg(c, ks, as) =>
      val aggs = as.map(expr)
      build(spark, c).groupBy(ks.map(col): _*).agg(aggs.head, aggs.tail: _*)
    case Join(l, r, on, how) =>
      build(spark, l).join(build(spark, r), on, how)
    case Sort(c, ks) => build(spark, c).orderBy(ks.map(sortCol): _*)
    case Limit(c, n) => build(spark, c).limit(n)
  }

  /** Convenience: serialize, deserialize, build — the full round-trip. */
  def rebuild(spark: SparkSession, plan: Node): DataFrame =
    build(spark, fromJson(toJson(plan)))
}
