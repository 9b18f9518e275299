package graft.queries

import org.apache.spark.sql.functions._
import graft.dsl.LazyFrame
import graft.ops.Categorical
import util._

/** Round-12 batch: join-level maintain_order (polars
  * JoinArgs.maintain_order, crates/polars-ops/src/frame/join/args.rs:49)
  * and the categorical cross-frame code join (the global-string-cache
  * join, crates/polars-core/src/chunked_array/logical/categorical.rs). */
object QueriesMisc15 {

  val queries: Map[String, Q] = Map(

    // polars join(..., maintain_order="left"): left row order survives the
    // join. Spark frames have no implicit order, so the maintained order
    // is named explicitly ((o_totalprice, o_orderkey) — a unique total
    // order) and the output POSITION is emitted via the distributed
    // range-partitioned row index, so the driver hash pins the actual
    // order mapping, not just the row set. m:1 left join (customer keys
    // unique), with an unmatched tail (acctbal filter) proving null
    // right columns ride along without disturbing positions.
    "join_maintain_order" -> ((s, d) => {
      val orders = LazyFrame(t(s, d, "orders").filter(col("o_orderkey") <= 2000))
      val cust = LazyFrame(
        t(s, d, "customer").filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("o_custkey"),
            col("c_mktsegment").as("segment")))
      orders
        .joinMaintainOrder(cust, Seq("o_custkey"), how = "left",
          maintainOrder = "left",
          leftOrder = Seq("o_totalprice", "o_orderkey"))
        .withRowIndex("out_pos",
          orderBy = Seq(col("o_totalprice"), col("o_orderkey")))
        .df
        .select(col("out_pos"), col("o_orderkey"), col("o_totalprice"),
          col("segment"))
        .orderBy(col("out_pos"))
    }),

    // Categorical cross-frame join ON CODES, polars' global-string-cache
    // semantics: both sides are dictionary-encoded independently (left:
    // all 5 market segments → codes 0..4 lexical; right: a 3-segment
    // aggregate → codes 0..2), then joined WITHOUT re-encoding — the two
    // dictionaries remap right codes into the left code space and the
    // data join runs on int codes only. Balance cents are exact integers
    // (no float-sum jitter). The emitted seg_code pins the LEFT dictionary
    // numbering, proving the remap (MACHINERY is 4 on the left, 2 on the
    // right).
    "cat_join_codes" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val lDict = Categorical.dictionary(cust, "c_mktsegment")
      val left = Categorical.toPhysical(cust, "c_mktsegment", "seg_code")
        .select(col("c_custkey"), col("seg_code"))
      val rsrc = cust
        .filter(col("c_mktsegment")
          .isin("BUILDING", "MACHINERY", "AUTOMOBILE"))
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(sum(round(col("c_acctbal") * 100).cast("long")).as("bal_cents"),
          count(lit(1)).as("n_cust"))
      val rDict = Categorical.dictionary(rsrc, "seg")
      val right = Categorical.toPhysical(rsrc, "seg", "rcode")
        .select(col("rcode"), col("bal_cents"), col("n_cust"))
      Categorical.joinOnCodes(
          left, "seg_code", lDict, right, "rcode", rDict, "inner")
        .filter(col("c_custkey") <= 300)
        .orderBy(col("c_custkey"))
        .select(col("c_custkey"), col("seg_code"),
          col("bal_cents"), col("n_cust"))
    })
  )

  val oracle: Map[String, String] = Map(

    "join_maintain_order" ->
      """SELECT row_number() OVER (ORDER BY o_totalprice, o_orderkey) - 1
        |    AS out_pos,
        |  o_orderkey, o_totalprice, c.segment
        |FROM orders LEFT JOIN (
        |  SELECT c_custkey, c_mktsegment AS segment
        |  FROM customer WHERE c_acctbal > 5000) c
        |  ON o_custkey = c.c_custkey
        |WHERE o_orderkey <= 2000
        |ORDER BY out_pos""".stripMargin,

    "cat_join_codes" ->
      """WITH ld AS (
        |  SELECT category,
        |    CAST(dense_rank() OVER (ORDER BY category) - 1 AS INT)
        |      AS seg_code
        |  FROM (SELECT DISTINCT c_mktsegment AS category FROM customer)),
        |l AS (
        |  SELECT c_custkey, seg_code
        |  FROM customer JOIN ld ON c_mktsegment = category),
        |rsrc AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |      AS bal_cents,
        |    count(*) AS n_cust
        |  FROM customer
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
        |  GROUP BY 1),
        |rd AS (
        |  SELECT seg,
        |    CAST(dense_rank() OVER (ORDER BY seg) - 1 AS INT) AS rcode
        |  FROM (SELECT DISTINCT seg FROM rsrc)),
        |r AS (SELECT rd.rcode, rsrc.bal_cents, rsrc.n_cust
        |  FROM rsrc JOIN rd USING (seg)),
        |remap AS (
        |  SELECT rd.rcode, ld.seg_code
        |  FROM ld JOIN rd ON ld.category = rd.seg),
        |rt AS (SELECT remap.seg_code, r.bal_cents, r.n_cust
        |  FROM r JOIN remap USING (rcode))
        |SELECT l.c_custkey, l.seg_code, rt.bal_cents, rt.n_cust
        |FROM l JOIN rt USING (seg_code)
        |WHERE l.c_custkey <= 300
        |ORDER BY l.c_custkey""".stripMargin
  )
}
