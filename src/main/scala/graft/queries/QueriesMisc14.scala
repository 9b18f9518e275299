package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import util._

/** Round-11 batch 8: the last uncovered dt-namespace methods —
  * `dt.base_utc_offset` / `dt.dst_offset` (py-polars
  * `expr/datetime.py`), as a native tzdb-rules codegen expression. */
object QueriesMisc14 {

  val queries: Map[String, Q] = Map(

    // polars dt.base_utc_offset + dt.dst_offset over three regimes:
    // America/New_York (northern DST), Australia/Sydney (southern DST —
    // base is the JULY offset, the classic sign trap), Asia/Kolkata
    // (no DST, half-hour base). Order dates 1995-2001 cross many
    // transitions (incl. Sydney's early Olympic start, Aug 2000), so the
    // key pins the actual tzdb transition table, not one fixed regime.
    // Seconds-as-long is the honest Duration mapping (no Spark duration
    // dtype — the dt.total_* discipline).
    "dt_tz_offsets" -> ((s, d) => {
      val ts = col("o_orderdate").cast(TimestampType)
      t(s, d, "orders").filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          graft.functions.baseUtcOffset(ts, "America/New_York").as("ny_base"),
          graft.functions.dstOffset(ts, "America/New_York").as("ny_dst"),
          graft.functions.baseUtcOffset(ts, "Australia/Sydney").as("syd_base"),
          graft.functions.dstOffset(ts, "Australia/Sydney").as("syd_dst"),
          graft.functions.baseUtcOffset(ts, "Asia/Kolkata").as("kol_base"),
          graft.functions.dstOffset(ts, "Asia/Kolkata").as("kol_dst"))
        .orderBy(col("o_orderkey"))
    })
  )

  val oracle: Map[String, String] = Map(

    // ICU replay without java.time: total offset at instant t is
    // epoch(wall-clock-in-zone) − epoch(t); the STANDARD offset is the
    // lesser of the Jan-15 / Jul-15 offsets of the same year (valid for
    // zones with non-negative DST — all three here); dst = total − base.
    // to_timestamp(epoch(ts)) pins the instant independent of DuckDB's
    // session timezone.
    "dt_tz_offsets" ->
      """WITH t AS (
        | SELECT o_orderkey, o_orderdate AS ts,
        |   make_timestamp(year(o_orderdate)::BIGINT, 1, 15, 0, 0, 0) AS jan,
        |   make_timestamp(year(o_orderdate)::BIGINT, 7, 15, 0, 0, 0) AS jul
        | FROM orders WHERE o_orderkey <= 2000),
        |o AS (
        | SELECT o_orderkey,
        |  (epoch(timezone('America/New_York', to_timestamp(epoch(ts)))) - epoch(ts))::BIGINT AS ny,
        |  (epoch(timezone('America/New_York', to_timestamp(epoch(jan)))) - epoch(jan))::BIGINT AS ny_jan,
        |  (epoch(timezone('America/New_York', to_timestamp(epoch(jul)))) - epoch(jul))::BIGINT AS ny_jul,
        |  (epoch(timezone('Australia/Sydney', to_timestamp(epoch(ts)))) - epoch(ts))::BIGINT AS syd,
        |  (epoch(timezone('Australia/Sydney', to_timestamp(epoch(jan)))) - epoch(jan))::BIGINT AS syd_jan,
        |  (epoch(timezone('Australia/Sydney', to_timestamp(epoch(jul)))) - epoch(jul))::BIGINT AS syd_jul,
        |  (epoch(timezone('Asia/Kolkata', to_timestamp(epoch(ts)))) - epoch(ts))::BIGINT AS kol,
        |  (epoch(timezone('Asia/Kolkata', to_timestamp(epoch(jan)))) - epoch(jan))::BIGINT AS kol_jan,
        |  (epoch(timezone('Asia/Kolkata', to_timestamp(epoch(jul)))) - epoch(jul))::BIGINT AS kol_jul
        | FROM t)
        |SELECT o_orderkey,
        | least(ny_jan, ny_jul) AS ny_base, ny - least(ny_jan, ny_jul) AS ny_dst,
        | least(syd_jan, syd_jul) AS syd_base, syd - least(syd_jan, syd_jul) AS syd_dst,
        | least(kol_jan, kol_jul) AS kol_base, kol - least(kol_jan, kol_jul) AS kol_dst
        |FROM o ORDER BY o_orderkey""".stripMargin
  )
}
