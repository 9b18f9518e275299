package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.util._
import graft.{functions => gf}

/** Round-5 batch: the multi-pattern automaton family (§2.9, reference
  * `find_many.rs` — replace_many / contains_any / find_many with a
  * PII-scrub-sized pattern list), Arrow IPC round-trip (§2.2), lockstep
  * multi-column explode + update + multi-agg pivot + value recoding
  * (§2.1/§2.9), file-path provenance scan, and the §1.2 dtype-fidelity
  * contracts (unsigned widening, ns truncation) made executable.
  */
object QueriesMisc6 {

  /** 20 scrub patterns over the documents vocabulary. The word list is
    * closed and no pattern is a substring of another (or of any other
    * vocabulary word), and replacements introduce no pattern text — so the
    * single-pass leftmost-first result provably equals the chained-replace
    * form, which is what the DuckDB oracle expresses. */
  val scrubPairs: Seq[(String, String)] = Seq(
    "join", "hash", "row", "batch", "scan", "column", "customer", "filter",
    "small", "slow", "merge", "order", "vector", "line", "table", "data",
    "agg", "value", "key", "stream"
  ).zipWithIndex.map { case (w, i) => w -> s"[${i + 1}]" }

  val queries: Map[String, Q] = Map(

    // polars str.replace_many (crates/polars-plan/src/dsl/string.rs
    // replace_many; engine find_many.rs LeftmostFirst) — one automaton pass
    // regardless of pattern count.
    "str_replace_many" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        gf.replaceMany(col("text"), scrubPairs).as("scrubbed"),
        length(gf.replaceMany(col("text"), scrubPairs)).cast("long").as("scrub_len"))
        .orderBy(col("doc_id"))),

    // polars' native interchange format (crates/polars-io/src/ipc/) as a
    // DSv2 connector: distributed batch-streamed write, per-record-batch
    // read partitions, zero-copy ArrowColumnVector batches.
    "io_ipc_roundtrip" -> ((s, d) => {
      val tmp = "/tmp/graft_io/ipc_part"
      graft.sources.ArrowIpc.write(t(s, d, "part"), tmp)
      s.read.format("graft-ipc").load(tmp).orderBy(col("p_partkey"))
    }),

    // polars group_by(maintain_order=true) (§2.5): result order = first
    // appearance of each group along event_id, reconstructed via
    // GroupBy.aggOrdered (min(order) agg + result-side sort — never a sort
    // of the input) and materialized as an explicit rank so the hash
    // compare actually checks the order.
    "agg_maintain_order" -> ((s, d) => {
      val g = lf(s, d, "events").groupByNames("event_type")
        .aggOrdered(col("event_id"),
          count(lit(1)).as("n"), min(col("event_id")).as("first_seen"))
      graft.ops.Distributed.withRowNumber(g.df, "idx", Seq(col("first_seen")))
        .select(col("idx"), col("event_type"), col("n"), col("first_seen"))
    }),

    // Avro container format (crates/polars-io/src/avro/) as a DSv2 connector
    // on avro-core: distributed write, sync-marker-aligned byte-range read
    // splits, reader-schema column pruning. orders exercises timestamp-µs,
    // int64, double, and string fidelity through the container format.
    "io_avro_roundtrip" -> ((s, d) => {
      val tmp = "/tmp/graft_io/avro_orders"
      graft.sources.Avro.write(t(s, d, "orders"), tmp)
      s.read.format("graft-avro").load(tmp).orderBy(col("o_orderkey"))
    }),

    // polars str.contains_any + str.extract_many (find_many.rs) — the
    // closed vocabulary (no pattern a substring of another, space-separated
    // words) makes the leftmost-first scan equal a regex-alternation
    // findall, which is what the oracle expresses.
    "str_contains_any" -> ((s, d) => {
      val pats = scrubPairs.take(8).map(_._1)
      t(s, d, "documents").select(
        col("doc_id"),
        gf.containsAny(col("text"), pats).as("has_any"),
        array_join(gf.extractMany(col("text"), pats), "|").as("matched"))
        .orderBy(col("doc_id"))
    }),

    // polars str.find_many: byte offsets (ASCII text, so = char offsets;
    // DuckDB's 1-based strpos - 1 gives the first one).
    "str_find_many" -> ((s, d) => {
      val pats = scrubPairs.take(8).map(_._1)
      t(s, d, "documents").select(
        col("doc_id"),
        size(gf.findMany(col("text"), pats)).cast("long").as("n_matches"),
        try_element_at(gf.findMany(col("text"), pats), lit(1))
          .cast("long").as("first_pos"))
        .orderBy(col("doc_id"))
    }),

    // polars df.explode("a","b") — multi-column LOCKSTEP explode
    // (position-aligned), reference plan.rs Explode on several columns.
    "explode_multi" -> ((s, d) => {
      import graft.dsl.LazyFrame
      // ONE sorted struct list -> two projections: the pairing survives
      // duplicate l_linenumber values (a shared total order on both sides)
      val lists = t(s, d, "lineitem").filter(col("l_orderkey") <= 500)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice")))).as("rows"))
        .select(col("l_orderkey"),
          transform(col("rows"), x => x.getField("l_quantity")).as("qty"),
          transform(col("rows"), x => x.getField("l_extendedprice")).as("price"))
      LazyFrame(lists).explodeMany(Seq("qty", "price")).collect()
        .select(col("l_orderkey"), col("qty"), col("price"))
        .orderBy(col("l_orderkey"), col("qty"), col("price"))
    }),

    // polars scan(include_file_paths=...) — the provenance column every
    // multi-file pipeline wants. Spark-first: the hidden _metadata struct
    // on any file scan; DuckDB's filename=true reads the same files.
    "io_file_paths" -> ((s, d) => {
      val tmp = "/tmp/graft_io/fp_part"
      t(s, d, "part").write.mode("overwrite")
        .partitionBy("p_size").parquet(tmp)
      s.read.parquet(tmp)
        .select(col("p_partkey"), col("p_size").cast("long").as("p_size"),
          regexp_replace(col("_metadata.file_path"), "^.*/", "").as("fname"))
        .orderBy(col("p_partkey"))
    }),

    // polars concat(how="align") — full-outer alignment on the common key
    // columns, each frame contributing where its key exists.
    "concat_align" -> ((s, d) => {
      import graft.dsl.LazyFrame
      val o = t(s, d, "orders")
      val a = o.filter(col("o_orderkey") <= 1000)
        .select(col("o_orderkey"), col("o_totalprice"))
      val b = o.filter(col("o_orderkey").between(500, 1500))
        .select(col("o_orderkey"), col("o_orderpriority"))
      LazyFrame(a).concatAlign(LazyFrame(b)).collect()
    }),

    // polars pivot with MULTIPLE aggregations per pivoted value
    // (values=[...], aggregate_function per column) — Spark pivot takes an
    // agg list natively; column naming <value>_<alias> matches both sides.
    "pivot_multi" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg((round(sum(col("l_quantity")) * 100) / 100).as("qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),

    // polars df.update(other, on): matched rows take the other frame's
    // non-null values for shared columns; unmatched rows keep their own.
    "misc_update" -> ((s, d) => {
      import graft.dsl.LazyFrame
      val part = t(s, d, "part")
      val delta = part.filter(col("p_partkey") % 10 === 0)
        .select(col("p_partkey"), (col("p_retailprice") + 1.0).as("p_retailprice"))
      LazyFrame(part).update(LazyFrame(delta), Seq("p_partkey")).collect()
        .select(col("p_partkey"), col("p_retailprice"), col("p_brand"))
        .orderBy(col("p_partkey"))
    }),

    // polars Expr.replace / replace_strict — value RECODE (reference
    // test_replace.py / test_replace_strict.py): partial mapping passes
    // unmapped values through; strict mapping retypes via the full map.
    "misc_recode" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        gf.replaceValues(col("o_orderpriority"),
          Seq("1-URGENT" -> "U", "2-HIGH" -> "H")).as("pri_part"),
        gf.replaceStrict(col("o_orderpriority"),
          Seq("1-URGENT" -> 1, "2-HIGH" -> 2, "3-MEDIUM" -> 3,
            "4-NOT SPECIFIED" -> 4, "5-LOW" -> 5)).as("pri_code"))
        .orderBy(col("o_orderkey"))),

    // SURVEY §1.2 unsigned contract made executable: u32 widens losslessly
    // into i64; u64 carries in Decimal(20,0) (exact to 2^64-1 and beyond on
    // arithmetic, no wraparound); the documented Long-with-check path
    // surfaces overflow as null (try_cast), never a wrong value.
    "dtype_unsigned" -> ((s, _) =>
      s.sql(
        """SELECT v_str,
          |  try_cast(v_str AS BIGINT) AS as_i64,
          |  CAST(CAST(v_str AS DECIMAL(20,0)) AS STRING) AS u64_str,
          |  CAST(CAST(v_str AS DECIMAL(20,0)) + 1 AS STRING) AS u64_plus
          |FROM VALUES ('0'), ('255'), ('65535'), ('2147483647'),
          |  ('2147483648'), ('4294967295'), ('9223372036854775807'),
          |  ('18446744073709551615') AS t(v_str)
          |ORDER BY length(v_str), v_str""".stripMargin)),

    // SURVEY §1.2 Datetime(ns)/Time contract made executable: whatever
    // physical form `events.ts` ships in (TIMESTAMP(NANOS) read raw as i64
    // and truncated, or plain µs timestamps — util.t normalizes both to µs
    // TIMESTAMP), the Time dtype is the i64 ns-since-midnight carrier of
    // the µs-truncated instant. The oracle computes the same values from
    // DuckDB's epoch_us over the identical file — agreement IS the
    // contract.
    "dtype_time_ns" -> ((s, d) => {
      util.t(s, d, "events")
        .select(col("event_id"),
          expr("unix_micros(ts)").as("us"),
          expr("(unix_micros(ts) % 86400000000) * 1000").as("time_ns"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .orderBy(col("event_id"))
    })
  )

  val oracle: Map[String, String] = Map(

    "str_replace_many" -> {
      val nested = scrubPairs.foldLeft("text") { case (acc, (from, to)) =>
        s"replace($acc, '$from', '$to')"
      }
      s"""SELECT doc_id, $nested AS scrubbed, length($nested) AS scrub_len
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "io_ipc_roundtrip" ->
      "SELECT * FROM part ORDER BY p_partkey",

    "io_avro_roundtrip" ->
      "SELECT * FROM orders ORDER BY o_orderkey",

    "agg_maintain_order" ->
      """SELECT CAST(row_number() OVER (ORDER BY first_seen) AS BIGINT) AS idx,
        | event_type, n, first_seen FROM (
        | SELECT event_type, count(*) AS n, min(event_id) AS first_seen
        | FROM events GROUP BY 1) g
        |ORDER BY idx""".stripMargin,

    "explode_multi" ->
      """SELECT l_orderkey, unnest(qs) AS qty, unnest(ps) AS price FROM (
        |  SELECT l_orderkey,
        |    list(l_quantity ORDER BY l_linenumber, l_quantity, l_extendedprice) AS qs,
        |    list(l_extendedprice ORDER BY l_linenumber, l_quantity, l_extendedprice) AS ps
        |  FROM lineitem WHERE l_orderkey <= 500 GROUP BY 1)
        |ORDER BY 1, 2, 3""".stripMargin,

    "io_file_paths" ->
      """SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
        |  regexp_replace(filename, '^.*/', '') AS fname
        |FROM read_parquet('/tmp/graft_io/fp_part/*/*.parquet',
        |                  filename=true, hive_partitioning=true)
        |ORDER BY p_partkey""".stripMargin,

    "concat_align" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1000) a
        |FULL JOIN (SELECT o_orderkey, o_orderpriority FROM orders
        |           WHERE o_orderkey BETWEEN 500 AND 1500) b USING (o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "pivot_multi" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) * 100) / 100 AS "F_qty",
        |  count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS "F_n",
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) * 100) / 100 AS "O_qty",
        |  count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS "O_n"
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "misc_update" ->
      """SELECT p_partkey,
        |  CASE WHEN p_partkey % 10 = 0 THEN p_retailprice + 1.0
        |       ELSE p_retailprice END AS p_retailprice,
        |  p_brand
        |FROM part ORDER BY p_partkey""".stripMargin,

    "str_contains_any" -> {
      val pats = scrubPairs.take(8).map(_._1)
      val likes = pats.map(p => s"text LIKE '%$p%'").mkString(" OR ")
      val alt = pats.mkString("(", "|", ")")
      s"""SELECT doc_id, ($likes) AS has_any,
         |  coalesce(array_to_string(regexp_extract_all(text, '$alt'), '|'), '')
         |    AS matched
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "str_find_many" -> {
      val pats = scrubPairs.take(8).map(_._1)
      val alt = pats.mkString("(", "|", ")")
      val firsts = pats.map(p => s"nullif(strpos(text, '$p'), 0)").mkString(", ")
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '$alt')) AS n_matches,
         |  least($firsts) - 1 AS first_pos
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "misc_recode" ->
      """SELECT o_orderkey,
        |  CASE o_orderpriority WHEN '1-URGENT' THEN 'U' WHEN '2-HIGH' THEN 'H'
        |       ELSE o_orderpriority END AS pri_part,
        |  CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
        |       WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
        |       WHEN '5-LOW' THEN 5 END AS pri_code
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "dtype_unsigned" ->
      """SELECT v_str,
        |  try_cast(v_str AS BIGINT) AS as_i64,
        |  CAST(CAST(v_str AS DECIMAL(20,0)) AS VARCHAR) AS u64_str,
        |  CAST(CAST(v_str AS DECIMAL(20,0)) + 1 AS VARCHAR) AS u64_plus
        |FROM (VALUES ('0'), ('255'), ('65535'), ('2147483647'),
        |  ('2147483648'), ('4294967295'), ('9223372036854775807'),
        |  ('18446744073709551615')) t(v_str)
        |ORDER BY length(v_str), v_str""".stripMargin,

    "dtype_time_ns" ->
      """SELECT event_id, epoch_us(ts) AS us,
        |  (epoch_us(ts) % 86400000000) * 1000 AS time_ns,
        |  epoch_us(ts) // 86400000000 AS day
        |FROM events ORDER BY event_id""".stripMargin
  )
}
