package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.util._
import graft.{functions => gf}

/** Round-5 batch: native single-pass replace_many (§2.9, reference
  * `find_many.rs` Aho-Corasick semantics) with a PII-scrub-sized pattern
  * list.
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
      "SELECT * FROM part ORDER BY p_partkey"
  )
}
