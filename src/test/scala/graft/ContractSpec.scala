package graft

/** Guards the driver contract itself: key alignment between queries and
  * oracles, and the t1 smoke (entry() returns rows at sf0.001). */
class ContractSpec extends SparkSpec {

  test("every oracle key has a query; no-oracle set is exactly the known one") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
    // r9: the two formerly rows-only keys (HLL sketch, seeded RNG) were
    // rewritten as oracle-checkable invariants — every key now has an oracle
    assert((q -- o).isEmpty,
      s"unexpected no-oracle queries: ${(q -- o).toSeq.sorted}")
  }

  test("entry() (driver t1 smoke) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no duplicate keys across query batch objects") {
    // derived from SparkEntry.batches — the SAME list `queries`/`oracleSql`
    // concatenate — so a newly registered batch is swept automatically
    // (hand-maintained copies of the list drifted in r12 and r13)
    val allQ = SparkEntry.batches.flatMap(_._1.keys)
    val dupsQ = allQ.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupsQ.isEmpty, s"duplicate query keys: ${dupsQ.toSeq.sorted}")
    assert(allQ.size == SparkEntry.queries.size)
    val allO = SparkEntry.batches.flatMap(_._2.keys)
    val dupsO = allO.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupsO.isEmpty, s"duplicate oracle keys: ${dupsO.toSeq.sorted}")
    assert(allO.size == SparkEntry.oracleSql.size)
  }

  test("every batch pairs its queries and oracles 1:1") {
    // a batch whose oracle map misses (or adds) a key would previously only
    // surface via the global q/o set compare; pin it per batch for locality
    SparkEntry.batches.zipWithIndex.foreach { case ((q, o), i) =>
      assert(q.keySet == o.keySet,
        s"batch $i query/oracle key mismatch: only-queries=" +
          s"${(q.keySet -- o.keySet).toSeq.sorted} only-oracles=" +
          s"${(o.keySet -- q.keySet).toSeq.sorted}")
    }
  }
}
