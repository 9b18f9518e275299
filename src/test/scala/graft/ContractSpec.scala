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
    val batches = Seq(
      graft.queries.QueriesAgg.queries, graft.queries.QueriesJoin.queries,
      graft.queries.QueriesWindow.queries, graft.queries.QueriesScalar.queries,
      graft.queries.QueriesReshape.queries, graft.queries.QueriesText.queries,
      graft.queries.QueriesExtra.queries, graft.queries.QueriesScalar2.queries,
      graft.queries.QueriesExtra2.queries, graft.queries.QueriesWindow2.queries,
      graft.queries.QueriesMisc3.queries, graft.queries.QueriesMisc4.queries,
      graft.queries.QueriesMisc5.queries, graft.queries.QueriesCat.queries,
      graft.queries.QueriesDialect.queries, graft.queries.QueriesMisc6.queries,
      graft.queries.QueriesSql.queries, graft.queries.QueriesMisc7.queries,
      graft.queries.QueriesMisc8.queries, graft.queries.QueriesMisc9.queries,
      graft.queries.QueriesSql2.queries, graft.queries.QueriesMisc10.queries,
      graft.queries.QueriesMisc11.queries, graft.queries.QueriesMisc12.queries,
      graft.queries.QueriesMisc13.queries, graft.queries.QueriesStream.queries,
      graft.queries.QueriesMisc14.queries, graft.queries.QueriesMisc15.queries)
    val all = batches.flatMap(_.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query keys: ${dups.toSeq.sorted}")
    assert(all.size == SparkEntry.queries.size)
  }
}
