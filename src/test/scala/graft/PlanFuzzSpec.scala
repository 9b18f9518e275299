package graft

import graft.testing.PlanFuzz

/** Differential plan fuzzing (r15 verdict task 2): 240 seeded random plans
  * — filter / project / join / window / group-agg / distinct over random
  * frames spanning the full dtype pool — each executed three ways (DSL,
  * emitted ANSI SQL via spark.sql, and a from-scratch collection model of
  * Spark's semantics) and compared as exact canonical multisets. A failing
  * seed reproduces deterministically: `PlanFuzz.runCase(spark, seed)`.
  *
  * The same generator's SQL-emission discipline feeds the DuckDB-checked
  * `fuzz_*` oracle keys (FuzzQueries) — that path catches engine-level
  * divergence against a foreign engine; this one catches it against an
  * independent in-JVM model with zero shared code.
  */
class PlanFuzzSpec extends SparkSpec {

  private def sweep(seeds: Range): Unit = {
    val failures = seeds.flatMap(s => PlanFuzz.runCase(spark, s.toLong))
    assert(failures.isEmpty,
      s"${failures.size} diverging seeds:\n${failures.take(3).mkString("\n\n")}")
  }

  // seeds 1-60 always run; the deeper blocks are soak coverage behind
  // SPARK_GRAFT_SOAK=1 (r21 verdict item 2)
  test("differential fuzz: seeds 1-60 agree across DSL, SQL, and the model") {
    sweep(1 to 60)
  }
  soakTest("differential fuzz: seeds 61-120 agree across DSL, SQL, and the model") {
    sweep(61 to 120)
  }
  soakTest("differential fuzz: seeds 121-180 agree across DSL, SQL, and the model") {
    sweep(121 to 180)
  }
  soakTest("differential fuzz: seeds 181-240 agree across DSL, SQL, and the model") {
    sweep(181 to 240)
  }
}
