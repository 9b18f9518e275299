package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Session/meta utilities (show_versions, build_info, set_random_seed). */
class MetaSpec extends SparkSpec {

  test("buildInfo and showVersions report the running components") {
    val info = Meta.buildInfo(spark)
    assert(info("spark") == spark.version)
    assert(info("scala").startsWith("2.13"))
    val df = Meta.showVersions(spark)
    assert(df.columns.toSeq == Seq("component", "version"))
    assert(df.count() == info.size)
  }

  test("set_random_seed re-draws the stratified sample deterministically") {
    // the conf is session-global and the test session is shared JVM-wide:
    // restore the unseeded state however the test exits
    try {
      val df = util_t("part").select(col("p_partkey"), col("p_brand"))
      def sample(): Set[Long] =
        Sampling.sampleStratified(df, Seq("p_brand"), "p_partkey", 0.2)
          .select(col("p_partkey"))
          .collect().map(_.getLong(0)).toSet
      val bare = sample()
      Meta.setRandomSeed(spark, 42L)
      val a = sample(); val a2 = sample()
      assert(a == a2) // same seed → identical draw
      assert(a != bare) // seeded draw differs from the bare-id draw
      Meta.setRandomSeed(spark, 43L)
      val b = sample()
      assert(a != b) // new seed → different draw
      assert(Meta.randomSeed(spark).contains(43L))
    } finally spark.conf.unset("graft.random.seed")
  }

  private def util_t(name: String) =
    graft.queries.util.t(spark, "/root/testdata/sf0.001", name)

  test("thread_pool_size reports the scheduler parallelism") {
    assert(Meta.threadPoolSize(spark) ==
      spark.sparkContext.defaultParallelism)
    assert(Meta.threadPoolSize(spark) > 0)
  }

  test("index type is the engine's 64-bit row-index contract") {
    assert(Meta.indexType == "Int64")
  }

  test("read_ipc_schema resolves schema footer-only through graft-ipc") {
    val dir = "/tmp/graft_test/meta_ipc"
    val df = util_t("region")
    graft.sources.ArrowIpc.write(df, dir)
    val sch = Meta.readIpcSchema(spark, dir)
    assert(sch.fieldNames.toSeq == df.schema.fieldNames.toSeq)
  }
}
