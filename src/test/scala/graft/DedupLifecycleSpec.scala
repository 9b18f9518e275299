package graft

import org.apache.spark.sql.DataFrame
import graft.text.Dedup

/** Verify-stage persist lifecycle + auto-switch budget (r18 verdict item 3
  * and ADVICE): interleaved pipelines must keep their caches live instead
  * of silently unpersisting each other; the `auto` budget must honor
  * executor confs; inputs without optimizer stats must not be treated as
  * petabyte measurements. */
class DedupLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def docs(tag: String): DataFrame = Seq(
    (1L, s"alpha beta gamma delta epsilon $tag"),
    (2L, s"alpha beta gamma delta epsilon $tag"),
    (3L, s"zeta eta theta iota kappa $tag"),
    (4L, s"zeta eta theta iota kappa lambda $tag"),
    (5L, s"completely unrelated text about spark $tag")
  ).toDF("doc_id", "text")

  test("interleaved near-dup pipelines both keep their persists live") {
    Dedup.releaseCache()
    assert(Dedup.liveCacheCount == 0)
    val r1 = Dedup.nearDuplicates(docs("one"), "doc_id", "text",
      w = 2, k = 8, b = 4, threshold = 0.5, verify = "cached")
    val r2 = Dedup.fuzzyNearDuplicates(docs("two"), "doc_id", "text",
      w = 2, k = 8, b = 4, threshold = 0.5, verify = "rescan")
    assert(Dedup.liveCacheCount == 2,
      s"expected both pipelines' persists live, got ${Dedup.liveCacheCount}")
    // consume BOTH results only now — with the old single slot the second
    // call had already unpersisted the first pipeline's frame by this point
    val p1 = r1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = r2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1.contains((2L, 1L)) || p1.contains((1L, 2L)), s"jaccard pairs: $p1")
    assert(p2.contains((1L, 2L)) || p2.contains((2L, 1L)), s"fuzzy pairs: $p2")
    assert(Dedup.liveCacheCount == 2)
    Dedup.releaseCache()
    assert(Dedup.liveCacheCount == 0)
  }

  test("persist registry stays bounded under repeated calls") {
    Dedup.releaseCache()
    (1 to 6).foreach { i =>
      Dedup.nearDuplicates(docs(s"rep$i"), "doc_id", "text",
        w = 2, k = 8, b = 4, threshold = 0.5, verify = "cached").count()
    }
    assert(Dedup.liveCacheCount == 4,
      s"registry must cap at 4, got ${Dedup.liveCacheCount}")
    Dedup.releaseCache()
  }

  test("persist registry cap is configurable (ADVICE r19)") {
    Dedup.releaseCache()
    withSQLConf("spark.graft.dedup.maxLivePersists" -> "2") {
      (1 to 4).foreach { i =>
        Dedup.nearDuplicates(docs(s"cap$i"), "doc_id", "text",
          w = 2, k = 8, b = 4, threshold = 0.5, verify = "cached").count()
      }
      assert(Dedup.liveCacheCount == 2,
        s"registry must cap at the configured 2, got ${Dedup.liveCacheCount}")
    }
    Dedup.releaseCache()
  }

  test("recompute verify persists nothing and matches the other strategies") {
    Dedup.releaseCache()
    val base = docs("rcmp")
    def run(mode: String) =
      Dedup.nearDuplicates(base, "doc_id", "text",
        w = 2, k = 8, b = 4, threshold = 0.5, verify = mode)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rc = run("recompute")
    assert(Dedup.liveCacheCount == 0,
      s"recompute must not register persists, got ${Dedup.liveCacheCount}")
    assert(rc == run("cached") && rc == run("rescan"),
      s"strategies disagree: recompute=$rc")
    Dedup.releaseCache()
  }

  test("local mode ignores cluster executor confs for the auto budget") {
    // spark.executor.memory is ignored by a local master at runtime (the
    // driver heap is the only storage), so a local session carrying
    // cluster defaults must not derive the verify budget from it
    // (ADVICE r19); a cluster master keeps the conf-derived budget.
    assert(Dedup.autoBudget("local[4]", Some("1k"), None) ==
      Runtime.getRuntime.maxMemory() / 4)
    assert(Dedup.autoBudget("spark://host:7077", Some("4g"), Some(0.5)) ==
      4L * 1024 * 1024 * 1024 / 2 / 4)
    assert(Dedup.autoBudget("yarn", None, None) ==
      Runtime.getRuntime.maxMemory() / 4)
  }

  test("auto budget honors executor confs when set") {
    assert(Dedup.budgetFromConfs(None, None).isEmpty)
    assert(Dedup.budgetFromConfs(Some("4g"), Some(0.5))
      .contains(4L * 1024 * 1024 * 1024 / 2 / 4))
    // default memory fraction 0.6
    assert(Dedup.budgetFromConfs(Some("1g"), None)
      .contains((1024L * 1024 * 1024 * 0.6 / 4).toLong))
  }

  test("auto falls back to rescan (not a fake measurement) without stats") {
    val d = docs("stats")
    // RDD-backed frames report the defaultSizeInBytes sentinel
    val noStats = spark.createDataFrame(d.rdd, d.schema)
    assert(Dedup.pickVerify(noStats, "auto", "spec") == "rescan")
    // a tiny local frame with real stats takes the cheap no-persist shape
    // (r22: recompute replaced cached as the below-budget resolution)
    assert(Dedup.pickVerify(d, "auto", "spec") == "recompute")
    // the persist strategies stay explicitly selectable
    assert(Dedup.pickVerify(d, "cached", "spec") == "cached")
    assert(Dedup.pickVerify(d, "recompute", "spec") == "recompute")
  }
}
