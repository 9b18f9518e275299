package graft

import org.apache.spark.sql.SparkSession

/** Shared rig for the H2O-family bench mains (GroupByBench, GroupByProbe,
  * JoinBench, StreamThroughputProbe): one SparkSession builder and the two
  * operational lessons the N=1e9 runs taught. The one-off EVIDENCE probes
  * (SpillProbe, NdvProbe, ScaleProbe, ...) deliberately keep their own
  * builders — their recorded runs in BASELINE.md/SCALE.md cite the exact
  * rig they ran under (constrained heaps, pinned thread counts), and
  * retrofitting them onto a shared movable rig would detach those records
  * from their reproduction recipe.
  *
  * - `SPARK_GRAFT_CPUS` sizes local parallelism AND shuffle partitions.
  * - `SPARK_GRAFT_SHUFFLE_CODEC=zstd` for data-sized shuffles: a
  *   near-unique-key aggregate or two-sided big join writes ~raw-data
  *   bytes of shuffle, which outruns this host's scratch disk at lz4;
  *   zstd roughly halves it. Defaults to lz4 (Spark's default) so
  *   smaller-N records stay comparable across rounds.
  * - `reclaim()` between queries: shuffle files are deleted only when
  *   their ShuffleDependency is GC'd, and a ~100 GB heap can run 20
  *   query executions without a single full GC — at N=1e9 the
  *   accumulated temp_shuffle files are tens of GB and filled the disk
  *   before the cleaner ever fired.
  */
object BenchSession {

  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_CODEC", "lz4"))
      // TIME dtype keys may run under bench rigs; builder-set, never
      // mutated inside a query lambda
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def reclaim(): Unit = { System.gc(); Thread.sleep(200) }

  /** Select queries by exact name or whole-segment prefix ("q1" matches
    * q1_sum_by_id1 but NOT q10_sum_count_by_id1_6; "j5" matches
    * j5_big_inner_id3). Every requested name must match at least one
    * query — a typo'd name otherwise selects nothing and the tool would
    * emit a bogus 0-second "result" that scripts grepping for the metric
    * line record as real (the silent-empty-run footgun). */
  def select[T](all: Seq[(String, T)], wanted: Seq[String]): Seq[(String, T)] = {
    def matches(name: String, w: String) =
      name == w || name.startsWith(w + "_")
    wanted.foreach { w =>
      require(all.exists(q => matches(q._1, w)),
        s"no query matches '$w' — known: ${all.map(_._1).mkString(", ")}")
    }
    if (wanted.isEmpty) all
    else all.filter { case (name, _) => wanted.exists(matches(name, _)) }
  }
}
