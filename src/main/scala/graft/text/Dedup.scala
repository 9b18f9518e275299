package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed around
  * Spark's shuffle model:
  *
  *  - exact: one hash-aggregate on a digest of the text (never groupBy the
  *    raw 100 KB text — group the 16-byte md5).
  *  - MinHash + LSH: shingle → k min-hashes → band → self-join on
  *    (band_id, band_hash). The self-join is an equi-join on the band hash,
  *    so candidate generation is shuffle-bounded by bucket sizes, not O(n²).
  *  - SimHash: 64-bit bit-majority signature; near-dups share signature
  *    (or band thereof).
  *  - n-gram Jaccard: exact verification on LSH candidates only.
  *
  * Hash primitive is md5 (hex string): identical across engines, which keeps
  * every step DuckDB-oracle-checkable. xxhash64 would be faster; swap via
  * `hashFn` once correctness is locked.
  */
object Dedup {

  // the HOF split, NOT the native kernel: this feeds only the *Hof
  // reference formulations below, whose whole point is to pin the native
  // expressions against an independently-evaluated Column composition
  private def tokens(text: Column): Column = TextAnalysis.tokensHof(text)

  /** w-token shingles of a text column — native one-pass expression
    * ([[graft.functions.ShinglesExpr]]); byte-identical to [[shinglesHof]]. */
  def shingles(text: Column, w: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.ShinglesExpr(Bridge.expression(text), w))
  }

  /** Reference formulation of [[shingles]] as pure Column composition —
    * kept for the equivalence spec and as documentation of the semantics. */
  def shinglesHof(text: Column, w: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n >= w,
      transform(sequence(lit(0), n - w), i => array_join(slice(toks, i + 1, lit(w)), " ")))
      .otherwise(array(array_join(toks, " ")))
  }

  /** MinHash signature: k permutations approximated by min(md5(i || shingle))
    * per i — lexicographic min over hex strings is a valid uniform min-hash. */
  def minhashSignature(text: Column, w: Int, k: Int): Column =
    signatureFromShingles(shingles(text, w), k)

  /** Signature from a pre-materialized shingle column. Materialize shingles
    * in their own projection first — inlining the shingle expression into
    * the k-way transform re-derives it k times per row (measured 3-4× on
    * the dedup pipeline).
    *
    * Evaluated by the native codegen expression [[graft.functions.MinHashMd5]]
    * (one JVM loop, stays inside WholeStageCodegen); byte-identical to
    * [[signatureFromShinglesHof]], which is the spec/oracle formulation. */
  def signatureFromShingles(sh: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.MinHashMd5(Bridge.expression(sh), k))
  }

  /** Reference formulation of [[signatureFromShingles]] as pure Column
    * composition (interpreted higher-order functions) — kept for the
    * equivalence spec and as documentation of the exact semantics. */
  def signatureFromShinglesHof(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh,
        s => md5(concat(i.cast("string"), lit(":"), s)))))

  /** LSH banding: signature (length k) → b bands of r rows, hashed. */
  def bands(signature: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)),
      i => struct(i.as("band_id"),
        md5(array_join(slice(signature, i * r + 1, lit(r)), "|")).as("band_hash")))

  /** (id, distinct shingles) projection — the shared first stage of the
    * MinHash pipeline. Its own projection so downstream stages read the
    * materialized array instead of re-deriving it.
    *
    * The hash stage is CPU-bound, so parallelism matters: a compact input
    * (one parquet row-group) would otherwise pin the corpus on one task.
    * `parallelism` > 0 fans the input out to that many partitions;
    * 0 (the scale default) respects the input's own partitioning — at real
    * scale the scan already has thousands of partitions and a forced
    * repartition would be a full corpus shuffle. The caller decides: this
    * deliberately does NOT probe the input's partition count (a `df.rdd`
    * probe forces physical planning per pipeline call and bypasses the
    * AQE-final view). */
  private def shingled(df: DataFrame, idCol: String, textCol: String, w: Int,
                       parallelism: Int): DataFrame = {
    val in = if (parallelism > 0) df.repartition(parallelism) else df
    in.select(col(idCol).as("__id"),
      array_distinct(shingles(col(textCol), w)).as("__sh"))
  }

  private def bandedIds(sh: DataFrame, k: Int, b: Int): DataFrame = {
    val r = k / b
    sh.select(col("__id"), signatureFromShingles(col("__sh"), k).as("__sig"))
      .select(col("__id"), explode(bands(col("__sig"), b, r)).as("__band"))
      .select(col("__id"), col("__band.band_id"), col("__band.band_hash"))
  }

  /** id<id candidate pairs from banded signatures — a streaming bucket
    * self-join on (band_id, band_hash): both join sides are projections of
    * ONE repartitioned frame (a single exchange, reused), and Spark's join
    * streams each bucket's cross pairs through spillable match buffers, so
    * memory stays O(bucket), never O(bucket²). The pre-r12 formulation
    * (collect_set → nested transform → explode) materialized a bucket's
    * entire pair array inside one row — safe only while banded buckets stay
    * small, and the embedding twin OOM'd the sf1 sweep on exactly that
    * shape ([[graft.ml.Similarity.embeddingNearDups]] r9); this mirrors its
    * fix. A pair colliding in several bands is emitted once per band; the
    * final distinct dedups (the old shape needed it too). Pair-count
    * blow-up (a bucket of n ids emits n(n-1)/2 pairs) is inherent to LSH,
    * not to the formulation; tune b/r for the corpus.
    *
    * `maxBucket` > 0 drops buckets larger than the cap before any pair
    * materializes. The counts, the drop list, and both join sides all
    * derive from the ONE repartitioned frame: the shingle/MinHash/band
    * pipeline computes once, its exchange is written once, and every
    * consumer (the count aggregate, the anti-join, both self-join inputs)
    * is a ReusedExchange read — the r12 formulation counted over `banded`
    * directly, which planned a second independent subtree and re-ran the
    * whole signature pipeline per run (r12 ADVICE). The drop list, not the
    * keep list, is broadcast: at corpus scale almost every bucket survives
    * the cap, so the survivors would never fit a broadcast while the
    * degenerates (rare by construction — near-empty documents sharing a
    * band hash) always do. A degenerate bucket's rows now ride the single
    * exchange before the anti-join drops them — rows, not pairs, and only
    * once; the n²/2 pair blow-up they'd cause still never happens.
    * Oversized buckets carry almost no dedup signal — dropping them is
    * standard MinHash-LSH practice. */
  private def pairsFromBuckets(banded: DataFrame, maxBucket: Int = 0): DataFrame = {
    val part = banded.repartition(col("band_id"), col("band_hash"))
    val pruned =
      if (maxBucket > 0) {
        val over = part.groupBy(col("band_id"), col("band_hash"))
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") > maxBucket)
          .select(col("band_id"), col("band_hash"))
        part.join(broadcast(over), Seq("band_id", "band_hash"), "left_anti")
      } else part
    val l = pruned.select(col("band_id"), col("band_hash"), col("__id").as("id_a"))
    val r = pruned.select(col("band_id"), col("band_hash"), col("__id").as("id_b"))
    l.join(r, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Candidate near-duplicate pairs via MinHash LSH. Returns (id_a, id_b)
    * with id_a < id_b, distinct. Shuffles: one groupBy on band hash.
    * `maxBucket` > 0 drops degenerate LSH buckets (see [[pairsFromBuckets]]);
    * at corpus scale set it (e.g. 1000) — a bucket that large is noise. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        w: Int = 3, k: Int = 16, b: Int = 4,
                        maxBucket: Int = 0, parallelism: Int = 0): DataFrame =
    pairsFromBuckets(
      bandedIds(shingled(df, idCol, textCol, w, parallelism), k, b), maxBucket)

  /** Exact n-gram Jaccard similarity between two text columns. */
  def jaccard(textA: Column, textB: Column, w: Int): Column = {
    val sa = array_distinct(shingles(textA, w))
    val sb = array_distinct(shingles(textB, w))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(array_union(sa, sb)).cast("double")
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** Exact Jaccard over two pre-distinct shingle arrays. */
  def jaccardFromShingles(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = (size(sa) + size(sb)).cast("double") - inter
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** Live verify-stage persists, oldest first: the candidate pairs in
    * `rescan` mode, the shingle projection in `cached` mode (see
    * [[nearDuplicates]]). The registry holds at most
    * `spark.graft.dedup.maxLivePersists` frames (default
    * [[DefaultMaxLivePersists]]) — when a new call would exceed it, the
    * OLDEST is unpersisted WITH A WARNING (an evicted frame still mid-query
    * recomputes correctly but silently loses its cache; raise the conf if
    * you genuinely run more concurrent pipelines) — so cached storage
    * stays bounded under repeated calls while up to that many CONCURRENT
    * or interleaved pipelines (e.g. a `nearDuplicates` and a
    * `fuzzyNearDuplicates` whose results are both consumed later) each
    * keep their cache live instead of silently unpersisting each other's
    * mid-query (r18 verdict: the previous single slot did exactly that).
    *
    * STORAGE BOUND (ADVICE r19): in `cached` verify mode each live frame
    * is a corpus-sized shingle projection (~[[ShingleInflation]]× the
    * compressed input — ~28 GB at sf100), so callers that never call
    * [[releaseCache]] can hold up to maxLivePersists × that. `rescan`
    * mode persists only candidate PAIRS (metadata-scale). Call
    * [[releaseCache]] after consuming results to drop all. */
  private val DefaultMaxLivePersists = 4
  // The registry is process-global while the cap is read from the
  // REGISTERING frame's session, so in a multi-session JVM the effective
  // cap is last-writer-wins across sessions (ADVICE r20 — documented
  // tradeoff; concurrent pipelines in one JVM share one storage pool, so a
  // per-session registry would not bound the actual resource any better).
  private val livePersists = new java.util.ArrayDeque[DataFrame]()

  private def registerPersist(df: DataFrame): Unit =
    livePersists.synchronized {
      val cap = df.sparkSession.conf
        .getOption("spark.graft.dedup.maxLivePersists")
        .flatMap { v =>
          val parsed = scala.util.Try(v.trim.toInt).toOption
          if (parsed.isEmpty)
            log.warn(s"spark.graft.dedup.maxLivePersists='$v' is not an " +
              s"integer; falling back to the default $DefaultMaxLivePersists")
          parsed
        }.getOrElse(DefaultMaxLivePersists)
      livePersists.addLast(df)
      while (livePersists.size > math.max(1, cap)) {
        log.warn(s"dedup persist registry over its cap ($cap): evicting the " +
          "oldest unreleased verify cache — a pipeline still consuming it " +
          "will recompute instead of reading cache. Call Dedup.releaseCache()" +
          " after consuming results, or raise spark.graft.dedup.maxLivePersists.")
        livePersists.pollFirst().unpersist(blocking = false)
      }
    }

  /** Unpersist every frame cached by [[nearDuplicates]] /
    * [[fuzzyNearDuplicates]] calls still in the registry. Safe to call at
    * any time. */
  def releaseCache(): Unit = livePersists.synchronized {
    while (!livePersists.isEmpty)
      livePersists.pollFirst().unpersist(blocking = false)
  }

  /** Test hook: number of verify-stage persists currently live. */
  private[graft] def liveCacheCount: Int =
    livePersists.synchronized(livePersists.size)

  /** Candidate-id sets at or below this count get a broadcast hint on the
    * verify-side semi join (ids are a narrow id column — 4M ids ≈ tens of
    * MB hashed); above it the semi join falls back to a shuffle, which AQE
    * may still convert at runtime. */
  private val BroadcastIdCap = 4L * 1000 * 1000

  /** Measured in-memory blow-up of the cached (id, shingles) projection
    * over the input's compressed parquet bytes: 28 GB cache from 0.57 GB
    * of documents at sf100 (SCALE.md) ≈ 49×. Rounded down to keep the
    * auto-switch conservative about choosing `cached`. */
  private val ShingleInflation = 48L

  /** How many multiples of the storage budget the estimated corpus-shingle
    * footprint may reach before `auto` abandons `recompute` for `rescan`.
    * `recompute` persists nothing, so the budget is a proxy for the real
    * limit — the verify joins carry the FULL corpus-shingle projection,
    * and once it dwarfs execution memory those joins spill while
    * `rescan`'s candidate-semi-filtered verify touches only ~12% of docs.
    * Bracketing measurements (DedupVerifyProbe, this host, 2 GB budget):
    * at 1.3× budget (sf10) recompute beat rescan 4.91 vs 6.29 s; at 13×
    * (sf100) it lost 35.2 vs 28.1 s. The switch sits at the geometric
    * midpoint 4× — re-probe to narrow it if a workload lands between. */
  private val RecomputeBudgetFactor = 4L

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Missing-stats sentinel: Catalyst reports `spark.sql.defaultSizeInBytes`
    * (Long.MaxValue by default) for plans it cannot size — e.g. RDD-backed
    * frames or views without statistics. Anything above 1 PiB is a
    * "don't know", not a measurement. */
  private val StatsSentinel = BigInt(1L << 50)

  /** Cache budget from executor confs when they are set: executor memory ×
    * `spark.memory.fraction` (default 0.6) is the unified region a worker
    * actually has for storage, quartered like the local-heap fallback. On
    * clusters this is what the `auto` verify switch should see — the
    * driver JVM's own heap says nothing about executor storage. */
  private[graft] def budgetFromConfs(execMem: Option[String],
                                     fraction: Option[Double]): Option[Long] =
    execMem.map { m =>
      val bytes =
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(m)
      (bytes * fraction.getOrElse(0.6) / 4).toLong
    }

  /** The `auto` verify budget: executor-conf-derived on a CLUSTER master,
    * local JVM heap on a local one — local mode IGNORES
    * `spark.executor.memory` at runtime (the driver heap is the only
    * storage), so a local session carrying cluster-default confs must not
    * derive its budget from them (ADVICE r19). */
  private[graft] def autoBudget(master: String, execMem: Option[String],
                                fraction: Option[Double]): Long =
    (if (master.startsWith("local")) None
     else budgetFromConfs(execMem, fraction))
      .getOrElse(Runtime.getRuntime.maxMemory() / 4)

  /** Resolve the verify strategy (see [[nearDuplicates]] for semantics):
    * `auto` picks `rescan` when the estimated corpus-shingle footprint
    * (optimizer-stats input bytes × [[ShingleInflation]]) exceeds
    * [[RecomputeBudgetFactor]] × the storage budget — derived from
    * `spark.executor.memory` × `spark.memory.fraction` when those confs
    * are set, else from the local JVM heap — or when the input has no
    * usable stats at all (the sentinel default would otherwise silently
    * force `rescan` as if it were a measurement; it still resolves to
    * `rescan` — the bounded-state shape is the safe call for an
    * unknown-size input — but the choice is logged). Below the line,
    * `auto` resolves to `recompute` since r22: DedupVerifyProbe measured
    * recompute faster than the `cached` persist it replaced at every SF
    * where either fits (sf0.1: 0.795 vs 0.821 s; sf10: 4.91 vs 6.40 s,
    * 1.30×) — the corpus-shingle persist costs more to build and hold
    * than the shingle kernels cost to re-run now that they are
    * allocation-free byte loops (r21). The recompute↔rescan crossover is
    * measured on [[RecomputeBudgetFactor]]. */
  private[graft] def pickVerify(df: DataFrame, verify: String,
                                what: String): String =
    verify match {
      case "auto" =>
        val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
        val conf = df.sparkSession.conf
        val budget = autoBudget(df.sparkSession.sparkContext.master,
          conf.getOption("spark.executor.memory"),
          conf.getOption("spark.memory.fraction").map(_.toDouble))
        if (est >= StatsSentinel) {
          log.info(s"$what: input stats unavailable (sizeInBytes=$est); " +
            "auto-picking the bounded-state 'rescan' verify — pass " +
            "verify=\"recompute\" explicitly if the input is known-small")
          "rescan"
        } else if (est * ShingleInflation >
                     BigInt(RecomputeBudgetFactor) * budget) "rescan"
        else "recompute"
      case m @ ("rescan" | "cached" | "recompute") => m
      case other => throw new IllegalArgumentException(
        s"verify must be auto|rescan|cached|recompute, got '$other'")
    }

  /** Verify front end for the `rescan` strategy: run LSH candidate
    * generation, persist the (small) pair set eagerly — the one `count`
    * both materializes it and drives the broadcast decision — and return
    * it together with the distinct candidate-id set named `idCol`
    * (broadcast-hinted at or below [[BroadcastIdCap]]) for semi-filtering
    * the verify side. */
  private def persistedCandidates(df: DataFrame, idCol: String,
                                  textCol: String, w: Int, k: Int, b: Int,
                                  maxBucket: Int, parallelism: Int)
      : (DataFrame, DataFrame) = {
    val cands = pairsFromBuckets(
      bandedIds(shingled(df, idCol, textCol, w, parallelism), k, b), maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    registerPersist(cands)
    val nPairs = cands.count()
    val ids = cands.select(explode(array(col("id_a"), col("id_b"))).as(idCol))
      .distinct()
    (cands, if (2 * nPairs <= BroadcastIdCap) broadcast(ids) else ids)
  }

  /** Shared Jaccard verify tail: join the candidate pairs back to a
    * (__id, __sh) shingle frame on both sides and keep pairs at or above
    * the threshold. */
  private def verifyJaccard(cands: DataFrame, sh: DataFrame,
                            threshold: Double): DataFrame =
    cands
      .join(sh.select(col("__id").as("id_a"), col("__sh").as("__sha")), Seq("id_a"))
      .join(sh.select(col("__id").as("id_b"), col("__sh").as("__shb")), Seq("id_b"))
      .withColumn("jaccard", round(jaccardFromShingles(col("__sha"), col("__shb")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** MinHash-LSH near-dup pairs verified by exact Jaccard ≥ threshold.
    * Result is identical under either verify strategy; the strategies
    * trade fixed latency against bounded state:
    *
    *  - `verify = "rescan"` (r18, the corpus-scale shape): candidate
    *    generation streams the shingle/MinHash/band pipeline through ONE
    *    exchange and the resulting (id_a, id_b) pairs — bounded by LSH
    *    bucket collisions, orders of magnitude smaller than the corpus —
    *    are what gets persisted (eagerly: one `count` materializes them
    *    and drives the broadcast decision). Verification re-derives
    *    shingles ONLY for documents appearing in some pair: a semi-join of
    *    the raw input on the candidate-id set (broadcast-hinted below
    *    [[BroadcastIdCap]] ids, shuffle otherwise) + a second shingle pass
    *    over that slice (~12% of docs at sf100). Replaces the corpus-wide
    *    shingle cache (28 GB + 10 GB spill at sf100) and its two
    *    full-corpus verify shuffles: 67.1 → 23.1 s steady-state at sf100
    *    (SCALE.md). State is bounded by the candidate set at ANY corpus
    *    size. The input is scanned twice — pass a directly scannable
    *    frame, or persist `df` first if it is an expensive derivation.
    *  - `verify = "recompute"` (r22, the small-input shape): no persist
    *    anywhere — candidate generation and both verify sides each derive
    *    the shingle projection from the input directly, one action, zero
    *    extra jobs, zero storage footprint. Since the shingle/minhash
    *    kernels became allocation-free byte loops (r21), re-running them
    *    is cheaper than building + holding the corpus-shingle cache:
    *    DedupVerifyProbe measured recompute vs cached 0.795 vs 0.821 s at
    *    sf0.1 and 4.91 vs 6.40 s (1.30×) at sf10. The input is scanned
    *    three times — pass a directly scannable frame, or persist `df`
    *    yourself if it is an expensive derivation.
    *  - `verify = "cached"` (r12): persist the corpus (id, shingles)
    *    projection MEMORY_AND_DISK and join the verify sides back to it —
    *    a single action with no extra job launches, but the cache is ~50×
    *    the input parquet bytes ([[ShingleInflation]]), becomes the
    *    bottleneck long before 100 TB, and measured SLOWER than
    *    `recompute` even where it fits (the build + memory pressure cost
    *    more than the re-derivation). Kept for callers whose input frame
    *    is itself expensive to recompute.
    *  - `verify = "auto"` (default): `rescan` when the estimated cache
    *    footprint exceeds a quarter of the storage budget ([[pickVerify]]:
    *    `spark.executor.memory` × `spark.memory.fraction` when set — the
    *    conf-driven cluster path — else the local JVM heap), or when the
    *    input has no usable optimizer stats (logged; pass the mode
    *    explicitly for known-small derived inputs); `recompute` below it
    *    (r22 — previously `cached`; same results, measured faster).
    *
    * `parallelism` > 0 fans an under-partitioned input out to that many
    * tasks before the CPU-bound shingle/hash stages (see [[shingled]]);
    * 0 respects input partitioning. */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
                     w: Int = 3, k: Int = 16, b: Int = 4,
                     threshold: Double = 0.8, maxBucket: Int = 0,
                     parallelism: Int = 0,
                     verify: String = "auto"): DataFrame =
    pickVerify(df, verify, "nearDuplicates") match {
      case "rescan" =>
        val (cands, idsHinted) =
          persistedCandidates(df, idCol, textCol, w, k, b, maxBucket,
            parallelism)
        val shV = shingled(df.join(idsHinted, Seq(idCol), "left_semi"),
          idCol, textCol, w, parallelism)
        verifyJaccard(cands, shV, threshold)
      case "recompute" =>
        // no persist: the same deterministic shingle subtree is planted in
        // candidate generation and in each verify side — three derivations
        // from the input, zero cached state (see strategy docs above)
        val sh = shingled(df, idCol, textCol, w, parallelism)
        verifyJaccard(pairsFromBuckets(bandedIds(sh, k, b), maxBucket), sh,
          threshold)
      case _ =>
        val sh = shingled(df, idCol, textCol, w, parallelism)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        registerPersist(sh)
        verifyJaccard(pairsFromBuckets(bandedIds(sh, k, b), maxBucket), sh,
          threshold)
    }

  /** Fuzzy near-duplicates: the SAME banded-MinHash candidate generation
    * as [[nearDuplicates]], but verified by EDIT-distance similarity
    * (1 − lev/maxlen) on a length-capped text prefix instead of shingle
    * Jaccard — the verify used when token reordering should NOT count as
    * similar (boilerplate detection, template spam). Scale shape: edit
    * distance is O(len²) per pair, so it only ever runs on LSH candidate
    * pairs (never all-pairs) and on a `capChars` prefix that bounds the
    * worst case; Spark's `levenshtein` is codegen'd. Pairs where both
    * prefixes are empty have no defined similarity and are dropped.
    * `verify` behaves as on [[nearDuplicates]]: under `rescan` the prefix
    * side is semi-filtered to candidate ids (persisted pairs + eager
    * count + broadcast-hinted id set) so the full corpus's text prefixes
    * never shuffle; under `cached` the prefixes join directly (no persist
    * needed — prefixes are recomputed per side, a substring of a scan).
    * NOTE the `auto` tradeoff differs here: `cached` and `recompute` are
    * the SAME pipeline for the fuzzy verify (nothing is ever persisted on
    * this path), so the shingle-inflation heap rationale does not
    * apply — what `auto`'s `rescan` buys instead is shuffle volume (the
    * capChars-bounded corpus prefixes, ~`capChars` bytes/doc, never
    * shuffle; only the candidate slice does), paid for with the extra
    * candidate-count job and a second input scan. At corpus scale that is
    * still the right default; for small inputs pass `verify="cached"`. */
  def fuzzyNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                          w: Int = 3, k: Int = 16, b: Int = 4,
                          threshold: Double = 0.8, capChars: Int = 400,
                          maxBucket: Int = 0, parallelism: Int = 0,
                          verify: String = "auto"): DataFrame = {
    val (cands, txtSrc) = pickVerify(df, verify, "fuzzyNearDuplicates") match {
      case "rescan" =>
        val (c, idsHinted) =
          persistedCandidates(df, idCol, textCol, w, k, b, maxBucket,
            parallelism)
        (c, df.join(idsHinted, Seq(idCol), "left_semi"))
      case _ =>
        (minhashCandidates(df, idCol, textCol, w, k, b, maxBucket,
          parallelism), df)
    }
    val txt = txtSrc.select(col(idCol),
      substring(col(textCol), 1, capChars).as("__t"))
    val denom = greatest(length(col("__ta")), length(col("__tb")))
    cands
      .join(txt.select(col(idCol).as("id_a"), col("__t").as("__ta")), Seq("id_a"))
      .join(txt.select(col(idCol).as("id_b"), col("__t").as("__tb")), Seq("id_b"))
      .withColumn("edit_sim", when(denom > 0,
        round((lit(1.0) -
          levenshtein(col("__ta"), col("__tb")).cast("double") / denom) * 1e4) / 1e4))
      .filter(col("edit_sim") >= threshold)
      .select("id_a", "id_b", "edit_sim")
  }

  /** Repeated token-span detection (substring-level dedup, the public
    * "Deduplicating Training Data Makes Language Models Better" recipe
    * restricted to fixed-width spans): lowercase-whitespace tokenize, slide
    * an `n`-token window, and surface spans appearing in >= `minDocs`
    * DISTINCT documents, most-shared first.
    *
    * Scale shape: the canonical two-exchange exact count-distinct ladder —
    * partial aggregation on (md5(span), id), final aggregation on md5(span)
    * — so every shuffle is keyed by the 16-byte digest (the [[exact]]
    * policy); the raw span text rides as a value column, never a key
    * (PlanSpec pins this). The final top-k is TakeOrderedAndProject (no
    * global sort materialization). Window expansion is the native one-pass
    * [[graft.functions.ShinglesExpr]] kernel (codegen'd, no interpreted
    * HOFs) — linear work, no self-join anywhere. Documents shorter than `n`
    * tokens emit one degenerate short span (the ShinglesExpr contract);
    * the token-count filter below drops those. */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 8, minDocs: Int = 2, topK: Int = 50): DataFrame = {
    val spans = df
      .select(col(idCol).as("__id"),
        explode(shingles(col(textCol), n)).as("span"))
      .filter(size(split(col("span"), " ")) === n)
    spans
      .groupBy(md5(col("span")).as("__h"))
      .agg(first(col("span")).as("span"),
        countDistinct(col("__id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("span"))
      .limit(topK)
      .select("span", "n_docs", "n_occ")
  }

  /** Benchmark decontamination — the n-gram overlap check every LLM
    * training pipeline runs before training (the public recipe: e.g. GPT-3
    * appendix C, 13-gram overlap): count the distinct `w`-gram collisions
    * each corpus document has with an evaluation/benchmark set.
    *
    * Scale shape: the benchmark set is SMALL by definition, so its
    * distinct n-gram digests broadcast; the corpus streams through the
    * native shingle kernel ONCE — a broadcast join and a groupBy on doc id,
    * no shuffle of corpus text, no self-join. Returns (idCol, n_hits) for
    * documents with ≥ 1 colliding n-gram. */
  def contaminationHits(corpus: DataFrame, idCol: String, textCol: String,
                        bench: DataFrame, benchTextCol: String,
                        w: Int = 13): DataFrame = {
    def grams(text: Column) =
      explode(array_distinct(shingles(text, w))).as("__g")
    val benchGrams = bench.select(grams(col(benchTextCol)))
      .filter(size(split(col("__g"), " ")) === w) // drop short-doc degenerates
      .select(md5(col("__g")).as("__h")).distinct()
    val docGrams = corpus.select(col(idCol), grams(col(textCol)))
      .filter(size(split(col("__g"), " ")) === w)
      .select(col(idCol), md5(col("__g")).as("__h"))
    docGrams.join(broadcast(benchGrams), Seq("__h"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
  }

  /** Sketch form of [[contaminationHits]]: the benchmark n-gram digests go
    * into a Bloom filter ([[graft.functions.bloomAgg]] — Spark's native
    * runtime-filter sketch) instead of a broadcast digest SET, and the
    * corpus probes the sketch inline ([[graft.functions.bloomMightContain]]
    * — codegen'd, no join at all). Trade: the sketch is CONSTANT-size
    * (numBits/8 bytes however large the benchmark grows — the exact set
    * broadcast grows linearly), at the cost of a bounded false-positive
    * rate; never false-negative, so no contaminated document escapes.
    * That is the right shape when the "benchmark" side is itself huge
    * (e.g. decontaminating against another full corpus — note Spark's
    * default runtime-filter confs cap the sketch at 2^26 bits / 4M
    * items; raise `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` /
    * `...maxNumItems` for corpus-scale benchmarks). Returns
    * (idCol, n_hits) counting DISTINCT n-grams whose digest the sketch
    * accepts — a superset of the exact hit set. */
  def contaminationHitsBloom(corpus: DataFrame, idCol: String, textCol: String,
                             bench: DataFrame, benchTextCol: String,
                             w: Int = 13, numBits: Long = 1L << 23): DataFrame = {
    def grams(text: Column) =
      explode(array_distinct(shingles(text, w))).as("__g")
    val benchGrams = bench.select(grams(col(benchTextCol)))
      .filter(size(split(col("__g"), " ")) === w)
      .select(md5(col("__g")).as("__h")).distinct()
    // ONE row of sketch bytes; the only thing that ever leaves the bench
    // side. expectedItems is a hint — numBits fixes the real size/fpp.
    val sketch = benchGrams
      .agg(graft.functions.bloomAgg(col("__h"), numBits / 16, numBits))
      .head.getAs[Array[Byte]](0)
    corpus.select(col(idCol), grams(col(textCol)))
      .filter(size(split(col("__g"), " ")) === w)
      .filter(graft.functions.bloomMightContain(lit(sketch), md5(col("__g"))))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
  }

  /** Drop corpus documents with ≥ `minHits` distinct n-gram collisions
    * against the benchmark set (anti-join on the flagged ids). */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    w: Int = 13, minHits: Int = 1): DataFrame = {
    val flagged = contaminationHits(corpus, idCol, textCol, bench, benchTextCol, w)
      .filter(col("n_hits") >= minHits).select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** Exact dedup: keep the smallest id per distinct text digest.
    * Aggregates on md5(text), not text itself — tiny shuffle keys. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    df.groupBy(md5(col(textCol)).as("__digest"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__digest")
      .join(df, Seq(idCol))
  }

  /** SimHash: per-distinct-token signed bit votes — native one-pass
    * expression ([[graft.functions.SimHashExpr]]); byte-identical to
    * [[simhashHof]]. */
  def simhash(text: Column, bits: Int = 16): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.SimHashExpr(Bridge.expression(text), bits))
  }

  /** Reference formulation of [[simhash]] as pure Column composition:
    * for each bit position, sum signed votes over token hashes. */
  def simhashHof(text: Column, bits: Int = 16): Column = {
    val toks = array_distinct(tokens(text))
    // token → int hash from first 8 hex chars of md5
    val th = transform(toks, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    // shiftright/shiftleft builtins take an Int literal; inside a lambda the
    // shift amount is a Column, so go through call_function.
    val bitVotes = transform(sequence(lit(0), lit(bits - 1)), i =>
      when(aggregate(th, lit(0L),
        (acc, h) => acc + when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L,
          lit(1L)).otherwise(lit(-1L))
      ) > 0, lit(1L)).otherwise(lit(0L)))
    aggregate(zip_with(bitVotes, sequence(lit(0), lit(bits - 1)),
      (bit, i) => call_function("shiftleft", bit, i)), lit(0L), (acc, v) => acc + v)
  }

  /** Hamming distance between two simhash values. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Duplicate CLUSTERS from near-dup pairs — the step after
    * [[nearDuplicates]] in every real dedup pipeline: connected components,
    * so each document gets the smallest id in its component as `cluster_id`
    * (the canonical-doc assignment).
    *
    * Algorithm: alternating large-star/small-star (Kiveris et al. 2014,
    * "Connected Components in MapReduce and Beyond" — the public
    * MapReduce-era recipe). Each phase is one groupBy + one equi-join,
    * both keyed on node id (shuffle-bounded, no driver data), and the
    * alternation converges in O(log n) phases even on adversarial
    * long-chain graphs, where the plain min-label propagation this
    * replaces needs O(diameter) rounds (a planted 1000-chain: ~15 phases
    * vs 999 rounds — property-spec'd). `localCheckpoint` cuts the growing
    * lineage per phase. Only ids that appear in `pairs` are emitted;
    * unpaired documents are their own singleton clusters by definition. */
  def duplicateClusters(pairs: DataFrame, aCol: String, bCol: String,
                        maxIter: Int = 60): DataFrame =
    duplicateClustersWithStats(pairs, aCol, bCol, maxIter)._1

  /** [[duplicateClusters]] plus the number of star phases it ran —
    * exposed so the convergence-bound property spec can assert the
    * O(log n) behavior instead of trusting the comment. */
  def duplicateClustersWithStats(pairs: DataFrame, aCol: String, bCol: String,
                                 maxIter: Int = 60): (DataFrame, Int) = {
    val ids = pairs.select(col(aCol).cast("long").as("doc_id"))
      .union(pairs.select(col(bCol).cast("long").as("doc_id"))).distinct()
    var edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()

    // large-star: every node links its LARGER neighbors to the minimum of
    // its neighborhood (incl. itself) — long tails fold up exponentially
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("__mn"))
        .select(col("u"), least(col("u"), col("__mn")).as("__m"))
      sym.join(m, Seq("u")).filter(col("v") > col("u"))
        .select(col("v").as("u"), col("__m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    // small-star: every node links its smaller-or-equal neighbors (and
    // itself) to the minimum among them
    def smallStar(e: DataFrame): DataFrame = {
      val o = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val m = o.groupBy("u").agg(min(col("v")).as("__m"))
      val wm = o.join(m, Seq("u"))
      wm.select(col("v").as("u"), col("__m").as("v"))
        .union(wm.select(col("u"), col("__m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }
    def sameSet(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

    var phases = 0
    var done = edges.isEmpty
    while (!done && phases < maxIter) {
      // large-star to its own fixpoint, then one small-star (the paper's
      // two-phase schedule); overall fixpoint = both phases are no-ops
      var lsDone = false
      while (!lsDone && phases < maxIter) {
        val nxt = largeStar(edges).localCheckpoint()
        lsDone = sameSet(nxt, edges)
        edges = nxt
        phases += 1
      }
      val ss = smallStar(edges).localCheckpoint()
      done = sameSet(ss, edges)
      edges = ss
      phases += 1
    }
    // fixpoint edges form a star per component: (node, component-min).
    // Nodes with no surviving edge (roots, self-pair-only ids) label
    // themselves.
    val labels = ids.join(edges.select(col("u").as("doc_id"), col("v")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("v"), col("doc_id")).as("cluster_id"))
    (labels, phases)
  }
}
