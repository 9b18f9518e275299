package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

  private def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** w-token shingles of a text column. */
  def shingles(text: Column, w: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n >= w,
      transform(sequence(lit(0), n - w), i => array_join(slice(toks, i + 1, lit(w)), " ")))
      .otherwise(array(array_join(toks, " ")))
  }

  /** MinHash signature: k permutations approximated by min(md5(i || shingle))
    * per i — lexicographic min over hex strings is a valid uniform min-hash. */
  def minhashSignature(text: Column, w: Int, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles(text, w),
        s => md5(concat(i.cast("string"), lit(":"), s)))))

  /** LSH banding: signature (length k) → b bands of r rows, hashed. */
  def bands(signature: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)),
      i => struct(i.as("band_id"),
        md5(array_join(slice(signature, i * r + 1, lit(r)), "|")).as("band_hash")))

  /** Candidate near-duplicate pairs via MinHash LSH. Returns (id_a, id_b)
    * with id_a < id_b, distinct. Shuffles: one explode+groupBy on band hash. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        w: Int = 3, k: Int = 16, b: Int = 4): DataFrame = {
    val r = k / b
    val sig = df.select(col(idCol).as("__id"),
      minhashSignature(col(textCol), w, k).as("__sig"))
    val banded = sig.select(col("__id"), explode(bands(col("__sig"), b, r)).as("__band"))
      .select(col("__id"), col("__band.band_id"), col("__band.band_hash"))
    val a = banded.withColumnRenamed("__id", "id_a")
    val bb = banded.withColumnRenamed("__id", "id_b")
    a.join(bb, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram Jaccard similarity between two text columns. */
  def jaccard(textA: Column, textB: Column, w: Int): Column = {
    val sa = array_distinct(shingles(textA, w))
    val sb = array_distinct(shingles(textB, w))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(array_union(sa, sb)).cast("double")
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** MinHash-LSH near-dup pairs verified by exact Jaccard ≥ threshold.
    * Candidates come from LSH (bounded); verification joins text back in. */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
                     w: Int = 3, k: Int = 16, b: Int = 4,
                     threshold: Double = 0.8): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, w, k, b)
    val t = df.select(col(idCol), col(textCol))
    val withText = cands
      .join(t.withColumnRenamed(idCol, "id_a").withColumnRenamed(textCol, "__ta"), Seq("id_a"))
      .join(t.withColumnRenamed(idCol, "id_b").withColumnRenamed(textCol, "__tb"), Seq("id_b"))
    withText
      .withColumn("jaccard", round(jaccard(col("__ta"), col("__tb"), w), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact dedup: keep the smallest id per distinct text digest.
    * Aggregates on md5(text), not text itself — tiny shuffle keys. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    df.groupBy(md5(col(textCol)).as("__digest"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__digest")
      .join(df, Seq(idCol))
  }

  /** SimHash (64-bit, from md5 halves): per-token signed bit votes.
    * Pure Column composition: for each bit position, sum votes over tokens. */
  def simhash(text: Column, bits: Int = 16): Column = {
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
}
