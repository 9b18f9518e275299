package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 embedding quantization — the standard
  * memory/IO lever for ANN at corpus scale (4× smaller vectors than f32,
  * 8× than f64; cosine between quantized vectors needs no dequantization
  * because the per-vector scales cancel). Beyond the reference's operator
  * set, in the same spirit as the IVF/LSH scale paths: at 100 TB the
  * embedding column dominates the table, and int8 cuts every shuffle,
  * cache, and scan of it by 4× while keeping cosine within ~1e-2.
  *
  * All pure codegen HOFs (`aggregate`/`transform`/`zip_with`) — no UDFs,
  * one projection, no shuffle.
  */
object Quantize {

  /** max|x| / 127 — the symmetric scale; 0-vectors quantize to all-zero
    * (scale null guards the division). */
  def int8Scale(vec: Column): Column = {
    val maxAbs = aggregate(vec, lit(0.0d), (a, x) => greatest(a, abs(x)))
    when(maxAbs === 0d, lit(null)).otherwise(maxAbs / 127.0d)
  }

  /** Quantize to int8 under `scale`: round(x/scale), clamped to
    * [-127, 127] — per-vector scales satisfy the bound by construction,
    * but a shared/global scale can put |x/scale| past 127, where an
    * unclamped double→tinyint cast would silently WRAP modulo 256
    * (300 → 44) instead of saturating. Both engines round doubles half
    * away from zero, so the oracle reproduces the exact codes. */
  def quantizeInt8(vec: Column, scale: Column): Column =
    when(scale.isNull, transform(vec, _ => lit(0).cast("tinyint")))
      .otherwise(transform(vec, x =>
        greatest(lit(-127d), least(lit(127d), round(x / scale)))
          .cast("tinyint")))

  /** Integer dot product of two int8 code vectors (exact in long). */
  def int8Dot(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Cosine between quantized vectors — the scales cancel, so this is
    * integer arithmetic plus one division. */
  def int8Cosine(qa: Column, qb: Column): Column =
    int8Dot(qa, qb).cast("double") /
      (sqrt(int8Dot(qa, qa).cast("double")) * sqrt(int8Dot(qb, qb).cast("double")))

  /** Frame-level helper: adds scale + code columns for `vecCol` (cast the
    * input to double upstream if it is float). */
  def withInt8(df: DataFrame, vecCol: String,
               qCol: String = "q8", scaleCol: String = "q8_scale"): DataFrame = {
    val v = col(vecCol)
    df.withColumn(scaleCol, int8Scale(v))
      .withColumn(qCol, quantizeInt8(v, col(scaleCol)))
  }

  /** Product quantization (Jégou et al. 2011, "Product Quantization for
    * Nearest Neighbor Search"; the PQ half of FAISS's IVF-PQ): split each
    * vector into `m` contiguous subvectors, train an independent
    * [[KMeans]] codebook per subspace, and encode every vector as `m`
    * small centroid ids. Storage per vector drops from dim doubles to
    * m codes (64×8 B → 4 B at m=4/k≤256) — the lever that makes
    * billion-vector ANN fit in memory.
    *
    * Execution shape: training is `m` independent KMeans runs over
    * SLICES of the same cached frame (per iteration: codegen argmin +
    * one k·subdim-row aggregate — vectors never shuffle); encoding is a
    * single projection computing all `m` argmins per row against
    * broadcast codebook literals. Same determinism contract as KMeans
    * (snapped-grid argmin, ties to smaller cid), so a SQL oracle replays
    * codebooks AND codes exactly.
    *
    * Returns (per-subspace codebooks, encoded frame): the frame keeps
    * `idCol` and gains `code_j` (int) + `err_j` (raw squared
    * subspace-reconstruction error) per subspace.
    */
  def productQuantize(df: DataFrame, idCol: String, vecCol: String,
                      m: Int, k: Int, iters: Int,
                      seed: DataFrame => Seq[(Int, Array[Double])])
      : (Seq[Seq[(Int, Array[Double])]], DataFrame) = {
    require(m > 0, "pq: m must be positive")
    val d = subDim(df, vecCol, m)
    val books = (0 until m).map { j =>
      val sub = df.select(col(idCol),
        slice(col(vecCol), lit(j * d + 1), lit(d)).as(vecCol))
      KMeans.train(sub, idCol, vecCol, seed(sub), iters)._1
    }
    val encoded = books.zipWithIndex.foldLeft(df) { case (acc, (cents, j)) =>
      val sv = slice(col(vecCol), lit(j * d + 1), lit(d))
      val best = array_min(KMeans.scoredL2(sv,
        graft.functions.dotProduct(sv, sv), cents))
      acc.withColumn(s"code_$j", best.getField("cid"))
        .withColumn(s"err_$j", best.getField("raw"))
    }
    (books, encoded)
  }

  /** Asymmetric distance computation (the search half of PQ): for each
    * query, squared L2 to every ENCODED vector is approximated as
    * Σ_j dtab_j[code_j], where dtab_j[c] = ‖q_j − codebook_j[c]‖² is an
    * m×k lookup table computed once per query on the driver and shipped
    * as literals. Scoring a database row is m array lookups + adds —
    * the raw vectors are never read at query time, which is what lets a
    * billion-vector index serve from code storage alone.
    *
    * The table entries use the expanded qq − 2·qc + cc form — the same
    * float path as the SQL oracle — and ranking orders on
    * round(adc·1e6) with ties to the id (the KMeans grid discipline).
    * One projection + one per-query TakeOrdered; no shuffle of the
    * encoded corpus.
    */
  def adcTopK(encoded: DataFrame, idCol: String,
              books: Seq[Seq[(Int, Array[Double])]],
              queries: Seq[(Long, Array[Double])], k: Int): DataFrame = {
    require(books.nonEmpty && queries.nonEmpty, "adc: empty books/queries")
    val m = books.size
    // positional table lookup (element_at(tab, code+1)) is only valid for
    // dense 0-based codebook ids — a seed convention that starts ids
    // elsewhere would silently null every score
    books.zipWithIndex.foreach { case (b, j) =>
      require(b.map(_._1).sorted == (0 until b.size),
        s"adc: codebook $j ids must be dense 0-based, got ${b.map(_._1).sorted}")
    }
    require(queries.head._2.length % m == 0,
      s"adc: query dim ${queries.head._2.length} not divisible by m=$m")
    val d = queries.head._2.length / m
    val qStructs = queries.map { case (qid, qv) =>
      val tabs = (0 until m).map { j =>
        val qs = qv.slice(j * d, (j + 1) * d)
        val qq = qs.map(x => x * x).sum
        books(j).sortBy(_._1).map { case (_, c) =>
          val qc = qs.zip(c).map { case (a, b) => a * b }.sum
          val cc = c.map(x => x * x).sum
          qq - 2 * qc + cc
        }.toArray
      }
      struct(lit(qid).as("qid") +:
        tabs.zipWithIndex.map { case (tab, j) =>
          array(tab.map(lit): _*).as(s"tab_$j")
        }: _*)
    }
    val q = explode(array(qStructs: _*)).as("__q")
    val adc = (0 until m).map(j =>
      element_at(col(s"__q.tab_$j"), col(s"code_$j") + 1)).reduce(_ + _)
    val scored = encoded
      .select(col(idCol) +: (0 until m).map(j => col(s"code_$j")) :+ q: _*)
      .withColumn("adc", adc)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__q.qid"))
      .orderBy(round(col("adc") * 1e6).cast("long").asc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__q.qid").as("query_id"), col(idCol), col("rank"),
        (round(col("adc") * 1e4) / 1e4).as("adc"))
  }

  /** IVF-PQ (the full FAISS IndexIVFPQ composition): coarse-quantize
    * every vector to its nearest [[KMeans]] cell, PQ-encode the RESIDUAL
    * (x − cell centroid) with one shared codebook set, and search by
    * probing the query's `nprobe` nearest cells with a per-(query, cell)
    * ADC table over the query's residual in that cell. Encoded storage is
    * (cell id + m codes) per vector; search touches only the probed
    * cells' codes — the shape that serves billion-vector ANN from RAM.
    *
    * All driver-side math (probe selection, residual tables) follows the
    * snapped-grid discipline (round(d²·1e6), ties to smaller id), so the
    * whole build+search replays in SQL. Returns (residual codebooks,
    * encoded frame, top-k results). */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
                coarse: Seq[(Int, Array[Double])], m: Int, k: Int,
                queries: Seq[(Long, Array[Double])], topK: Int, nprobe: Int,
                seed: DataFrame => Seq[(Int, Array[Double])])
      : (Seq[Seq[(Int, Array[Double])]], DataFrame, DataFrame) = {
    require(coarse.map(_._1).sorted == (0 until coarse.size),
      "ivfpq: coarse cell ids must be dense 0-based")
    val centArr = array(coarse.sortBy(_._1).map { case (_, v) =>
      array(v.map(lit): _*) }: _*)
    val assigned = KMeans.assign(df, idCol, vecCol, coarse)
      .withColumn("__res", zip_with(col(vecCol),
        element_at(centArr, col("cluster") + 1), (a, b) => a - b))
    val resFrame = assigned.select(col(idCol), col("__res").as(vecCol))
    val (books, _) = productQuantize(resFrame, idCol, vecCol, m, k,
      iters = 1, seed)
    // same dense-0-based contract adcTopK enforces: the positional
    // element_at(tab, code+1) lookups below silently misalign if the
    // residual-book seed yields non-contiguous centroid ids
    books.zipWithIndex.foreach { case (b, j) =>
      require(b.map(_._1).sorted == (0 until b.size),
        s"ivfpq: residual codebook $j ids must be dense 0-based, " +
          s"got ${b.map(_._1).sorted}")
    }
    val d = coarse.head._2.length / m
    // encode residuals against the trained books in one projection,
    // keeping the cell id alongside the codes
    val encoded = books.zipWithIndex.foldLeft(
      assigned.select(col(idCol), col("cluster"), col("__res"))) {
      case (acc, (cents, j)) =>
        val sv = slice(col("__res"), lit(j * d + 1), lit(d))
        val best = array_min(KMeans.scoredL2(sv,
          graft.functions.dotProduct(sv, sv), cents))
        acc.withColumn(s"code_$j", best.getField("cid"))
    }
    val probes: Seq[Column] = queries.flatMap { case (qid, qv) =>
      val cells = coarse.sortBy(_._1).map { case (cid, c) =>
        val d2 = qv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        (math.round(d2 * 1e6), cid, c)
      }.sortBy(t => (t._1, t._2)).take(nprobe)
      cells.map { case (_, cid, cvec) =>
        val qr = qv.zip(cvec).map { case (a, b) => a - b }
        val tabs = (0 until m).map { j =>
          val qs = qr.slice(j * d, (j + 1) * d)
          val qq = qs.map(x => x * x).sum
          books(j).sortBy(_._1).map { case (_, c) =>
            val qc = qs.zip(c).map { case (a, b) => a * b }.sum
            qq - 2 * qc + c.map(x => x * x).sum
          }.toArray
        }
        struct(lit(qid).as("qid") +: lit(cid).as("cell") +:
          tabs.zipWithIndex.map { case (tab, j) =>
            array(tab.map(lit): _*).as(s"tab_$j") }: _*)
      }
    }
    val q = explode(array(probes: _*)).as("__q")
    val adc = (0 until m).map(j =>
      element_at(col(s"__q.tab_$j"), col(s"code_$j") + 1)).reduce(_ + _)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__q.qid"))
      .orderBy(round(col("adc") * 1e6).cast("long").asc, col(idCol).asc)
    val results = encoded
      .select(col(idCol) +: col("cluster") +:
        (0 until m).map(j => col(s"code_$j")) :+ q: _*)
      .filter(col("cluster") === col("__q.cell"))
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("__q.qid").as("query_id"), col(idCol), col("rank"),
        (round(col("adc") * 1e4) / 1e4).as("adc"))
    (books, encoded.drop("__res"), results)
  }

  /** Subspace width — probed once at plan-build time. Fails LOUDLY on an
    * empty frame (a bare head() would throw NoSuchElementException) and on
    * ragged vector lengths (slice() would otherwise silently truncate and
    * encode garbage). The ragged check is one size-only aggregate — column-
    * pruned, and marginal next to the m KMeans training passes that
    * follow. */
  private def subDim(df: DataFrame, vecCol: String, m: Int): Int = {
    val probe = df.agg(
      min(org.apache.spark.sql.functions.size(col(vecCol))).as("mn"),
      max(org.apache.spark.sql.functions.size(col(vecCol))).as("mx")).head()
    require(!probe.isNullAt(0), "pq: empty input frame — nothing to quantize")
    val (mn, mx) = (probe.getInt(0), probe.getInt(1))
    require(mn == mx,
      s"pq: ragged vector lengths ($mn..$mx) — slice() would silently " +
        "truncate; fix the embedding column first")
    require(mx % m == 0, s"pq: dim $mx not divisible by m=$m")
    mx / m
  }
}
