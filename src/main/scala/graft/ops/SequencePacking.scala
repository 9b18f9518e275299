package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-length training-sequence packing: map the concatenated stream of
  * per-row token counts (taken in `ord` order) onto sequences of exactly
  * `seqLen` tokens, emitting the span map an LLM trainer consumes — one
  * row per (input row, covered sequence): `seq_id`, the input columns,
  * `doc_off` (start offset within the row), `n_slice` (tokens this row
  * contributes to this sequence). Rows crossing a sequence boundary emit
  * one span per covered sequence.
  *
  * Machinery: the range-partitioned prefix sum ([[Distributed]], no
  * single-task window) plus a per-row explode bounded by
  * ceil(tokens/seqLen)+1 rows — fan-out proportional to output size, no
  * collect. Sequence ids stay in integral arithmetic, exact past double's
  * 2^53 mantissa at corpus scale.
  */
object SequencePacking {

  def spans(df: DataFrame, tokens: Column, ord: Seq[Column],
            seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val summed = Distributed.withPrefixSum(
      df.withColumn("__n", tokens.cast("long")), col("__n"), ord, "__run")
    val st = col("__run") - col("__n")
    summed.filter(col("__n") > 0)
      .withColumn("seq_id", explode(sequence(
        expr(s"(__run - __n) div $seqLen"), expr(s"(__run - 1) div $seqLen"))))
      .withColumn("doc_off", greatest(col("seq_id") * seqLen, st) - st)
      .withColumn("n_slice",
        least((col("seq_id") + 1) * seqLen, col("__run"))
          - greatest(col("seq_id") * seqLen, st))
      .drop("__n", "__run")
  }
}
