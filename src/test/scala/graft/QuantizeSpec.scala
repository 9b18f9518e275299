package graft

import org.apache.spark.sql.functions._
import graft.ml.Quantize

/** int8 embedding quantization (beyond-reference training-data op). */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("codes clamp to [-127,127], zero vectors quantize to zero codes") {
    val df = Seq(
      (1L, Seq(1.0, -2.0, 0.5)),
      (2L, Seq(0.0, 0.0, 0.0)), // zero vector: null scale, all-zero codes
      (3L, Seq(-127.5, 127.5, 63.0))
    ).toDF("id", "e")
    val q = Quantize.withInt8(df, "e").orderBy("id").collect()
    assert(q(0).getSeq[Byte](3) == Seq[Byte](64, -127, 32)) // scale 2/127
    assert(q(1).isNullAt(2) && q(1).getSeq[Byte](3) == Seq[Byte](0, 0, 0))
    assert(q(2).getSeq[Byte](3).forall(c => c >= -127 && c <= 127))
  }

  test("int8 cosine is scale-invariant and tracks exact cosine") {
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0, 4.0)),
      (2L, Seq(1000.0, 2000.0, 3000.0, 4000.0)), // same direction, 1000×
      (3L, Seq(-4.0, 3.0, -2.0, 1.0))
    ).toDF("id", "e")
    val q = Quantize.withInt8(df, "e")
    val ref = q.filter(col("id") === 1).select(col("q8").as("qr"), col("e").as("er"))
    val out = q.crossJoin(broadcast(ref))
      .select(col("id"),
        Quantize.int8Cosine(col("q8"), col("qr")).as("cq"),
        graft.functions.cosineSimilarity(col("e"), col("er")).as("ce"))
      .orderBy("id").collect()
    assert(math.abs(out(0).getDouble(1) - 1.0) < 1e-9) // self
    assert(math.abs(out(1).getDouble(1) - 1.0) < 1e-9) // scale cancels
    out.foreach(r => assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 0.03))
  }
}
