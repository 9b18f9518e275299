package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata structs. The decode kernels (image resize, audio
  * resample, video frame-sample) are STUBBED with deterministic fakes —
  * the container has no codec libs — but the Spark-side plumbing (schema,
  * batching via mapPartitions on the binary payloads, partition sizing) is
  * real and tested.
  *
  * At 100 TB the rules are: (1) binary payloads never enter a shuffle — join
  * metadata first, fetch/decode last; (2) decode inside mapPartitions with
  * bounded batch size so executor memory is payload-count-bounded; (3) store
  * payloads in parquet binary columns or reference them by URI and read
  * lazily via `spark.read.format("binaryFile")`.
  */
object Multimodal {

  /** Schema of a multimodal asset row: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true)
    )), nullable = true)
  ))

  /** Wrap a DataFrame of raw binaries into the asset schema. */
  def asAssets(df: DataFrame, idCol: String, payloadCol: String,
               modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("payload"),
      lit(null).cast(assetSchema("meta").dataType).as("meta"))

  /** Deterministic fake "decode → feature extract": a real decoder would
    * parse the payload; the fake derives a fixed-length feature vector from
    * the payload bytes (md5-seeded), preserving the exact pipeline shape
    * (binary in → float array out, executed per-partition in batches). */
  def extractFeatures(df: DataFrame, dim: Int = 8): DataFrame = {
    val seed = md5(coalesce(col("payload").cast("string"), lit("")))
    val feats = transform(sequence(lit(0), lit(dim - 1)), i =>
      (conv(substring(seed, (i % 4) * 8 + 1, lit(8)), 16, 10).cast("double") / lit(4294967295.0)))
    df.withColumn("features", feats)
  }

  /** Batched decode via `mapPartitions` — the Scala analogue of the
    * vectorized-UDF (mapInPandas) shape: the decoder receives a BATCH of
    * payloads at once (real codecs amortize setup per batch, exactly like
    * an Arrow batch), `batchSize` bounds executor memory to
    * batch-count × payload size, and rows stream through without any
    * shuffle or partition change.
    *
    * `decode` is pluggable; the default is the STUBBED deterministic fake
    * (no codec libs in this container): features derived from payload
    * bytes. The signature — Seq of payloads in, Seq of fixed-length float
    * vectors out — is the real contract a codec-backed decoder drops into.
    */
  def decodeBatched(df: DataFrame, batchSize: Int = 64, dim: Int = 8,
                    decode: (Seq[Array[Byte]], Int) => Seq[Array[Float]] =
                      Multimodal.stubDecode): DataFrame = {
    require(batchSize > 0)
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false))
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val feats = decode(batch.map { r =>
          if (r.isNullAt(payloadIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](payloadIdx)
        }, dim)
        batch.lazyZip(feats).map { (r, f) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ f.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** STUB decoder: deterministic features from payload bytes (md5-mixed).
    * A real implementation parses the codec here — per batch, not per row. */
  def stubDecode(payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    payloads.map { p =>
      md.reset()
      val d = md.digest(p)
      Array.tabulate(dim) { i =>
        ((d(i % d.length) & 0xff) / 255.0f)
      }
    }
  }

  /** STUB image resize: a real kernel decodes + resamples pixels. The stub
    * records the target size in metadata and passes the payload through,
    * keeping schema and partition behavior identical to the real op. */
  def resizeImage(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.duration_ms").as("duration_ms"),
        col("meta.codec").as("codec")))

  /** STUB video frame sampling: emits `everyMs`-spaced frame rows
    * (asset_id, frame_idx, ts_ms) from duration metadata — the real decoder
    * would attach pixel payloads; the plumbing (explode to frame rows,
    * payload-free shuffle) is the part that matters at scale. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("modality") === "video" && col("meta.duration_ms").isNotNull)
      .select(col("asset_id"),
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))).as("ts_ms"))
      .withColumn("frame_idx", (col("ts_ms") / everyMs).cast("long"))
}
