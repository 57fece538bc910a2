package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side plumbing (schema, partitioning, batch iteration,
  * output shape) is real and tested; the actual media decode is STUBBED
  * with a deterministic fake (this container ships no image/audio
  * libraries — the stub is clearly marked and isolated behind
  * [[decodeStub]] so a real codec drops in per-partition without
  * touching the dataflow).
  */
object Multimodal {

  /** Typed media row: payload + metadata travel together; payload stays
    * opaque binary until a decode stage runs. */
  final case class MediaRow(
      media_id: Long, kind: String, width: Int, height: Int,
      payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      byte_mean: Double, byte_entropy_q: Long, thumb: Array[Byte])

  /** Payload byte formula: `a = ((i+1)·40503 + (j+1)·65429) mod 65521`,
    * `byte(i,j) = ((a² + 7a + j) mod 65521) mod 256` — a quadratic
    * residue scramble over the (media_id, byte index) grid. Pure 64-bit
    * integer arithmetic with every intermediate < 2^33, so ANY engine
    * reproduces it exactly (the q26 DuckDB oracle recomputes the grid
    * relationally — the binary fixture needs no blob round-trip). */
  def mediaByte(i: Long, j: Long): Int = {
    val a = ((i + 1) * 40503L + (j + 1) * 65429L) % 65521L
    (((a * a + 7L * a + j) % 65521L) % 256L).toInt
  }

  /** Deterministic synthetic media table: dimensions and payload bytes
    * from [[mediaByte]]-style integer formulas — stands in for real
    * image/audio blobs while staying reproducible in both engines. */
  def synthesize(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { i =>
      val kinds = Vector("image", "audio", "video")
      val w = (8 + ((i + 1) * 48271L % 65521L) % 24L).toInt
      val h = (8 + ((i + 1) * 16807L % 65521L) % 24L).toInt
      val payload =
        Array.tabulate(w * h)(j => mediaByte(i, j.toLong).toByte)
      MediaRow(i, kinds((i % 3).toInt), w, h, payload)
    }
  }

  /** ==== STUB ==== the real decoder (JPEG/PNG/opus/...) goes here.
    * The fake is deterministic: "decode" = the raw payload bytes;
    * "thumbnail" = every k-th byte (the frame-sample pattern). A real
    * implementation replaces ONLY this function. */
  def decodeStub(payload: Array[Byte], targetLen: Int): Array[Byte] = {
    if (payload.isEmpty) return Array.emptyByteArray
    val step = math.max(1, payload.length / targetLen)
    payload.indices.by(step).take(targetLen)
      .map(payload(_)).toArray
  }

  /** Feature extraction over the media table: per-partition batch loop
    * (the shape a vectorized/Pandas-UDF decode takes on a real
    * cluster), emitting per-blob stats + a fixed-size thumbnail. */
  def extractFeatures(media: Dataset[MediaRow], thumbLen: Int = 16)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val bytes = m.payload
        // quantized byte "entropy": count of distinct byte values —
        // a deterministic stand-in for a real histogram entropy
        val distinctBytes = bytes.map(_ & 0xff).toSet.size.toLong
        MediaFeatures(m.media_id, m.kind, bytes.length,
          byteMean(bytes), distinctBytes,
          decodeStub(bytes, thumbLen))
      }
    }
  }

  /** Exact-integer sum then one double division, rounded 4dp HALF_UP —
    * bit-identical to DuckDB `round(CAST(sum AS DOUBLE)/count, 4)`. */
  def byteMean(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 0.0
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    java.math.BigDecimal.valueOf(s.toDouble / bytes.length)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Batched twin of [[extractFeatures]] with the `mapInPandas` batch
    * shape: the decode kernel receives a COLUMNAR BATCH (parallel
    * arrays of ids/kinds/payloads, like Arrow record batches /
    * pandas frames), not single rows — the signature a vectorized
    * decoder (GPU codec, JNI batch call) needs. Output re-flattens to
    * rows; batch boundaries must not affect results
    * (MultimodalSpec asserts equality across batch sizes). */
  def extractFeaturesBatched(media: Dataset[MediaRow],
      batchSize: Int = 256, thumbLen: Int = 16)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        // columnarize: the "record batch" handed to the kernel
        val ids = rows.iterator.map(_.media_id).toArray
        val kinds = rows.iterator.map(_.kind).toArray
        val payloads = rows.iterator.map(_.payload).toArray
        decodeBatchStub(ids, kinds, payloads, thumbLen)
      }
    }
  }

  /** ==== STUB (batch form) ==== a real vectorized decoder processes
    * the whole payload batch in one call; the fake applies the
    * per-row stub so batched == row-wise by construction. */
  def decodeBatchStub(ids: Array[Long], kinds: Array[String],
      payloads: Array[Array[Byte]], thumbLen: Int)
      : Iterator[MediaFeatures] =
    ids.indices.iterator.map { i =>
      val bytes = payloads(i)
      MediaFeatures(ids(i), kinds(i), bytes.length,
        byteMean(bytes),
        bytes.map(_ & 0xff).toSet.size.toLong,
        decodeStub(bytes, thumbLen))
    }

  /** Metadata/agg view (pure relational over the binary column):
    * per-kind blob count, total bytes, mean payload size. */
  def stats(media: DataFrame): DataFrame =
    media.groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        round(avg(length(col("payload"))), 4).as("mean_bytes"))
      .orderBy("kind")
}
