package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media as opaque `binary` columns plus typed metadata.
  *
  * Two execution styles, both real and tested:
  *  - pure-column ops ([[binaryMeta]], [[frameSlices]]) — codegen'd
  *    binary functions, fused into the scan;
  *  - batched per-partition decode ([[decodeFramesStub]],
  *    [[resampleStub]]) — `mapPartitions` over the typed Dataset, the
  *    Scala analog of PySpark's `mapInPandas`: one iterator per
  *    partition, schema declared by the case class Encoder, no
  *    per-row JVM↔UDF boundary.
  *
  * DECODING IS STUBBED: this container ships no image/audio codecs, so
  * the codec call is replaced by a deterministic fake (clearly marked
  * below). The pipeline plumbing — schema, partitioning, batch shape,
  * byte-level access — is real; swapping in javacv/ffmpeg is a 1-line
  * change at the marked site.
  */
object Multimodal {

  /** Cheap metadata over a binary column: byte length and a hex
    * preview of the leading bytes (magic-number sniffing shape).
    */
  def binaryMeta(df: DataFrame, idCol: String, binCol: String,
                 headBytes: Int = 8): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(binCol)).as("n_bytes"),
      hex(expr(s"substring($binCol, 1, $headBytes)")).as("head_hex"))

  /** Fixed-size frame slicing of a binary payload (video-frame /
    * audio-window sampling shape) as pure column expressions:
    * (id, frame_idx, frame_bytes).
    */
  def frameSlices(df: DataFrame, idCol: String, binCol: String,
                  frameSize: Int): DataFrame =
    // empty-payload guard: without it `sequence(0, -1)` defaults to
    // step -1 and yields [0, -1] — two bogus frames instead of none
    df.select(col(idCol),
        posexplode(expr(
          s"if(octet_length($binCol) > 0, " +
          s"transform(sequence(0, cast(ceil(octet_length($binCol) / ${frameSize}.0) as int) - 1), " +
          s"i -> substring($binCol, i * $frameSize + 1, $frameSize)), " +
          s"array())")))
      .toDF(idCol, "frame_idx", "frame_bytes")

  /** Typed decoded-frame record. `meanByte` is computed from the real
    * bytes; `width`/`height` come from the stubbed codec.
    */
  final case class FrameMeta(id: Long, frameIdx: Int, nBytes: Int,
                             width: Int, height: Int, meanByte: Double)

  /** Batched "decode": split each payload into frames and emit typed
    * per-frame metadata. Runs as one `mapPartitions` pass — the
    * mapInPandas-shaped seam where a real codec would stream batches.
    */
  def decodeFramesStub(df: DataFrame, idCol: String, binCol: String,
                       frameSize: Int)
                      (implicit spark: SparkSession): Dataset[FrameMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          bytes.grouped(frameSize).zipWithIndex.map { case (chunk, i) =>
            val byteSum = chunk.map(b => (b & 0xFF).toLong).sum
            // --- STUB CODEC ---------------------------------------
            // Real impl: ImageIO/ffmpeg decode of `chunk` → dims.
            // Deterministic fake keyed on content (the unsigned byte
            // sum) so tests — and the SQL oracle — can pin it:
            val width = (16 + byteSum % 1904).toInt
            val height = (16 + (byteSum / 1904) % 1064).toInt
            // ------------------------------------------------------
            val mean =
              if (chunk.isEmpty) 0.0 else byteSum.toDouble / chunk.length
            FrameMeta(id, i, chunk.length, width, height, mean)
          }
        }
      }
  }

  /** Batched "resample": keep every `factor`-th byte of each payload
    * (the resize/downsample seam, same mapPartitions shape).
    */
  def resampleStub(df: DataFrame, idCol: String, binCol: String,
                   factor: Int)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB: real impl = proper resampling filter over decoded
          // samples; fake = stride subsampling of the raw bytes.
          (id, bytes.zipWithIndex.collect { case (b, i) if i % factor == 0 => b })
        }
      }
      .toDF(idCol, "resampled")
  }
}
