package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` payloads + typed metadata, with decode / feature
  * extraction running batched per partition.
  *
  * The decode itself is a clearly-marked STUB (no image/audio codecs in
  * this environment — it derives deterministic pseudo-features from the
  * bytes), but everything Spark-side is real and is what matters at
  * 100 TB: the schema contract, the per-partition batch loop (the same
  * shape a vectorized/Arrow decode UDF would use), and the rule that
  * payload bytes are never shuffled — features are extracted before any
  * groupBy/join touches the rows, so shuffles move ~100-byte feature
  * rows instead of megabyte blobs.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      declared_bytes: Long)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      luma: Double, // STUB: first payload byte (a real decoder: mean luminance)
      checksum: Long, // STUB: sum of bytes (a real decoder: content digest)
      embedding: Array[Float]) // STUB: byte-histogram sketch, unit length

  /** Wrap a text table into the media shape (payload = UTF-8 bytes) —
    * the driver testdata has no binary column, so `documents` stands in
    * for a blob store; kind cycles deterministically.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").cast("binary").as("payload"),
      col("n_chars").cast("long").as("declared_bytes"))

  /** STUB decode of one payload. Replace the body with a real codec
    * call (JPEG decode, PCM resample, frame grab) — the signature and
    * batch loop stay the same.
    */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    var sum = 0L
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      hist(b % 16) += 1f
      i += 1
    }
    var nrm = 0.0
    hist.foreach(h => nrm += h.toDouble * h)
    val n = math.sqrt(nrm)
    val emb = if (n == 0) hist else hist.map(h => (h / n).toFloat)
    MediaFeatures(
      row.media_id, row.kind, bytes.length.toLong,
      if (bytes.isEmpty) 0.0 else (bytes(0) & 0xff).toDouble,
      sum, emb)
  }

  /** Batched per-partition feature extraction: the iterator is consumed
    * in fixed-size batches (the shape a JNI/Arrow decoder wants), one
    * output row per media item. This is the only operator that touches
    * payload bytes; everything downstream is small feature rows.
    */
  def extractFeatures(
      media: DataFrame, batchSize: Int = 64)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would submit `batch` to the codec as one unit
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** Frame-sampling plan for video metadata: every `stride`-th frame
    * index up to nFrames — pure metadata math, no payload access.
    */
  def sampleFrameIndexes(nFrames: Int, stride: Int): Seq[Int] =
    0 until nFrames by stride

  /** Frame sampling as a column-only operator: one output row per
    * sampled frame of each video payload, carrying the frame's byte
    * window [off, off+frame_bytes) and a first-byte probe proving the
    * slice touched real payload bytes. The frame count comes from
    * metadata (a real pipeline reads it from the container header; here
    * it is derived deterministically from media_id) and the byte
    * geometry is integer-only, so the whole plan is scan-speed Column
    * math — sequence + explode + substring — with NO payload shuffle:
    * the blob is consumed map-side and only ~32-byte frame-window rows
    * reach the exchange. At 100 TB this is the fan-out step that hands
    * per-frame byte ranges to a batched decoder (decode itself stays
    * stubbed: no codecs in this environment).
    */
  def sampleFrames(media: DataFrame, stride: Int = 7): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("n_frames", (col("media_id") % 8 + 2) * 5)
      .withColumn("frame_bytes",
        expr("greatest(length(payload) div n_frames, 1L)"))
      .select(col("media_id"), col("payload"), col("n_frames"),
        col("frame_bytes"),
        explode(sequence(lit(0L), col("n_frames").cast("long") - 1,
          lit(stride.toLong))).as("frame_idx"))
      .select(col("media_id"), col("n_frames"), col("frame_idx"),
        (col("frame_idx") * col("frame_bytes")).as("off_bytes"),
        expr("""cast(length(substring(payload,
          cast(frame_idx * frame_bytes + 1 as int),
          cast(frame_bytes as int))) as bigint)""").as("n_bytes_frame"),
        // true unsigned BYTE value (hex → int), not ascii(cast(binary
        // as string)): the cast decodes UTF-8, so any byte ≥ 0x80 in a
        // real media payload would collapse to U+FFFD (65533); NULL for
        // a frame window past the payload's end
        expr("""case when length(substring(payload,
            cast(frame_idx * frame_bytes + 1 as int), 1)) = 1
          then cast(conv(hex(substring(payload,
            cast(frame_idx * frame_bytes + 1 as int), 1)), 16, 10) as bigint)
          end""").as("first_byte"))

  case class SizedMediaRow(
      media_id: Long, kind: String, payload: Array[Byte], w: Long, h: Long)

  case class ResizedMedia(
      media_id: Long, kind: String, out_w: Long, out_h: Long,
      n_bytes_out: Long, payload_out: Array[Byte])

  /** Aspect-preserving fit-within-`maxDim` resize: the target geometry
    * is INTEGER-ONLY metadata math (`w·maxDim div max(w,h)`), evaluated
    * as column expressions so the planning side runs at scan speed and
    * mirrors bit-exactly in SQL; the pixel work is the per-partition
    * batched stub (here: a proportional byte slice standing in for a
    * real scaler — same signature, same batch shape). Payload bytes
    * are sliced before anything shuffles, so downstream stages move
    * thumbnails, not originals — at 100 TB the resize is the payload
    * COMPACTION step and must come before the first exchange.
    */
  def resizeToFit(
      media: DataFrame, // (media_id, kind, payload, w, h)
      maxDim: Int, batchSize: Int = 64)(
      implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[SizedMediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real scaler would process `batch` as one codec call
        batch.iterator.map { r =>
          val longest = math.max(r.w, r.h)
          val (ow, oh) =
            if (longest <= maxDim) (r.w, r.h)
            else (r.w * maxDim / longest, r.h * maxDim / longest)
          val nOut =
            if (r.w * r.h == 0) 0L
            else r.payload.length.toLong * (ow * oh) / (r.w * r.h)
          ResizedMedia(r.media_id, r.kind, ow, oh, nOut,
            r.payload.take(nOut.toInt))
        }
      }
    }
  }
}
