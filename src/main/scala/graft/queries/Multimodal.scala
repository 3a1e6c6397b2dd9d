package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Opaque media payload: binary column + typed metadata. */
case class MediaRow(doc_id: Long, media: Array[Byte], fmt: String)

/** Output of the (stubbed) decode/feature-extract stage. */
case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
                         fake_width: Long, fake_height: Long)

/** One sampled frame of an opaque media payload. */
case class FrameSample(doc_id: Long, frame_idx: Long, byte_off: Long,
                       frame_bytes: Long, frame_checksum: Long)

/** A fixed-size thumbnail produced by the (stubbed) resize stage. */
case class ResizedThumb(doc_id: Long, out_w: Long, out_h: Long,
                        pix_checksum: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition in batches.
  * The decode step is a clearly-marked DETERMINISTIC STUB (no image/audio
  * libs in this container); the Spark-side plumbing — schema, typed Dataset,
  * partition-local batching (the shape a vectorized/native decoder needs),
  * and downstream columnar handoff — is real and oracle-checked. */
object Multimodal extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_features" -> ((s, dir) => {
      import s.implicits._
      val media = Tables(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "utf-8").as("media"),
          lit("fake/raw").as("fmt"))
        .as[MediaRow]
      media.mapPartitions { it =>
        // batch shape mirrors a vectorized decoder: fixed-size record groups,
        // decoded together, features emitted per record
        it.grouped(64).flatMap { batch =>
          batch.iterator.map { r =>
            // STUB decode: a real deployment calls the native decoder here
            // (libjpeg/ffmpeg et al.); this fake is deterministic over bytes.
            val bytes = r.media
            var sum = 0L
            var i = 0
            while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
            MediaFeatures(r.doc_id, bytes.length.toLong, sum % 9973,
              bytes.length % 64 + 1, sum % 64 + 1)
          }
        }
      }.toDF()
    }),

    // FRAME SAMPLING: video-as-binary → every k-th fixed-size frame, with
    // typed per-frame metadata (offset, length, checksum). The frame DECODE
    // is the same deterministic stub as m01 (no media libs in container);
    // what is real and oracle-checked is the sampling plumbing a 100 TB
    // video pipeline needs — frame addressing arithmetic, per-partition
    // batching, one output row per sampled frame, no driver involvement.
    // Frame size 64 B, stride 2 (sample frames 0, 2, 4, ...).
    "m02_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val frameLen = 64
      val stride = 2
      val media = Tables(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "utf-8").as("media"),
          lit("fake/raw").as("fmt"))
        .as[MediaRow]
      media.mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val bytes = r.media
            val nFrames = bytes.length / frameLen // full frames only
            (0 until nFrames by stride).iterator.map { f =>
              val off = f * frameLen
              // STUB decode: a real deployment hands bytes[off, off+len)
              // to the codec; the checksum stands in for decoded content
              var sum = 0L
              var i = off
              while (i < off + frameLen) { sum += (bytes(i) & 0xff); i += 1 }
              FrameSample(r.doc_id, f.toLong, off.toLong,
                frameLen.toLong, sum % 9973)
            }
          }
        }
      }.toDF()
    }),

    // RESIZE: fake-decoded W×H byte grid → 8×8 nearest-neighbor thumbnail.
    // The pixel-read is the stub (bytes stand in for decoded pixels); the
    // real, oracle-checked part is the resize INDEX arithmetic (the
    // addressing a vectorized resizer needs: out(i,j) ← in(i·H/8, j·W/8),
    // integer division) and the batched per-partition execution. Media with
    // fewer than 8 grid rows are skipped — the short-payload guard a real
    // pipeline needs too.
    "m03_resize" -> ((s, dir) => {
      import s.implicits._
      val w = 32
      val (outW, outH) = (8, 8)
      val media = Tables(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "utf-8").as("media"),
          lit("fake/raw").as("fmt"))
        .as[MediaRow]
      media.mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val bytes = r.media
            val h = bytes.length / w // full grid rows only
            if (h < outH) Iterator.empty
            else {
              var sum = 0L
              var k = 0
              while (k < outW * outH) {
                val yi = (k / outW) * h / outH
                val xj = (k % outW) * w / outW
                sum += (bytes(yi * w + xj) & 0xff)
                k += 1
              }
              Iterator.single(ResizedThumb(r.doc_id, outW.toLong, outH.toLong,
                sum % 9973))
            }
          }
        }
      }.toDF()
    })
  )

  override def oracle: Map[String, String] = Map(
    // byte offsets == character offsets here because the corpus is ASCII
    // (the m01 oracle's ascii-sum identity already relies on this).
    // The frame-index enumeration is DERIVED per document (scalar range
    // over octet_length, unnested) — a regeneration with longer docs just
    // yields more frames instead of silently truncating or crashing.
    "m02_frame_sample" ->
      """SELECT doc_id, f AS frame_idx, f * 64 AS byte_off,
           CAST(64 AS BIGINT) AS frame_bytes,
           CAST(list_sum(list_transform(range(64),
             i -> ascii(substr(text, CAST(f * 64 + i + 1 AS INT), 1)))) % 9973
             AS BIGINT) AS frame_checksum
         FROM (SELECT doc_id, text,
                 UNNEST(range(0, octet_length(encode(text)) // 64, 2)) AS f
               FROM documents)""",
    "m03_resize" ->
      """SELECT doc_id, CAST(8 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
           CAST(list_sum(list_transform(range(64),
             k -> ascii(substr(text,
               CAST(((k // 8) * (octet_length(encode(text)) // 32) // 8) * 32
                    + (k % 8) * 4 + 1 AS INT), 1)))) % 9973 AS BIGINT)
             AS pix_checksum
         FROM documents WHERE octet_length(encode(text)) // 32 >= 8""",
    "m01_media_features" -> {
      val asciiSum =
        "list_sum(list_transform(range(length(text)), i -> ascii(substr(text, i+1, 1))))"
      s"""SELECT doc_id,
            CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
            CAST($asciiSum % 9973 AS BIGINT) AS checksum,
            CAST(octet_length(encode(text)) % 64 + 1 AS BIGINT) AS fake_width,
            CAST($asciiSum % 64 + 1 AS BIGINT) AS fake_height
          FROM documents"""
    }
  )
}
