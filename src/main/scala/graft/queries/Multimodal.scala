package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Opaque media payload: binary column + typed metadata. */
case class MediaRow(doc_id: Long, media: Array[Byte], fmt: String)

/** Output of the (stubbed) decode/feature-extract stage. */
case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
                         fake_width: Long, fake_height: Long)

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
    })
  )

  override def oracle: Map[String, String] = Map(
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
