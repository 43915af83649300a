package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.t

/** Multimodal column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (md5-derived fake features); the
  * Spark-side plumbing — binary columns, schema, partition-parallel
  * mapPartitions decode, batch shape — is real and is what these queries
  * exercise. On a real cluster the stub body is replaced by the codec
  * call; nothing around it changes.
  */
object Multimodal {

  /** documents.text re-encoded as a binary payload column — stands in for
    * image/audio bytes so the pipeline has a real `binary` column to move.
    */
  private def media(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("source").as("origin"),
        col("n_chars").cast("long").as("orig_bytes")).as("meta"))

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("feature", ArrayType(DoubleType))))

  def defs: Map[String, QueryDef] = Map(

    // Metadata path: pure column algebra over the binary payload — size,
    // checksum, metadata projection. Fully oracle-checkable.
    "q_multimodal_meta" -> QueryDef(
      (s, d) => media(s, d)
        .select(
          col("media_id"),
          octet_length(col("payload")).as("n_bytes"),
          substring(md5(col("payload")), 1, 16).as("checksum"),
          col("meta.mime").as("mime"),
          col("meta.origin").as("origin"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
             |  cast(octet_length(encode(text)) AS int) AS n_bytes,
             |  substring(md5(text), 1, 16) AS checksum,
             |  'text/plain' AS mime, source AS origin
             |FROM documents ORDER BY media_id""".stripMargin)),

    // Decode + feature-extract: partition-parallel mapPartitions over the
    // binary column, emitting fixed-dimension feature vectors. The feature
    // math below is the STUB — deterministic bytes→floats so results are
    // reproducible — standing in for e.g. a JPEG decode + CNN embed.
    // No oracle (not SQL-expressible); driver records a rows-only check.
    "q_multimodal_features" -> QueryDef(
      (s, d) => {
        val m = media(s, d).select("media_id", "payload")
        val out = m.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            // --- STUB DECODE: replace with real codec on a real cluster ---
            val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
            val feature = digest.grouped(4).take(4)
              .map(g => g.foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL)).toDouble / (1L << 32))
              .toArray
            // --------------------------------------------------------------
            Row(id, bytes.length, feature)
          }
        }(org.apache.spark.sql.Encoders.row(featSchema))
        out.orderBy("media_id")
      },
      None),

    // Frame sampling: a video payload stands in as N logical frames; keep
    // every k-th frame per media item. Pure column algebra (sequence +
    // explode + filter) — the shape of a frame-sampling stage at scale.
    "q_multimodal_frames" -> QueryDef(
      (s, d) => media(s, d)
        .withColumn("n_frames", (octet_length(col("payload")) / 16).cast("int"))
        .select(col("media_id"), col("n_frames"),
          explode(expr("sequence(0, n_frames - 1)")).as("frame_idx"))
        .filter(col("frame_idx") % 5 === 0)
        .select(col("media_id"), col("n_frames"), col("frame_idx"))
        .orderBy("media_id", "frame_idx"),
      Some("""SELECT doc_id AS media_id,
             |  cast(octet_length(encode(text)) // 16 AS int) AS n_frames,
             |  cast(f AS int) AS frame_idx
             |FROM (SELECT doc_id, text, unnest(range(0, octet_length(encode(text)) // 16)) AS f
             |      FROM documents)
             |WHERE f % 5 = 0
             |ORDER BY media_id, frame_idx""".stripMargin))
  )
}
