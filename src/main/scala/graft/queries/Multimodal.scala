package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Multimodal column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (md5-derived fake features); the
  * Spark-side plumbing — binary columns, typed metadata, feature schema,
  * partition-parallel evaluation — is real and is what these queries
  * exercise. On a real cluster the stub becomes a codec call in a
  * mapInPandas/mapPartitions stage over the same schema; nothing around
  * it changes.
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

  def defs: Map[String, QueryDef] = Map(

    // Fixed-size byte-range chunking of the binary payload — the
    // sharding step before a codec/embedding stage (LLM pipelines feed
    // media in bounded segments). Pure list algebra (sequence +
    // substring over BINARY inside one transform) then a generate:
    // map-only until the final presentation sort, so a 100 TB corpus
    // chunks at scan speed. Chunk identity is (media_id, chunk_idx) +
    // an md5 prefix — the idempotency key a resumable pipeline needs.
    "q_multimodal_chunks" -> QueryDef(
      (s, d) => media(s, d)
        .select(col("media_id"),
          posexplode(expr("transform(sequence(0, " +
            "cast(ceil(octet_length(payload) / 64.0) AS int) - 1), " +
            "i -> substring(payload, i * 64 + 1, 64))"))
            .as(Seq("pos", "chunk")))
        .select(col("media_id"),
          col("pos").cast("long").as("chunk_idx"),
          octet_length(col("chunk")).as("chunk_bytes"),
          substring(md5(col("chunk")), 1, 8).as("checksum"))
        .orderBy("media_id", "chunk_idx"),
      Some("""WITH idx AS (
             |  SELECT doc_id AS media_id, text,
             |    unnest(range(0, cast(ceil(strlen(text) / 64.0) AS int))) AS i
             |  FROM documents)
             |SELECT media_id, i AS chunk_idx,
             |  cast(strlen(substr(text, cast(i * 64 + 1 AS int), 64)) AS int)
             |    AS chunk_bytes,
             |  substr(md5(substr(text, cast(i * 64 + 1 AS int), 64)), 1, 8)
             |    AS checksum
             |FROM idx ORDER BY media_id, chunk_idx""".stripMargin)),

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

    // Decode + feature-extract over the binary payload, emitting a
    // fixed-dimension feature vector as scalar columns f0..f3. The feature
    // math is the STUB — md5-derived deterministic bytes→floats standing in
    // for e.g. a JPEG decode + CNN embed (the container has no codecs). The
    // stub is pure column algebra (md5 → four 32-bit hex slices → unit
    // doubles), so the whole stage stays inside whole-stage codegen AND is
    // DuckDB-oracle-checkable; a real codec would swap in as a
    // mapInPandas/mapPartitions stage over the same (media_id, payload)
    // schema with this exact output shape.
    "q_multimodal_features" -> QueryDef(
      (s, d) => {
        def f(i: Int) =
          (expr(s"cast(conv(substring(md5(payload), ${1 + 8 * i}, 8), 16, 10) AS double)")
            / lit(4294967296.0)).as(s"f$i")
        media(s, d)
          .select(col("media_id"), octet_length(col("payload")).as("n_bytes"),
            f(0), f(1), f(2), f(3))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
             |  cast(octet_length(encode(text)) AS int) AS n_bytes,
             |  ('0x' || substring(md5(text), 1, 8))::bigint / 4294967296.0 AS f0,
             |  ('0x' || substring(md5(text), 9, 8))::bigint / 4294967296.0 AS f1,
             |  ('0x' || substring(md5(text), 17, 8))::bigint / 4294967296.0 AS f2,
             |  ('0x' || substring(md5(text), 25, 8))::bigint / 4294967296.0 AS f3
             |FROM documents ORDER BY media_id""".stripMargin)),

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
