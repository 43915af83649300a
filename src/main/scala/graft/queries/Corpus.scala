package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables.t

/** Corpus-level pipeline operators: embedding centroids (the reduce step of
  * IVF/k-means-style indexing), corpus n-gram statistics, and deterministic
  * per-group sampling (hash-ordered, so any engine reproduces the same
  * sample — the batch analogue of the reference's reservoir samples,
  * SURVEY.md §4.3).
  */
object Corpus {

  def defs: Map[String, QueryDef] = QueryDef.gate(

    // Per-label centroids as (label, dim, value): posexplode + one partial
    // aggregate. This is the scalable layout for vector aggregation — at
    // 100 TB the shuffle carries (label × 64) partial sums, not vectors.
    "q_embed_centroids" -> QueryDef(
      (s, d) => t(s, d, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("label"), posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        .withColumn("i", col("pos") + 1)
        .groupBy("label", "i")
        .agg(round(avg("x"), 6).as("c"), count(lit(1)).as("n"))
        .orderBy("label", "i"),
      Some("""SELECT label, i, round(avg(embedding[i]), 6) AS c, cast(count(*) AS bigint) AS n
             |FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
             |GROUP BY label, i ORDER BY label, i""".stripMargin)),

    // Corpus bigram frequencies, top 20 — the classic n-gram stats job.
    "q_text_bigrams" -> QueryDef(
      (s, d) => {
        val toks = t(s, d, "documents")
          .repartition(s.sparkContext.defaultParallelism)
          .select(split(col("text"), " ").as("t"))
        toks
          .select(explode(expr("sequence(1, size(t) - 1)")).as("i"), col("t"))
          .select(concat(expr("element_at(t, i)"), lit(" "), expr("element_at(t, i + 1)")).as("bigram"))
          .groupBy("bigram")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(20)
      },
      Some("""WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
             |bg AS (SELECT t[i] || ' ' || t[i+1] AS bigram
             |       FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks))
             |SELECT bigram, cast(count(*) AS bigint) AS n FROM bg
             |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin)),

    // Deterministic per-group sampling: md5-ordered row_number per source.
    // Reproducible across engines and runs (no RNG), spreads via the
    // group-partitioned window — the training-data "take k docs per
    // source" primitive.
    "q_sample_per_group" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        t(s, d, "documents")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("source", "doc_id", "rk")
          .orderBy("source", "rk")
      },
      Some("""SELECT source, doc_id, rk FROM (
             |  SELECT source, doc_id,
             |    row_number() OVER (PARTITION BY source ORDER BY md5(cast(doc_id AS varchar)), doc_id) AS rk
             |  FROM documents) x
             |WHERE rk <= 3 ORDER BY source, rk""".stripMargin)),

    // Deterministic train/val/test split: per-split doc counts + char
    // mass. The gate compares the aggregate image; training jobs filter
    // on the split column directly.
    "q_corpus_split" -> QueryDef(
      (s, d) => hashSplit(t(s, d, "documents"), "doc_id")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .orderBy("split"),
      Some("""SELECT split, cast(count(*) AS bigint) AS n_docs,
             |  cast(sum(n_chars) AS bigint) AS total_chars
             |FROM (SELECT CASE WHEN md5(cast(doc_id AS varchar)) < 'd' THEN 'train'
             |             WHEN md5(cast(doc_id AS varchar)) < 'f' THEN 'val'
             |             ELSE 'test' END AS split, n_chars FROM documents) s
             |GROUP BY split ORDER BY split""".stripMargin)),

    // Sequence packing (concat-and-chunk): every document's span in the
    // packed token stream of its language shard.
    "q_pack_sequences" -> QueryDef(
      (s, d) => packSequences(t(s, d, "documents"), 256, "lang")
        .select("doc_id", "lang", "tok_len", "cum_before", "chunk_start", "chunk_end")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, tok_len, cum_before,
             |  cast(floor(cum_before / 256.0) AS bigint) AS chunk_start,
             |  cast(floor((cum_before + tok_len - 1) / 256.0) AS bigint) AS chunk_end
             |FROM (
             |  SELECT doc_id, lang, cast(len(string_split(text, ' ')) AS int) AS tok_len,
             |    cast(coalesce(sum(len(string_split(text, ' '))) OVER (
             |      PARTITION BY lang ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint) AS cum_before
             |  FROM documents) x ORDER BY doc_id""".stripMargin)),

    // The packed-bin manifest a shard writer consumes: per (shard, bin)
    // document count, token fill, and residual slack against the
    // window. One aggregate over the packing layout; bins whose single
    // document overflows the window report negative slack (kept visible
    // — that's the writer's truncate-or-reject signal).
    "q_pack_manifest" -> QueryDef(
      (s, d) => packGreedy(t(s, d, "documents"), 256, "lang")
        .groupBy(col("shard").as("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum("tok_len").as("fill"),
          (lit(256) - sum("tok_len")).as("slack"))
        .orderBy("lang", "bin"),
      Some("""WITH RECURSIVE base AS (
             |  SELECT lang, doc_id, cast(len(string_split(text, ' ')) AS int) AS tok_len,
             |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
             |  FROM documents),
             |pack AS (
             |  SELECT lang, doc_id, tok_len, rn,
             |    cast(0 AS bigint) AS bin, cast(tok_len AS bigint) AS fill
             |  FROM base WHERE rn = 1
             |  UNION ALL
             |  SELECT b.lang, b.doc_id, b.tok_len, b.rn,
             |    CASE WHEN p.fill + b.tok_len <= 256 THEN p.bin ELSE p.bin + 1 END,
             |    CASE WHEN p.fill + b.tok_len <= 256 THEN p.fill + b.tok_len
             |         ELSE cast(b.tok_len AS bigint) END
             |  FROM pack p JOIN base b ON b.lang = p.lang AND b.rn = p.rn + 1)
             |SELECT lang, bin, cast(count(*) AS bigint) AS n_docs,
             |  cast(sum(tok_len) AS bigint) AS fill,
             |  cast(256 - sum(tok_len) AS bigint) AS slack
             |FROM pack GROUP BY lang, bin ORDER BY lang, bin""".stripMargin)),

    // Greedy no-split packing: per-shard sequential bin fill, streamed
    // as a per-partition fold. The oracle replays the identical fold as
    // a per-shard recursive CTE.
    "q_pack_greedy" -> QueryDef(
      (s, d) => packGreedy(t(s, d, "documents"), 256, "lang")
        .withColumnRenamed("shard", "lang")
        .orderBy("doc_id"),
      Some("""WITH RECURSIVE base AS (
             |  SELECT lang, doc_id, cast(len(string_split(text, ' ')) AS int) AS tok_len,
             |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
             |  FROM documents),
             |pack AS (
             |  SELECT lang, doc_id, tok_len, rn,
             |    cast(0 AS bigint) AS bin, cast(tok_len AS bigint) AS fill
             |  FROM base WHERE rn = 1
             |  UNION ALL
             |  SELECT b.lang, b.doc_id, b.tok_len, b.rn,
             |    CASE WHEN p.fill + b.tok_len <= 256 THEN p.bin ELSE p.bin + 1 END,
             |    CASE WHEN p.fill + b.tok_len <= 256 THEN p.fill + b.tok_len
             |         ELSE cast(b.tok_len AS bigint) END
             |  FROM pack p JOIN base b ON b.lang = p.lang AND b.rn = p.rn + 1)
             |SELECT doc_id, lang, tok_len, bin FROM pack ORDER BY doc_id""".stripMargin)),

    // Deterministic source-weighted mixing: compose an epoch as
    // {en: 50%, de: 100%, es: 25%, fr/zh: 10%} — md5-threshold keeps,
    // rerun-stable and per-source independent. Map-only at any scale.
    "q_corpus_mix" -> QueryDef(
      (s, d) => weightedSample(t(s, d, "documents"),
          Map("en" -> 0.5, "de" -> 1.0, "es" -> 0.25,
            "fr" -> 0.1, "zh" -> 0.1),
          "lang", "doc_id")
        .select("doc_id", "lang").orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE CASE lang
             |  WHEN 'en' THEN substr(md5(cast(doc_id AS varchar)), 1, 8) < '80000000'
             |  WHEN 'de' THEN true
             |  WHEN 'es' THEN substr(md5(cast(doc_id AS varchar)), 1, 8) < '40000000'
             |  WHEN 'fr' THEN substr(md5(cast(doc_id AS varchar)), 1, 8) < '19999999'
             |  WHEN 'zh' THEN substr(md5(cast(doc_id AS varchar)), 1, 8) < '19999999'
             |  ELSE false END
             |ORDER BY doc_id""".stripMargin)),

    // Best-fit-decreasing packing: the bounded-waste layout (≤ 11/9·OPT
    // + 1 bins). The oracle replays the identical decreasing-order
    // best-fit fold list-functionally in a recursive CTE — the same
    // lowest-id tie rule via list_position's first match.
    "q_pack_bfd" -> QueryDef(
      (s, d) => packBestFit(t(s, d, "documents"), 256, "lang")
        .withColumnRenamed("shard", "lang")
        .orderBy("doc_id"),
      Some("""WITH RECURSIVE base AS (
             |  SELECT lang, doc_id, cast(len(string_split(text, ' ')) AS int) AS tok_len,
             |    row_number() OVER (PARTITION BY lang ORDER BY len(string_split(text, ' ')) DESC, doc_id) AS rn
             |  FROM documents),
             |pack AS (
             |  SELECT lang, doc_id, tok_len, rn, cast(1 AS bigint) AS bin,
             |    [cast(tok_len AS bigint)] AS fills
             |  FROM base WHERE rn = 1
             |  UNION ALL
             |  SELECT b.lang, b.doc_id, b.tok_len, b.rn,
             |    CASE WHEN list_aggregate(list_filter(p.fills, f -> f + b.tok_len <= 256), 'max') IS NULL
             |         THEN len(p.fills) + 1
             |         ELSE cast(list_position(p.fills, list_aggregate(list_filter(p.fills, f -> f + b.tok_len <= 256), 'max')) AS bigint) END AS bin,
             |    CASE WHEN list_aggregate(list_filter(p.fills, f -> f + b.tok_len <= 256), 'max') IS NULL
             |         THEN list_append(p.fills, cast(b.tok_len AS bigint))
             |         ELSE list_concat(list_concat(
             |                p.fills[1:list_position(p.fills, list_aggregate(list_filter(p.fills, f -> f + b.tok_len <= 256), 'max')) - 1],
             |                [list_aggregate(list_filter(p.fills, f -> f + b.tok_len <= 256), 'max') + b.tok_len]),
             |                p.fills[list_position(p.fills, list_aggregate(list_filter(p.fills, f -> f + b.tok_len <= 256), 'max')) + 1:len(p.fills)]) END
             |  FROM pack p JOIN base b ON b.lang = p.lang AND b.rn = p.rn + 1)
             |SELECT doc_id, lang, tok_len, bin FROM pack ORDER BY doc_id""".stripMargin))
  )

  /** Best-fit-decreasing packing: per shard, documents are taken in
    * DECREASING token order (doc_id tiebreak) and each goes to the open
    * bin with the most fill that still fits — ties pick the LOWEST bin
    * id; no fit opens a new bin. Classic BFD waste is ≤ 11/9·OPT + 1
    * bins vs the greedy fold's unbounded adversarial waste, at the cost
    * of per-shard state = one long per OPEN BIN (the greedy fold's two
    * longs). Shards bound that state: a shard holds shard-tokens/window
    * bins, so production shards (bounded hash buckets) keep it small;
    * the fold still STREAMS — rows map one-in-one-out, nothing
    * collects. Determinism is the explicit tie rule, which the DuckDB
    * oracle replays list-functionally in a recursive CTE (list_position
    * finds the FIRST best fill = the same lowest-id rule).
    */
  def packBestFit(docs: DataFrame, window: Int, shardCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val prepared = docs
      .withColumn("tok_len", size(split(col("text"), " ")))
      .select(col(shardCol).cast("string").as("shard"),
        col("doc_id").cast("long"), col("tok_len").cast("int"))
      .as[(String, Long, Int)]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("tok_len").desc, col("doc_id"))
    prepared.mapPartitions { it =>
      var shard: String = null
      var fills: scala.collection.mutable.ArrayBuffer[Long] = null
      it.map { case (s, id, len) =>
        if (s != shard) {
          shard = s
          fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        }
        var best = -1
        var bestFill = -1L
        var i = 0
        while (i < fills.length) {
          val f = fills(i)
          if (f + len <= window && f > bestFill) { bestFill = f; best = i }
          i += 1
        }
        val bin =
          if (best >= 0) { fills(best) += len; best + 1 }
          else { fills += len.toLong; fills.length }
        (id, s, len, bin.toLong)
      }
    }.toDF("doc_id", "shard", "tok_len", "bin")
  }

  /** Deterministic source-weighted subsampling — the data-MIXING
    * primitive (compose a training epoch as {en: 50%, de: 100%, …}).
    * Keep a document iff the first 8 hex chars of md5(id) fall below
    * the source's threshold (rate × 16^8 as zero-padded hex, compared
    * lexicographically — uniform in hex space, identical in any
    * engine). Content-free and rerun-stable like [[hashSplit]]:
    * changing one source's rate never reshuffles another source's kept
    * set, and raising a rate strictly GROWS the kept set (threshold
    * monotonicity) — the property that makes mixture ablations
    * comparable. A narrow map: no shuffle, no state, linear at 100 TB.
    */
  def weightedSample(docs: DataFrame, rates: Map[String, Double],
      srcCol: String, idCol: String): DataFrame = {
    def thr(r: Double): String =
      f"${(math.min(math.max(r, 0.0), 1.0) * 4294967296.0).toLong.min(0xffffffffL)}%08x"
    val h = substring(md5(col(idCol).cast("string")), 1, 8)
    val keep = rates.foldLeft(when(lit(false), lit(true))) {
      case (acc, (s, r)) =>
        if (r >= 1.0) acc.when(col(srcCol) === s, lit(true))
        else acc.when(col(srcCol) === s, h < lit(thr(r)))
    }.otherwise(lit(false))
    docs.filter(keep)
  }

  /** Deterministic train/val/test split on a stable content-free key:
    * md5(id) is uniform in hex space, so lexicographic thresholds give
    * fixed fractions (first char 0–c → 13/16 ≈ 81% train, d–e → 2/16 ≈
    * 12.5% val, f → 1/16 ≈ 6.25% test). Any engine — and any future run
    * over a grown corpus — assigns the same document to the same split,
    * which is what keeps eval sets stable across pipeline reruns. A
    * narrow map: no shuffle, no state, scales linearly at 100 TB.
    */
  def hashSplit(docs: DataFrame, idCol: String): DataFrame =
    docs
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("split",
        when(col("__h") < "d", "train")
          .when(col("__h") < "f", "val")
          .otherwise("test"))
      .drop("__h")

  /** Greedy no-split sequence packing: documents fill a `window`-token
    * context in doc_id order within a shard; a document that would
    * overflow the current context starts the next one (an over-long
    * document gets a context alone). This is the fold every packing
    * pipeline runs before writing training shards; it is inherently
    * sequential PER SHARD (each bin depends on every predecessor), so
    * the scale shape is: repartition by shard (each shard lands whole
    * in one partition), sort within partitions, and STREAM the fold
    * with mapPartitions — state is two longs per in-flight shard, rows
    * never collect. Shards (language here, bounded hash buckets in
    * production) cap the sequential chain; across shards everything
    * is parallel. The DuckDB oracle re-derives the same fold as a
    * per-shard recursive CTE — two independent formulations that must
    * agree row-for-row.
    */
  def packGreedy(docs: DataFrame, window: Int, shardCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val prepared = docs
      .withColumn("tok_len", size(split(col("text"), " ")))
      .select(col(shardCol).cast("string").as("shard"),
        col("doc_id").cast("long"), col("tok_len").cast("int"))
      .as[(String, Long, Int)]
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
    prepared.mapPartitions { it =>
      var shard: String = null
      var fill = 0L
      var bin = 0L
      it.map { case (s, id, len) =>
        if (s != shard) { shard = s; bin = 0L; fill = len.toLong }
        else if (fill + len <= window) fill += len
        else { bin += 1L; fill = len.toLong }
        (id, s, len, bin)
      }
    }.toDF("doc_id", "shard", "tok_len", "bin")
  }

  /** Sequence packing, concat-and-chunk style: documents concatenate in
    * doc_id order within a shard and the token stream chunks into fixed
    * `window`-token contexts; each document reports the chunk span it
    * lands in (chunk_start..chunk_end). One running-sum window per shard
    * — state is a single long per partition, and shards (language here;
    * a hash bucket in production) bound the window's sort so no global
    * order is ever materialized. The greedy no-split variant (a document
    * never crosses a chunk) is this plus a per-chunk re-bucket of the
    * few boundary documents; the span layout computed here is the input
    * either way.
    */
  def packSequences(docs: DataFrame, window: Int, shardCol: String): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("tok_len", size(split(col("text"), " ")))
      .withColumn("cum_before", coalesce(sum("tok_len").over(w), lit(0L)))
      .withColumn("chunk_start", floor(col("cum_before") / window.toDouble))
      .withColumn("chunk_end",
        floor((col("cum_before") + col("tok_len") - 1) / window.toDouble))
  }
}
