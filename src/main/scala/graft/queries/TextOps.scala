package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables.t

/** Text analysis for training-data pipelines: token statistics, quality
  * scoring, BPE-ish token counting, language-ID heuristics and document
  * fingerprinting — all pure `org.apache.spark.sql.functions` column
  * algebra (codegen'd, no UDFs), so the whole stage stays inside
  * WholeStageCodegen and scales as a single narrow map over the corpus:
  * zero shuffles except the final presentation ORDER BY.
  */
object TextOps {

  private val stopEn = Seq("the", "and", "of", "to", "a", "in", "is")
  private val stopDe = Seq("der", "die", "und", "das", "ist", "ein")
  private val stopFr = Seq("le", "la", "et", "les", "des", "un")
  private val stopEs = Seq("el", "los", "y", "de", "que", "una")

  private def inList(xs: Seq[String]): String = xs.map(x => s"'$x'").mkString(", ")

  /** size(filter(tokens, t -> t IN (...))) as a SQL expression string —
    * identical text works in Spark SQL and DuckDB modulo function names.
    */
  private def stopCount(xs: Seq[String]): Column =
    expr(s"size(filter(split(text, ' '), x -> x IN (${inList(xs)})))")

  private def stopCountSql(xs: Seq[String]): String =
    s"cast(len(list_filter(string_split(text, ' '), x -> x IN (${inList(xs)}))) AS int)"

  def defs: Map[String, QueryDef] = QueryDef.gate(

    // RAG-style sliding-window chunking: fixed W-token windows with
    // stride S (overlap W−S) per document — the standard retrieval/
    // context-packing prep. Pure list algebra (split once, slice per
    // window) + one generator: map-only, zero shuffles, so at 100 TB it
    // scales as a narrow pass regardless of document count; chunk ids
    // are (doc_id, chunk_idx) — deterministic and idempotent.
    "q_chunk_overlap" -> QueryDef(
      (s, d) => {
        val W = 32; val S = 24
        t(s, d, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .withColumn("nchunks", greatest(lit(1),
            ceil((size(col("toks")) - W) / lit(S.toDouble)).cast("int") + 1))
          .select(col("doc_id"), posexplode(
            transform(sequence(lit(0), col("nchunks") - 1),
              i => array_join(slice(col("toks"), i * S + 1, lit(W)), " "))))
          .withColumnRenamed("pos", "chunk_idx")
          .withColumnRenamed("col", "chunk")
          .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
            col("chunk"),
            size(split(col("chunk"), " ")).as("n_tokens"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks
             |  FROM documents WHERE doc_id < 200),
             |n AS (
             |  SELECT doc_id, toks,
             |    greatest(1, CAST(ceil((len(toks) - 32) / 24.0) AS INT) + 1) AS nc
             |  FROM t),
             |g AS (
             |  SELECT doc_id, toks, CAST(unnest(range(nc)) AS INT) AS chunk_idx
             |  FROM n),
             |c AS (
             |  SELECT doc_id, chunk_idx,
             |    array_to_string(toks[(chunk_idx*24+1):(chunk_idx*24+32)], ' ') AS chunk
             |  FROM g)
             |SELECT doc_id, chunk_idx, chunk,
             |  CAST(len(string_split(chunk, ' ')) AS INT) AS n_tokens
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // TF-IDF: tf per (doc, term) and df per term are each ONE hash
    // aggregate (the tf frame, already distinct on (doc, term), feeds
    // df); the corpus size joins as a broadcast 1-row frame; scoring is
    // a shuffle join on the term. Top-3 terms per document via a
    // row_number window that plans as WindowGroupLimit. At 100 TB: two
    // aggregate shuffles + one join shuffle on the term — no step holds
    // a vocabulary or corpus in one place.
    "q_text_tfidf" -> QueryDef(
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val tf = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
        val n = t(s, d, "documents").agg(count(lit(1)).as("n"))
        val scored = tf.join(dfreq, "w").crossJoin(broadcast(n))
          .withColumn("score", col("tf") * log(col("n") / col("df")))
        val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("w"))
        scored.filter(col("doc_id") < 200)
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("w").as("term"),
            round(col("score"), 5).as("score"))
          .orderBy("doc_id", "rk")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
             |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w),
             |dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
             |n AS (SELECT count(*) AS n FROM documents)
             |SELECT doc_id, rk, term, score FROM (
             |  SELECT tf.doc_id, tf.w AS term,
             |    row_number() OVER (PARTITION BY tf.doc_id
             |      ORDER BY tf.tf * ln(n.n / dfq.df) DESC, tf.w) AS rk,
             |    round(tf.tf * ln(n.n / dfq.df), 5) AS score
             |  FROM tf JOIN dfq ON tf.w = dfq.w CROSS JOIN n
             |  WHERE tf.doc_id < 200) x
             |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // Per-document token statistics + quality flags.
    "q_text_stats" -> QueryDef(
      (s, d) => t(s, d, "documents")
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .withColumn("n_types", size(array_distinct(split(col("text"), " "))))
        .select(
          col("doc_id"), col("n_chars"), col("n_tokens"), col("n_types"),
          round(col("n_types") / col("n_tokens"), 4).as("ttr"),
          round(stopCount(stopEn) / col("n_tokens"), 4).as("stop_ratio"),
          when(col("n_chars") < 100, "short")
            .when(col("n_types") / col("n_tokens") < 0.25, "repetitive")
            .otherwise("ok").as("quality"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, n_chars,
              |  cast(len(string_split(text, ' ')) AS int) AS n_tokens,
              |  cast(len(list_distinct(string_split(text, ' '))) AS int) AS n_types,
              |  round(len(list_distinct(string_split(text, ' '))) * 1.0 / len(string_split(text, ' ')), 4) AS ttr,
              |  round(${stopCountSql(stopEn)} * 1.0 / len(string_split(text, ' ')), 4) AS stop_ratio,
              |  CASE WHEN n_chars < 100 THEN 'short'
              |       WHEN len(list_distinct(string_split(text, ' '))) * 1.0 / len(string_split(text, ' ')) < 0.25 THEN 'repetitive'
              |       ELSE 'ok' END AS quality
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Gopher/MassiveText REPETITION signals: top-word fraction (most
    // frequent token / total tokens) and duplicate-2-gram fraction —
    // the rules that catch boilerplate and template spam. Shapes: the
    // top-word stats are two hash aggregates keyed on doc_id (key-
    // bounded shuffles), the bigram stats are PURE list algebra (one
    // narrow map, zero shuffles) — at 100 TB the expensive half of the
    // signal costs nothing but the scan.
    "q_text_repetition" -> QueryDef(
      (s, d) => {
        val docs = t(s, d, "documents")
        val words = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("w"))
        val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        val top = tf.groupBy("doc_id").agg(max("c").as("top_cnt"),
          sum("c").as("n_words"))
        val bi = docs.select(col("doc_id"),
          expr("transform(sequence(1, size(split(text, ' ')) - 1), " +
            "i -> concat(element_at(split(text, ' '), i), ' ', " +
            "element_at(split(text, ' '), i + 1)))").as("bg"))
          .select(col("doc_id"), size(col("bg")).as("n_bi"),
            size(array_distinct(col("bg"))).as("nd_bi"))
        top.join(bi, "doc_id")
          .select(col("doc_id"),
            round(col("top_cnt") * 1.0 / col("n_words"), 4).as("top_word_frac"),
            round((col("n_bi") - col("nd_bi")) * 1.0 / col("n_bi"), 4)
              .as("dup_bigram_frac"),
            (col("top_cnt") * 1.0 / col("n_words") > 0.2 ||
              (col("n_bi") - col("nd_bi")) * 1.0 / col("n_bi") > 0.5)
              .as("flag_repetitive"))
          .orderBy("doc_id")
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, w, count(*) AS c
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |        FROM documents) tk
             |  GROUP BY doc_id, w),
             |top AS (SELECT doc_id, max(c) AS top_cnt,
             |          cast(sum(c) AS bigint) AS n_words FROM tf GROUP BY doc_id),
             |bi AS (SELECT doc_id, len(bg) AS n_bi,
             |         len(list_distinct(bg)) AS nd_bi
             |  FROM (SELECT doc_id,
             |    list_transform(range(1, len(string_split(text, ' '))),
             |      i -> string_split(text, ' ')[i] || ' ' ||
             |           string_split(text, ' ')[i + 1]) AS bg
             |    FROM documents) b0)
             |SELECT top.doc_id,
             |  round(top_cnt * 1.0 / n_words, 4) AS top_word_frac,
             |  round((n_bi - nd_bi) * 1.0 / n_bi, 4) AS dup_bigram_frac,
             |  (top_cnt * 1.0 / n_words > 0.2
             |    OR (n_bi - nd_bi) * 1.0 / n_bi > 0.5) AS flag_repetitive
             |FROM top JOIN bi ON top.doc_id = bi.doc_id
""".stripMargin)),

    // Gopher-style quality filter: length, chars-per-word and digit-ratio
    // rules composed into a keep flag + first-failing-rule reason. Narrow
    // row-local column algebra (one regexp + arithmetic per document) —
    // the 100 TB shape is a map-only scan that writes the kept partition.
    "q_text_quality" -> QueryDef(
      (s, d) => t(s, d, "documents")
        .withColumn("n_words", size(split(col("text"), " ")))
        .withColumn("cpw", round(col("n_chars") / col("n_words"), 4))
        .withColumn("digit_ratio", round(
          length(regexp_replace(col("text"), "[^0-9]", "")) / col("n_chars"), 4))
        .withColumn("keep",
          col("n_words") >= 20 && col("cpw").between(3, 12) && col("digit_ratio") < 0.1)
        .withColumn("reason",
          when(col("n_words") < 20, "too_short")
            .when(!col("cpw").between(3, 12), "word_shape")
            .when(col("digit_ratio") >= 0.1, "too_numeric")
            .otherwise("kept"))
        .select("doc_id", "n_words", "cpw", "digit_ratio", "keep", "reason")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, n_words, cpw, digit_ratio,
             |  (n_words >= 20 AND cpw BETWEEN 3 AND 12 AND digit_ratio < 0.1) AS keep,
             |  CASE WHEN n_words < 20 THEN 'too_short'
             |       WHEN cpw NOT BETWEEN 3 AND 12 THEN 'word_shape'
             |       WHEN digit_ratio >= 0.1 THEN 'too_numeric'
             |       ELSE 'kept' END AS reason
             |FROM (SELECT doc_id,
             |    cast(len(string_split(text, ' ')) AS int) AS n_words,
             |    round(n_chars * 1.0 / len(string_split(text, ' ')), 4) AS cpw,
             |    round(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / n_chars, 4) AS digit_ratio
             |  FROM documents) x ORDER BY doc_id""".stripMargin)),

    // BPE-ish tokenization via regex: words / numbers / single non-space
    // symbols. regexp_extract_all is codegen'd in Spark; same RE2-safe
    // pattern runs in DuckDB.
    "q_text_tokens_bpe" -> QueryDef(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)")).as("n_bpe_tokens"),
          size(split(col("text"), " ")).as("n_ws_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  cast(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS int) AS n_bpe_tokens,
             |  cast(len(string_split(text, ' ')) AS int) AS n_ws_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Language ID: stopword-hit heuristic with a deterministic tie-break
    // order (en > de > fr > es). The fixture text is synthetic, so this
    // checks the deterministic scoring machinery, not linguistic accuracy.
    "q_text_langid" -> QueryDef(
      (s, d) => t(s, d, "documents")
        .withColumn("s_en", stopCount(stopEn))
        .withColumn("s_de", stopCount(stopDe))
        .withColumn("s_fr", stopCount(stopFr))
        .withColumn("s_es", stopCount(stopEs))
        .withColumn("pred_lang",
          expr("""CASE WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
                       WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
                       WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END"""))
        .select("doc_id", "s_en", "s_de", "s_fr", "s_es", "pred_lang", "lang")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  ${stopCountSql(stopEn)} AS s_en, ${stopCountSql(stopDe)} AS s_de,
              |  ${stopCountSql(stopFr)} AS s_fr, ${stopCountSql(stopEs)} AS s_es,
              |  CASE WHEN ${stopCountSql(stopEn)} >= greatest(${stopCountSql(stopDe)}, ${stopCountSql(stopFr)}, ${stopCountSql(stopEs)}) THEN 'en'
              |       WHEN ${stopCountSql(stopDe)} >= greatest(${stopCountSql(stopFr)}, ${stopCountSql(stopEs)}) THEN 'de'
              |       WHEN ${stopCountSql(stopFr)} >= ${stopCountSql(stopEs)} THEN 'fr' ELSE 'es' END AS pred_lang,
              |  lang
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Winnowing fingerprint (the MOSS scheme): hash every char-8-gram at
    // its position, slide a 5-wide window over the hash sequence, keep
    // each window's minimum — the selected hash set is a positional
    // fingerprint robust to local edits. Computed ENTIRELY in-row
    // (round 3): the hash sequence, the per-window minima and the
    // distinct-set reduction are array `transform`s inside one projection,
    // so a document never explodes into per-position rows and the plan
    // carries no shuffle at all (the round-2 window form shuffled one row
    // per character position). The DuckDB oracle keeps the window form —
    // two independent formulations that must agree. The fingerprint
    // summary (size + checksum) is compared here; the raw selected-hash
    // sets are what a matcher would join on.
    "q_text_winnow" -> QueryDef(
      (s, d) => {
        graft.GraftExtensions.ensure(s)
        graft.Tables.t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          expr("transform(sequence(1, length(text)-7), " +
            "i -> graft_md5p60(substring(text, i, 8)))")
            .as("hs"))
        // slice() truncates at the array end, so tail windows narrow to
        // the remaining positions — same semantics as ROWS BETWEEN
        // CURRENT ROW AND 4 FOLLOWING
        .select(col("doc_id"),
          expr("array_distinct(transform(sequence(1, size(hs)), " +
            "i -> array_min(slice(hs, i, 5))))").as("sel"))
        .select(col("doc_id"),
          expr("cast(size(sel) AS bigint)").as("fp_size"),
          expr("cast(aggregate(sel, 0L, (acc, x) -> acc + x % 1000000007) AS bigint)")
            .as("fp_checksum"))
        .orderBy("doc_id")
      },
      Some("""WITH h AS (
             |  SELECT doc_id, i,
             |    ('0x' || substring(md5(substring(text, i, 8)), 1, 15))::bigint AS h
             |  FROM (SELECT doc_id, text, unnest(range(1, length(text)-6)) AS i FROM documents)
             |), sel AS (
             |  SELECT doc_id,
             |    min(h) OVER (PARTITION BY doc_id ORDER BY i
             |      ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS wmin
             |  FROM h
             |)
             |SELECT doc_id, cast(count(DISTINCT wmin) AS bigint) AS fp_size,
             |  cast(sum(DISTINCT wmin % 1000000007) AS bigint) AS fp_checksum
             |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Document fingerprint: md5 over whitespace-normalized lowercase text —
    // the canonical-form digest used as a cheap pre-dedup key.
    "q_text_fingerprint" -> QueryDef(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp"),
          substring(md5(col("source")), 1, 8).as("source_fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
             |  substring(md5(source), 1, 8) AS source_fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // PII redaction — the scrubbing stage of a training-data pipeline:
    // conservative regexes for emails, +CC-NNN-NNNN phone numbers and
    // IPv4 addresses, each replaced by a typed placeholder in one
    // chained regexp_replace pass plus per-kind match counts — all
    // codegen'd column algebra, ZERO shuffles (a narrow map over the
    // corpus at any scale). The fixture text is synthetic word soup, so
    // the query PLANTS deterministic PII per document first; the
    // planted→redacted round trip proves patterns and counts. Patterns
    // stay inside the RE2 ∩ java.util.regex common subset so Spark and
    // the DuckDB oracle agree byte-for-byte.
    "q_text_redact" -> QueryDef(
      (s, d) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phone = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
        val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
        val planted = t(s, d, "documents").filter(col("doc_id") < 300)
          .withColumn("pii_text", concat(col("text"),
            lit(" contact user"), col("doc_id"),
            lit("@ex"), pmod(col("doc_id"), lit(7)), lit(".org or +1-555-"),
            format_string("%04d", pmod(col("doc_id"), lit(10000))),
            lit(" ip 10.0."), pmod(col("doc_id"), lit(256)), lit(".25")))
        planted.select(col("doc_id"),
          size(regexp_extract_all(col("pii_text"), lit(email), lit(0))).as("n_email"),
          size(regexp_extract_all(col("pii_text"), lit(phone), lit(0))).as("n_phone"),
          size(regexp_extract_all(col("pii_text"), lit(ip), lit(0))).as("n_ip"),
          regexp_replace(regexp_replace(regexp_replace(col("pii_text"),
            email, "[EMAIL]"), phone, "[PHONE]"), ip, "[IP]").as("redacted"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id, concat(text, ' contact user', doc_id,
             |    '@ex', doc_id % 7, '.org or +1-555-', printf('%04d', doc_id % 10000),
             |    ' ip 10.0.', doc_id % 256, '.25') AS pii_text
             |  FROM documents WHERE doc_id < 300)
             |SELECT doc_id,
             |  cast(len(regexp_extract_all(pii_text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS int) AS n_email,
             |  cast(len(regexp_extract_all(pii_text,
             |    '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS int) AS n_phone,
             |  cast(len(regexp_extract_all(pii_text,
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS int) AS n_ip,
             |  regexp_replace(regexp_replace(regexp_replace(pii_text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             |    '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g') AS redacted
             |FROM p ORDER BY doc_id""".stripMargin))
  )
}
