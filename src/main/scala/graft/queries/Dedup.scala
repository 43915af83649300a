package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Document deduplication — the beyond-reference surface a training-data
  * pipeline needs (builder prompt): exact, n-gram Jaccard, MinHash+LSH and
  * SimHash near-dup detection over the `documents` fixture table.
  *
  * Every hash is md5-based so the DuckDB oracle can reproduce results
  * bit-for-bit (Spark's murmur/xxhash64 have no DuckDB counterpart).
  *
  * Scale design (100 TB): nothing here ever materializes the O(n²) pair
  * space. Candidates come from inverted-index joins (shared shingle, shared
  * MinHash band, shared SimHash band) with a frequency cap on the join key
  * so no single key explodes a partition — the standard skew guard for
  * web-scale dedup. All joins are shuffle-hash-joins on short string keys.
  */
object Dedup {

  /** Distinct char-8-gram shingles per document. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), explode(expr("sequence(1, length(text)-7)")).as("i"), col("text"))
      .select(col("doc_id"), expr("substring(text, i, 8)").as("sh"))
      .distinct()

  /** Shingles that appear in at most `cap` documents — the inverted-index
    * entries worth joining on. Frequent shingles generate quadratic pair
    * blowup and carry no near-dup signal (boilerplate).
    */
  private def rareShingles(sh: DataFrame, cap: Int): DataFrame = {
    val freq = sh.groupBy("sh").agg(count(lit(1)).as("df")).filter(col("df") <= cap)
    sh.join(freq.select("sh"), Seq("sh"))
  }

  def defs: Map[String, QueryDef] = Map(

    // Exact dedup: hash-groupBy on content digest. One shuffle on md5(text);
    // at 100 TB this is a plain aggregate, no pair expansion at all.
    "q_dedup_exact" -> QueryDef(
      (s, d) => t(s, d, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("h"),
      Some("""SELECT md5(text) AS h, min(doc_id) AS keep_id, cast(count(*) AS bigint) AS n_copies
             |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin)),

    // N-gram Jaccard near-dup: inverted-index candidates (rare shingles,
    // df<=50), then exact Jaccard |A∩B| / (|A|+|B|-|A∩B|) on candidates only.
    "q_dedup_ngram" -> QueryDef(
      (s, d) => {
        val sh = shingles(s, d).cache()
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        val rare = rareShingles(sh, 50)
        val cand = rare.as("a").join(rare.as("b"), Seq("sh"))
          .filter(col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .distinct()
        val inter = cand
          .join(sh.as("s1"), col("a_id") === col("s1.doc_id"))
          .join(sh.as("s2"), col("b_id") === col("s2.doc_id") && col("s1.sh") === col("s2.sh"))
          .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
        inter
          .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("sza")), Seq("a_id"))
          .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("szb")), Seq("b_id"))
          .withColumn("jaccard", round(col("inter") / (col("sza") + col("szb") - col("inter")), 4))
          .filter(col("jaccard") >= 0.8)
          .select("a_id", "b_id", "jaccard")
          .orderBy("a_id", "b_id")
      },
      Some("""WITH sh AS (
             |  SELECT DISTINCT doc_id, substring(text, i, 8) AS sh
             |  FROM (SELECT doc_id, text, unnest(range(1, length(text)-6)) AS i FROM documents)
             |), sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
             |rare AS (SELECT * FROM sh WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 50)),
             |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
             |         FROM rare a JOIN rare b USING (sh) WHERE a.doc_id < b.doc_id),
             |inter AS (SELECT s1.doc_id AS a_id, s2.doc_id AS b_id, count(*) AS inter
             |          FROM cand c JOIN sh s1 ON s1.doc_id = c.a_id
             |                      JOIN sh s2 ON s2.doc_id = c.b_id AND s2.sh = s1.sh
             |          GROUP BY 1, 2)
             |SELECT a_id, b_id, round(inter*1.0/(sa.sz + sb.sz - inter), 4) AS jaccard
             |FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
             |WHERE round(inter*1.0/(sa.sz + sb.sz - inter), 4) >= 0.8
             |ORDER BY a_id, b_id""".stripMargin)),

    // MinHash + LSH: 16 md5-based min-hashes per doc, banded 4×4; candidate
    // pairs = docs sharing a band key. The signature step is one aggregate
    // over (doc, seed); the band join touches only 4 short keys per doc —
    // this is the shape that survives 100 TB (no all-pairs work).
    "q_dedup_minhash" -> QueryDef(
      (s, d) => {
        val sh = shingles(s, d)
        val sigs = sh
          .select(col("doc_id"), col("sh"), explode(expr("sequence(0, 15)")).as("seed"))
          .groupBy("doc_id", "seed")
          .agg(min(md5(concat(col("seed").cast("string"), lit(":"), col("sh")))).as("minh"))
        val bands = sigs
          .withColumn("band", expr("cast(floor(seed / 4.0) AS int)"))
          .groupBy("doc_id", "band")
          .agg(md5(concat_ws("", array_sort(
            collect_list(concat(lpad(col("seed").cast("string"), 2, "0"), col("minh")))))).as("bkey"))
        bands.as("a").join(bands.as("b"), Seq("band", "bkey"))
          .filter(col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .distinct()
          .orderBy("a_id", "b_id")
      },
      Some("""WITH sh AS (
             |  SELECT DISTINCT doc_id, substring(text, i, 8) AS sh
             |  FROM (SELECT doc_id, text, unnest(range(1, length(text)-6)) AS i FROM documents)
             |), sigs AS (
             |  SELECT doc_id, seed, min(md5(cast(seed AS varchar) || ':' || sh)) AS minh
             |  FROM sh, (SELECT unnest(range(0, 16)) AS seed)
             |  GROUP BY doc_id, seed
             |), bands AS (
             |  SELECT doc_id, cast(floor(seed / 4.0) AS int) AS band,
             |    md5(string_agg(lpad(cast(seed AS varchar), 2, '0') || minh, '' ORDER BY seed)) AS bkey
             |  FROM sigs GROUP BY doc_id, cast(floor(seed / 4.0) AS int)
             |)
             |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
             |FROM bands a JOIN bands b USING (band, bkey)
             |WHERE a.doc_id < b.doc_id
             |ORDER BY a_id, b_id""".stripMargin)),

    // SimHash: 16-bit signature from word hashes (md5 → first 15 hex chars →
    // 60-bit int, low 16 bits used). Near-dups = pairs sharing a 4-bit band
    // whose full signatures are within Hamming distance 3.
    "q_dedup_simhash" -> QueryDef(
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .distinct()
          .withColumn("h", expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) AS bigint)"))
        val bitSums = toks
          .select(col("doc_id"), col("h"), explode(expr("sequence(0, 15)")).as("j"))
          .withColumn("contrib", expr("CASE WHEN (shiftright(h, j) & 1) = 1 THEN 1 ELSE -1 END"))
          .groupBy("doc_id", "j")
          .agg(sum("contrib").as("s"))
        val sims = bitSums
          .withColumn("bit", expr("CASE WHEN s > 0 THEN cast(1 AS bigint) ELSE cast(0 AS bigint) END"))
          .groupBy("doc_id")
          .agg(sum(expr("shiftleft(bit, j)")).as("simhash"))
        val bands = sims.select(col("doc_id"), col("simhash"),
          explode(expr("sequence(0, 3)")).as("b"))
          .withColumn("key", expr("shiftright(simhash, 4 * b) & 15"))
        bands.as("a").join(bands.as("b2"), Seq("b", "key"))
          .filter(col("a.doc_id") < col("b2.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b2.doc_id").as("b_id"),
            expr("bit_count(a.simhash ^ b2.simhash)").as("hamming"))
          .distinct()
          .filter(col("hamming") <= 3)
          .orderBy("a_id", "b_id")
      },
      Some("""WITH toks AS (
             |  SELECT DISTINCT doc_id, tok FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
             |), th AS (
             |  SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::bigint AS h FROM toks
             |), bitsums AS (
             |  SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
             |  FROM th, (SELECT unnest(range(0, 16)) AS j) GROUP BY doc_id, j
             |), sims AS (
             |  SELECT doc_id, cast(sum(CASE WHEN s > 0 THEN 1::bigint ELSE 0::bigint END << j) AS bigint) AS simhash
             |  FROM bitsums GROUP BY doc_id
             |), bands AS (
             |  SELECT doc_id, simhash, b, (simhash >> (4 * b)) & 15 AS key
             |  FROM sims, (SELECT unnest(range(0, 4)) AS b)
             |)
             |SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id,
             |  cast(bit_count(xor(a.simhash, b2.simhash)) AS int) AS hamming
             |FROM bands a JOIN bands b2 USING (b, key)
             |WHERE a.doc_id < b2.doc_id AND bit_count(xor(a.simhash, b2.simhash)) <= 3
             |ORDER BY a_id, b_id""".stripMargin))
  )
}
