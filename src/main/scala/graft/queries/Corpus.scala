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

  def defs: Map[String, QueryDef] = Map(

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
             |WHERE rk <= 3 ORDER BY source, rk""".stripMargin))
  )
}
