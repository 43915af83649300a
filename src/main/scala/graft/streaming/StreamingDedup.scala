package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash near-duplicate detection — the streaming counterpart
  * of the batch q_dedup_minhash family (graft.queries.Dedup), for the
  * "filter near-dups out of an arriving document stream" pipeline shape.
  *
  * Key structural difference from batch: a streaming document arrives as
  * ONE row carrying its full text, so the 16-minhash signature is pure
  * per-row column algebra (`array_min` over `transform`) — computed
  * map-side with NO aggregation shuffle at all. (MinHash over a multiset
  * equals MinHash over the distinct set, so no dedup pass is needed
  * either.) The only shuffle is the band-key grouping that brokers
  * candidates, and its state is bounded by the watermark.
  *
  * Pipeline: signature (map) → 4 band rows per doc (md5 of the ordered
  * 4-minhash tuple, same banding as batch) → flatMapGroupsWithState keyed
  * by (band, bkey): each arriving doc is compared against the signatures
  * already seen in its bucket (fused 16-slot compare, ≥8/16 matches =
  * candidate near-dup, same threshold as batch); state evicts on event-time
  * timeout at the watermark. At scale, state per bucket is tiny (docs that
  * share an entire minhash band) and buckets partition across executors.
  */
object StreamingDedup {

  final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  final case class BandRow(band: Int, bkey: String, doc_id: Long,
      ts: java.sql.Timestamp, sig: Seq[Long])
  /** A candidate near-dup pair (a_id < b_id) with its signature agreement. */
  final case class CandPair(a_id: Long, b_id: Long, matches: Int)

  val NumHashes = 16
  val Bands = 4
  val MatchFloor = 8 // ≥8/16 matching minhashes ≈ Jaccard ≥ 0.5 estimate

  /** The 16 affine minhashes as one array column — same hash family as the
    * batch pipeline (h·(k+1) + k·1000003 mod 999999937 over 60-bit md5
    * shingle hashes), evaluated entirely within the row.
    */
  def signature: Column = {
    // graft_md5p60 = the md5/conv triple natively from the digest bytes
    // (bit-identical values; see graft.functions.Md5Prefix60). Callers
    // must have run GraftExtensions.ensure on the session (bandRows
    // does) before the column resolves.
    val shingles = "transform(sequence(1, length(text)-7), i -> " +
      "graft_md5p60(substring(text, i, 8)) % 999999937)"
    // ONE pass over the shingles: each shingle's md5 evaluates once
    // (the previous form spliced the whole shingle array into each of
    // the 16 array_min calls — 16× the md5 work; the round-13 sf0.1
    // bench measured it at 51 s). The fold carries 16 running minima,
    // updated per shingle with the same affine family — identical
    // values for any non-empty shingle set.
    expr(s"""aggregate($shingles,
      transform(sequence(0, ${NumHashes - 1}), k -> cast(999999937 AS bigint)),
      (acc, h) -> zip_with(acc, sequence(0, ${NumHashes - 1}),
        (m, k) -> least(m, (h * (k + 1) + k * 1000003) % 999999937)))""")
  }

  /** Explode a doc stream into its 4 (band, bkey) rows, signature attached. */
  def bandRows(docs: Dataset[Doc]): Dataset[BandRow] = {
    import docs.sparkSession.implicits._
    graft.GraftExtensions.ensure(docs.sparkSession)
    val bandExprs = (0 until Bands).map { b =>
      val tuple = (0 until NumHashes / Bands)
        .map(j => s"cast(sig[${b * (NumHashes / Bands) + j}] AS string)").mkString(", ")
      s"$b, md5(concat_ws(',', $tuple))"
    }.mkString(", ")
    docs.withColumn("sig", signature)
      .select(expr(s"stack($Bands, $bandExprs)").as(Seq("band", "bkey")),
        col("doc_id"), col("ts"), col("sig"))
      .as[BandRow]
  }

  /** Candidate near-dup pairs from a watermarked doc stream. Emits each
    * pair once per shared band (dedupe downstream if exact-once matters;
    * the batch verifier is the arbiter of true Jaccard anyway).
    */
  def detect(docs: Dataset[Doc], watermark: String = "10 minutes"): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    bandRows(docs)
      .withWatermark("ts", watermark)
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, String), rows: Iterator[BandRow],
            state: GroupState[List[(Long, Seq[Long])]]) =>
          if (state.hasTimedOut) {
            // bucket idle past the watermark: all members evicted
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Nil)
            val out = Seq.newBuilder[CandPair]
            // deterministic processing order within the micro-batch
            for (r <- rows.toSeq.sortBy(b => (toMicros(b.ts), b.doc_id))) {
              for ((otherId, otherSig) <- seen if otherId != r.doc_id) {
                val matches = (0 until NumHashes)
                  .count(i => otherSig(i) == r.sig(i))
                if (matches >= MatchFloor)
                  out += CandPair(math.min(otherId, r.doc_id),
                    math.max(otherId, r.doc_id), matches)
              }
              seen = (r.doc_id, r.sig) :: seen
            }
            state.update(seen)
            if (state.getCurrentWatermarkMs() > 0)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
            out.result().iterator
          }
      }
  }

  /** Batch equivalent over the same per-row signatures (the spec oracle):
    * band self-join + the same ≥8/16 fused compare.
    */
  def detectBatch(docs: Dataset[Doc]): DataFrame = {
    val bands = bandRows(docs).toDF()
    val matchesExpr = (0 until NumHashes)
      .map(i => s"CASE WHEN a.sig[$i] = b.sig[$i] THEN 1 ELSE 0 END").mkString(" + ")
    bands.as("a").join(bands.as("b"), Seq("band", "bkey"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        expr(s"$matchesExpr").as("matches"))
      .filter(col("matches") >= MatchFloor)
      .distinct()
  }

  private def toMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
}
