package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Streaming MinHash near-dup detection: the stateful band-bucket stream
  * must produce exactly the candidate pairs the batch band self-join
  * produces over the same per-row signatures.
  */
class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def fixtureDocs(): Seq[StreamingDedup.Doc] =
    spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select(col("doc_id"), col("text")).collect().toSeq
      .map(r => StreamingDedup.Doc(r.getLong(0),
        new java.sql.Timestamp(1700000000000L + r.getLong(0) * 1000L), r.getString(1)))

  test("per-row signature column equals the aggregate-built batch signature") {
    import spark.implicits._
    val ds = spark.createDataset(fixtureDocs().take(20))
    val sigs = ds.withColumn("sig", StreamingDedup.signature).collect()
    // deterministic and well-formed: 16 hashes in [0, p)
    for (r <- sigs) {
      val sig = r.getAs[scala.collection.Seq[Long]]("sig")
      assert(sig.length == StreamingDedup.NumHashes)
      assert(sig.forall(h => h >= 0 && h < 999999937L))
    }
    val again = ds.withColumn("sig", StreamingDedup.signature).collect()
    assert(sigs.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("streaming minhash near-dup candidates match the batch equivalent") {
    import spark.implicits._
    val docs = fixtureDocs()
    val ds = spark.createDataset(docs)
    val batchPairs = StreamingDedup.detectBatch(ds).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.nonEmpty, "fixture should contain planted near-dups")

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingDedup.Doc]
    mem.addData(docs)
    val q = StreamingDedup.detect(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batchPairs,
        s"stream-only: ${streamed -- batchPairs}; batch-only: ${batchPairs -- streamed}")
    } finally q.stop()
  }
}
