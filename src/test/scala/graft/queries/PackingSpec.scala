package graft.queries

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Greedy no-split packing edge cases the gate fixture may not cover:
  * over-long documents, exact-fit boundaries, and the per-shard state
  * reset of the partition-fold implementation.
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pack(rows: Seq[(Long, String, String)], window: Int) =
    Corpus.packGreedy(
      rows.toDF("doc_id", "lang", "text"), window, "lang")
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap

  test("greedy fill: exact fit stays, overflow starts the next bin") {
    // token lengths: 3, 3, 2, 3  with window 6 → bins 0,0,1,1
    val r = pack(Seq(
      (1L, "en", "a b c"), (2L, "en", "d e f"),
      (3L, "en", "g h"), (4L, "en", "i j k")), 6)
    assert(r == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("an over-long document gets a bin alone and the fold continues") {
    // lengths: 2, 9 (over window 4), 2, 2 → bins 0, 1, 2, 2
    val r = pack(Seq(
      (1L, "en", "a b"), (2L, "en", "c d e f g h i j k"),
      (3L, "en", "l m"), (4L, "en", "n o")), 4)
    assert(r == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("bins restart per shard and shards pack independently") {
    val df = Corpus.packGreedy(Seq(
      (1L, "en", "a b c"), (2L, "de", "x y z"),
      (3L, "en", "d e f"), (4L, "de", "u v w")
    ).toDF("doc_id", "lang", "text"), 4, "lang")
    val rows = df.select("doc_id", "shard", "bin")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, "en", 0L), (2L, "de", 0L),
      (3L, "en", 1L), (4L, "de", 1L)))
  }
}
