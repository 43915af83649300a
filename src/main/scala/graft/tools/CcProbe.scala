package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: A/B connectedComponents configurations inside ONE JVM (the
  * host oscillates ±35%, so cross-JVM comparisons are unusable). Runs the
  * synthetic long chain — the worst case for min-label propagation — and,
  * when a fixture dir is given, the real embedding near-dup pair graph.
  * Usage: runMain graft.tools.CcProbe [nChain] [sfDir]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3000)
    val sfDir = args.lift(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val chain = (0L until n.toLong).map(i => (i, i + 1)).toDF("a_id", "b_id")
      .localCheckpoint()
    val real = sfDir.map { d =>
      graft.SparkEntry.queries("q_embed_neardup")(spark, d)
        .select(org.apache.spark.sql.functions.col("a_id"),
          org.apache.spark.sql.functions.col("b_id"))
        .localCheckpoint()
    }
    def run(tag: String, pairs: org.apache.spark.sql.DataFrame, hops: Int): Unit = {
      val t0 = System.nanoTime()
      val out = graft.queries.Dedup.connectedComponents(pairs, hopsPerRound = hops)
      val cnt = out.count()
      println(f"CCPROBE $tag hops=$hops rounds=${graft.queries.Dedup.lastCcRounds} " +
        f"nodes=$cnt total=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // interleave A/B twice so host drift averages out
    for (rep <- 1 to 2; hops <- Seq(1, 2, 3)) {
      run(s"chain rep$rep", chain, hops)
      real.foreach(p => run(s"real rep$rep", p, hops))
    }
    spark.stop()
  }
}
