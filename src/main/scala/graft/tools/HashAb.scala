package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** In-JVM A/B of the native graft_md5p60 vs the SQL md5/conv triple on
  * the docSets shingle pass (same action, same partitioning — only the
  * per-shingle hash expression differs). Wall-clock across JVMs is
  * unusable on this box; a within-JVM interleaved A/B is the honest
  * instrument for an expression-level change.
  */
object HashAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.ensure(spark)
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .repartition(32, col("doc_id"))
    val sqlTriple = "cast(conv(substring(md5(substring(text, i, 8)), 1, 15), 16, 10) AS bigint)"
    val native = "graft_md5p60(substring(text, i, 8))"
    def pass(h: String): Long = docs.select(
      expr(s"aggregate(transform(sequence(1, length(text)-7), i -> $h), 0L, (a, x) -> a ^ x)").as("c"))
      .agg(expr("bit_xor(c)")).head.getLong(0)
    // warm both codepaths
    pass(sqlTriple); pass(native)
    def time(label: String, h: String): Double = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); pass(h); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-10s median=${ts(2)}%6.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
      ts(2)
    }
    // interleaved
    val a1 = time("sql", sqlTriple); val b1 = time("native", native)
    val a2 = time("sql", sqlTriple); val b2 = time("native", native)
    println(f"checksum equal: ${pass(sqlTriple) == pass(native)}")
    println(f"speedup=${(a1 + a2) / (b1 + b2)}%.2f")
    spark.stop()
  }
}
