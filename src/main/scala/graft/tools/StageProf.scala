package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the dedup pipelines (mirrors the
  * structure in graft.queries.Dedup: shingles → sets → wide minhash sigs →
  * md5 band keys → candidates → estimator prefilter → exact verify).
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sh = spark.read.parquet(s"$d/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(expr("sequence(1, length(text)-7)")).as("i"), col("text"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(substring(text, i, 8)), 1, 15), 16, 10) AS bigint)").as("sh"))
      .distinct().cache()
    time("shingles+cache")(println("shingles=" + sh.count()))
    val sets = sh.groupBy("doc_id")
      .agg(collect_set(col("sh")).as("set"), count(lit(1)).as("sz")).cache()
    time("sets+cache")(sets.count())
    val hashed = sh.withColumn("hnum", col("sh") % 999999937)
    val minCols = (0 until 16).map(s0 =>
      min(expr(s"(hnum * ${s0 + 1} + $s0 * 1000003) % 999999937")).as(s"m$s0"))
    val wide = hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*).cache()
    time("wide-sigs+cache")(wide.count())
    val bandExprs = (0 until 4).map(b =>
      s"$b, md5(concat_ws(',', m${4 * b}, m${4 * b + 1}, m${4 * b + 2}, m${4 * b + 3}))")
      .mkString(", ")
    val bands = wide.select(col("doc_id"), expr(s"stack(4, $bandExprs)").as(Seq("band", "bkey")))
    val cand = bands.as("a").join(bands.as("b"), Seq("band", "bkey"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id")).distinct().cache()
    time("band-cand")(println("cand=" + cand.count()))
    val matchesExpr = (0 until 16)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
    val est = cand
      .join(wide.as("a"), col("a.doc_id") === col("a_id"))
      .join(wide.as("b"), col("b.doc_id") === col("b_id"))
      .filter(expr(s"($matchesExpr) >= 8"))
      .select("a_id", "b_id").cache()
    time("est-prefilter")(println("est=" + est.count()))
    val out = est
      .join(sets.select(col("doc_id").as("a_id"), col("set").as("sa"), col("sz").as("sza")), Seq("a_id"))
      .join(sets.select(col("doc_id").as("b_id"), col("set").as("sb"), col("sz").as("szb")), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", round(col("inter") / (col("sza") + col("szb") - col("inter")), 4))
      .filter(col("jaccard") >= 0.8)
    time("verify")(println("pairs=" + out.count()))
    // n-gram channel
    val freq = sh.groupBy("sh").agg(count(lit(1)).as("df")).filter(col("df") <= 50)
    val rare = sh.join(freq.select("sh"), Seq("sh")).cache()
    time("rare-index+cache")(println("rare=" + rare.count()))
    val ncand = rare.as("a").join(rare.as("b"), Seq("sh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 5).select("a_id", "b_id")
    time("ngram-cand")(println("ncand=" + ncand.count()))
    spark.stop()
  }
}
