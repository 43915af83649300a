package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the minhash pipeline. */
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
      println(f"STAGE $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val raw = spark.read.parquet(s"$d/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(expr("sequence(1, length(text)-7)")).as("i"), col("text"))
      .select(col("doc_id"), expr("substring(text, i, 8)").as("sh"))
    time("raw-explode-count")(raw.count())
    time("raw-explode-count2")(raw.count())
    time("distinct-count")(raw.distinct().count())
    val sh = spark.read.parquet(s"$d/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(expr("sequence(1, length(text)-7)")).as("i"), col("text"))
      .select(col("doc_id"), expr("substring(text, i, 8)").as("sh"))
      .distinct().cache()
    time("shingles+cache")(sh.count())
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    time("sizes")(sizes.count())
    val hashed = sh.withColumn("hnum",
      expr("cast(conv(substring(md5(sh), 1, 15), 16, 10) AS bigint) % 999999937"))
    val minCols = (0 until 16).map(s0 =>
      min(expr(s"(hnum * ${s0 + 1} + $s0 * 1000003) % 999999937")).as(s"m$s0"))
    val stackExpr = (0 until 16).map(s0 => s"$s0, m$s0").mkString(", ")
    val sigs = hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), expr(s"stack(16, $stackExpr)").as(Seq("seed", "minh"))).cache()
    time("sigs")(sigs.count())
    val bands = sigs.withColumn("band", expr("cast(floor(seed / 4.0) AS int)"))
      .groupBy("doc_id", "band").agg(sum(expr("minh * (seed % 4 + 1)")).as("bkey")).cache()
    time("bands")(bands.count())
    val cand = bands.as("a").join(bands.as("b"), Seq("band", "bkey"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id")).distinct().cache()
    time("cand")(println("cand=" + cand.count()))
    val est = cand
      .join(sigs.select(col("doc_id").as("a_id"), col("seed"), col("minh").as("mha")), Seq("a_id"))
      .join(sigs.select(col("doc_id").as("b_id"), col("seed"), col("minh").as("mhb")), Seq("b_id", "seed"))
      .groupBy("a_id", "b_id")
      .agg(sum(when(col("mha") === col("mhb"), 1).otherwise(0)).as("matches"))
      .filter(col("matches") >= 8).select("a_id", "b_id").cache()
    time("est")(println("est=" + est.count()))
    val inter = est
      .join(sh.as("s1"), col("a_id") === col("s1.doc_id"))
      .join(sh.as("s2"), col("b_id") === col("s2.doc_id") && col("s1.sh") === col("s2.sh"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    val out = inter
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("sza")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("szb")), Seq("b_id"))
      .withColumn("jaccard", round(col("inter") / (col("sza") + col("szb") - col("inter")), 4))
      .filter(col("jaccard") >= 0.8)
    time("verify")(out.count())
    spark.stop()
  }
}
