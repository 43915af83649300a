package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of SparkEntry queries.
  * Usage: ExplainQ <comma-separated-query-names> <sfDir>
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args(0).split(",")) {
      println(s"\n===== $q =====")
      graft.SparkEntry.queries(q)(spark, args(1)).explain("formatted")
    }
    spark.stop()
  }
}
