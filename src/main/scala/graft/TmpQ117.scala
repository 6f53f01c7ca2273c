package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TmpQ117 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/tmp/dirty_sf"
    val gated = graft.operators.TextAnalysis.withTextStats(
        graft.sources.Tables.load(spark, d, "documents"), col("text"))
      .filter(col("quality_score") >= 0.29)
    println("gate=" + gated.count())
    val kept = graft.operators.Dedup.exact(gated, col("doc_id"), col("text"))
      .filter(!col("is_dup"))
    println("kept=" + kept.count())
    val train = graft.operators.Sampling.seededSplit(
        kept, col("doc_id"), seed = "r6mix",
        weights = Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)))
      .filter(col("split") === "train")
    println("train=" + train.count())
    spark.stop()
  }
}
