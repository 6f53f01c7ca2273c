package graft
object ReproQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    for (q <- Seq("q108_kmeans_embeddings", "q116_cluster_balanced_sample")) {
      try { Queries.queries(q)(spark, "/tmp/dirty_sf").count(); println(q + " OK") }
      catch { case e: Throwable =>
        var t: Throwable = e
        var last: Throwable = e
        while (t != null) { last = t; t = t.getCause }
        println(q + " FAIL " + last.getClass.getName + ": " + String.valueOf(last.getMessage).take(300))
      }
    }
    spark.stop()
  }
}
