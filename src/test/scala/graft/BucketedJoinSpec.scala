package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Co-located (bucketed) join: both sides pre-bucketed on the join key
  * → the join plan contains NO shuffle exchange. The 100 TB pattern
  * for repeatedly-joined fact tables (pay the shuffle once at write
  * time, never again at read time). */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val dir = sf("sf0.001")
    // at this tiny SF the planner would broadcast; disable so the join
    // is the shuffle-family kind bucketing is designed to de-shuffle.
    // Session is JVM-shared across suites → restore in finally.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // the in-memory catalog's DROP TABLE can leave the managed location
    // behind from a previous JVM — clear it or saveAsTable refuses
    Seq("orders_b", "lineitem_b").foreach { t =>
      val p = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Tables.orders(spark, dir).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, dir).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the JOIN itself must not shuffle either side (bucket layout is
    // the partitioning); only the final groupBy may exchange
    val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1)
    assert(joinSection.nonEmpty, s"expected a shuffle-family join in:\n$plan")
    assert(!joinSection.mkString.contains("Exchange hashpartitioning(o_orderkey")
      && !joinSection.mkString.contains("Exchange hashpartitioning(l_orderkey"),
      s"join inputs must come from bucket layout, not a shuffle:\n$plan")

    // and the result matches the plain (shuffling) join
    val expected = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("bucketed append: increment lands in the layout, join stays exchange-free") {
    val dir = sf("sf0.001")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val tbl = "orders_append_b"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val p = java.nio.file.Paths.get(s"spark-warehouse/$tbl")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
      val orders = Tables.orders(spark, dir)
      orders.filter(col("o_orderkey") % 2 === 0).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(tbl)
      Tables.bucketedAppend(spark, tbl,
        orders.filter(col("o_orderkey") % 2 === 1), "o_orderkey")

      assert(spark.table(tbl).count() === orders.count())
      val lTbl = Tables.bucketed(spark, dir, "lineitem", "l_orderkey")
      val joined = spark.table(tbl).hint("merge")
        .join(spark.table(lTbl), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("SortMergeJoin").drop(1)
      assert(joinSection.nonEmpty, plan)
      assert(!joinSection.mkString.contains("Exchange hashpartitioning(o_orderkey")
        && !joinSection.mkString.contains("Exchange hashpartitioning(l_orderkey"),
        s"append must preserve the zero-exchange join:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("bucketed build race: two concurrent sessions, no data loss, adoption on rebuild") {
    val dir = sf("sf0.001")
    // the derived name carries the bucket count (default 8): a layout
    // built with a different modulus must never be adopted
    val tbl = "customer_c_custkey_b8_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(warehouse, tbl)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)

    // two "sessions" racing to build the same derived name: the
    // temp-write-and-rename protocol must leave exactly one complete
    // build and lose no rows, whoever wins
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val builds = Seq(
      Future(Tables.bucketed(spark, dir, "customer", "c_custkey")),
      Future(Tables.bucketed(spark, dir, "customer", "c_custkey")))
    val names = Await.result(Future.sequence(builds), 120.seconds)
    assert(names.toSet === Set(tbl))

    val expected = Tables.customer(spark, dir).count()
    assert(spark.table(tbl).count() === expected)
    assert(fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")),
      "winning build must carry its _SUCCESS marker")
    // no stray temp locations left in the warehouse
    val strays = fs.listStatus(new org.apache.hadoop.fs.Path(warehouse))
      .map(_.getPath.getName).filter(_.startsWith(s"${tbl}_tmp_"))
    assert(strays.isEmpty, s"leftover temp builds: ${strays.mkString(",")}")
    // Hadoop rename onto an existing dir NESTS the source inside it and
    // returns true — the loser's whole build would hide inside the table
    // location (invisible to a non-recursive count, doubling rows for
    // recursive readers). The protocol must have removed any such copy.
    val nestedDirs = fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
    assert(nestedDirs.isEmpty,
      s"loser build nested inside the table location: ${nestedDirs.mkString(",")}")

    // a later JVM (catalog forgot the table) ADOPTS the existing
    // complete build instead of deleting it: same location, same rows
    spark.sql(s"DROP TABLE `$tbl`") // external → data stays
    assert(fs.exists(p), "external drop must keep the data")
    val t0 = fs.getFileStatus(p).getModificationTime
    assert(Tables.bucketed(spark, dir, "customer", "c_custkey") === tbl)
    assert(spark.table(tbl).count() === expected)
    assert(fs.getFileStatus(p).getModificationTime === t0,
      "adoption must not rewrite the existing build")

    // an INCOMPLETE leftover (no _SUCCESS — crashed build) is rebuilt
    spark.sql(s"DROP TABLE `$tbl`")
    fs.delete(new org.apache.hadoop.fs.Path(p, "_SUCCESS"), false)
    assert(Tables.bucketed(spark, dir, "customer", "c_custkey") === tbl)
    assert(spark.table(tbl).count() === expected)

    // a leftover built from DIFFERENT source data (fingerprint mismatch
    // — the regenerated-testdata hazard) is rebuilt, not adopted
    spark.sql(s"DROP TABLE `$tbl`")
    val fp = new org.apache.hadoop.fs.Path(p, "_GRAFT_SRC_FINGERPRINT")
    val out = fs.create(fp, true)
    try out.write("stale-build-from-old-source".getBytes("UTF-8"))
    finally out.close()
    assert(Tables.bucketed(spark, dir, "customer", "c_custkey") === tbl)
    assert(spark.table(tbl).count() === expected)
    val in = fs.open(fp)
    val back = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    assert(back != "stale-build-from-old-source",
      "stale-fingerprint leftover must have been rebuilt with a fresh marker")
  }

  test("ORC source/sink round-trip preserves rows and pushes filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_").toString
    val orders = Tables.orders(spark, sf("sf0.001"))
    graft.sources.Sinks.writeOrc(orders, s"$dir/orders_orc")
    val back = Tables.orc(spark, s"$dir/orders_orc")
    assert(back.count() === orders.count())
    val filtered = back.filter(col("o_totalprice") > 100000)
      .select("o_orderkey", "o_totalprice")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"),
      s"ORC scan must receive the pushed filter:\n$plan")
    assert(filtered.count() ===
      orders.filter(col("o_totalprice") > 100000).count())
  }

  test("registered bucketed queries (q52/q53): no exchange on the join inputs, q05/q06 results") {
    val dir = sf("sf0.001")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val q52 = Queries.queries("q52_bucketed_join_revenue")(spark, dir)
      val plan = q52.queryExecution.executedPlan.toString
      val joinSection = plan.split("SortMergeJoin").drop(1)
      assert(joinSection.nonEmpty, s"expected a sort-merge join in:\n$plan")
      assert(!joinSection.mkString.contains("Exchange hashpartitioning(o_orderkey")
        && !joinSection.mkString.contains("Exchange hashpartitioning(l_orderkey"),
        s"join inputs must come from bucket layout, not a shuffle:\n$plan")
      assert(q52.collect().map(_.toSeq).toSeq ===
        Queries.queries("q05_join_revenue_by_priority")(spark, dir)
          .collect().map(_.toSeq).toSeq)

      val q53 = Queries.queries("q53_bucketed_semi_active")(spark, dir)
      val plan53 = q53.queryExecution.executedPlan.toString
      val semiSection = plan53.split("SortMergeJoin").drop(1)
      assert(semiSection.nonEmpty, s"expected a sort-merge semi join in:\n$plan53")
      assert(!semiSection.mkString.contains("Exchange hashpartitioning(c_custkey")
        && !semiSection.mkString.contains("Exchange hashpartitioning(o_custkey"),
        s"semi-join inputs must come from bucket layout:\n$plan53")
      assert(q53.collect().map(_.toSeq).toSeq ===
        Queries.queries("q06_semi_join")(spark, dir)
          .collect().map(_.toSeq).toSeq)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
