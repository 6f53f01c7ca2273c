package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextAnalysis}

/** Round-6 mix/retrieval operators: BM25 ranked retrieval (hand-computed
  * scores + bounded-heap plan shape), Efraimidis–Spirakis weighted
  * sampling (layout independence + weight sensitivity), median/MAD
  * robust outliers (hand-checked groups), and training-mix construction
  * (quotas, ranking, underfill semantics). */
class MixRetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25TopDocs matches the hand-computed Okapi scores") {
    val docs = Seq(
      (1L, "spark spark spark"),
      (2L, "spark window"),
      (3L, "other words entirely")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopDocs(
        docs, col("doc_id"), col("text"), terms = Seq("spark", "window"),
        k = 10, withRank = true)
      .as[(Long, Double, Long, Long)].collect()
    val got = out.map(t => t._1 -> t._2).toMap
    val hits = out.map(t => t._1 -> t._3).toMap
    // the emitted rank must agree with (score desc, doc_id) ordering
    val byRank = out.sortBy(_._4).map(_._1).toSeq
    val byScore = out.sortBy(t => (-t._2, t._1)).map(_._1).toSeq
    assert(out.map(_._4).sorted.toSeq === (1L to out.length).toSeq)
    assert(byRank === byScore)
    // the default (rank-less) surface keeps the 3-column contract
    assert(TextAnalysis.bm25TopDocs(docs, col("doc_id"), col("text"),
      terms = Seq("spark")).columns.toSeq ===
      Seq("doc_id", "score", "n_terms_hit"))

    // Reference BM25 computed longhand (k1=1.2, b=0.75).
    val n = 3.0
    val avgdl = (3.0 + 2.0 + 3.0) / 3.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double, df: Double) =
      idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def round4(x: Double) = math.floor(x * 10000 + 0.5) / 10000.0
    val exp = Map(
      1L -> round4(w(3, 3, 2)),
      2L -> round4(w(1, 2, 2) + w(1, 2, 1)))

    assert(!got.contains(3L), "doc without any query term must not appear")
    assert(got == exp)
    assert(hits == Map(1L -> 1L, 2L -> 2L))
  }

  test("bm25TopDocs cuts with a bounded-heap sort-limit, not a full sort") {
    val docs = Seq.tabulate(50)(i => (i.toLong, s"spark token$i")).toDF("doc_id", "text")
    val q = TextAnalysis.bm25TopDocs(docs, col("doc_id"), col("text"),
      terms = Seq("spark"), k = 5)
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "global top-k must plan as TakeOrderedAndProject")
    assert(q.count() == 5)
  }

  test("weightedSample is layout-independent and k-bounded") {
    val rows = Seq.tabulate(200)(i => (i.toLong, (i % 7 + 1).toLong))
      .toDF("id", "w")
    val a = Sampling.weightedSample(rows, col("id"), col("w"), k = 20, seed = "t")
      .as[(Long, Long, Double)].collect().toSeq
    val b = Sampling.weightedSample(rows.repartition(13), col("id"), col("w"),
        k = 20, seed = "t")
      .as[(Long, Long, Double)].collect().toSeq
    assert(a.size == 20)
    assert(a == b, "sample must not depend on partitioning")
    // The k selected keys are exactly the k globally smallest: taking
    // k = n (full ranking) and cutting locally must agree.
    val full = Sampling.weightedSample(rows, col("id"), col("w"), k = 200,
        seed = "t")
      .as[(Long, Long, Double)].collect().toSeq
    assert(full.take(20) == a)
  }

  test("weightedSample favors heavy rows in proportion to weight") {
    val rows = Seq.tabulate(1000)(i =>
      (i.toLong, if (i % 2 == 0) 100L else 1L)).toDF("id", "w")
    val sample = Sampling.weightedSample(rows, col("id"), col("w"),
        k = 100, seed = "bias")
      .as[(Long, Long, Double)].collect()
    val heavy = sample.count(_._2 == 100L)
    // 500 rows at weight 100 vs 500 at weight 1: the expected heavy share
    // of a 100-row A-RES sample is ≈99%; 70 is a generous deterministic floor.
    assert(heavy > 70, s"expected heavy-weight dominance, got $heavy/100")
  }

  test("robustOutliers flags by group median/MAD") {
    val rows = Seq(
      ("a", 10), ("a", 10), ("a", 10), ("a", 10), ("a", 100),
      ("b", 1), ("b", 2), ("b", 3), ("b", 4), ("b", 5), ("b", 6), ("b", 7))
      .toDF("g", "v")
    val got = TextAnalysis.robustOutliers(rows, col("g"), col("v"), z = 3.0)
      .select(col("g"), col("v"), col("is_outlier"))
      .as[(String, Int, Boolean)].collect().toSeq
    // group a: median 10, MAD 0 → only the 100 deviates (90 > 3·0)
    // group b: median 4, MAD 2 → max deviation 3 ≤ 6, nothing flagged
    assert(got.filter(_._3) == Seq(("a", 100, true)))
    assert(got.count(!_._3) == 11)
  }

  test("temperatureShares: α-flattening, natural at α=1, rate caps at 1") {
    import spark.implicits._
    // 100 vs 25 docs at α=½: weights 10 vs 5 → shares 2/3, 1/3
    val df = (Seq.fill(100)("a") ++ Seq.fill(25)("b")).toDF("src")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val half = Sampling.temperatureShares(df, col("src"), 0.5, 50L)
      .orderBy("stratum")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(half === Seq(
      ("a", 100L, r6(2.0 / 3), r6(2.0 / 3 * 50 / 100)),
      ("b", 25L, r6(1.0 / 3), r6(1.0 / 3 * 50 / 25))))
    // α = 1 reproduces natural proportions
    val nat = Sampling.temperatureShares(df, col("src"), 1.0, 50L)
      .orderBy("stratum").as[(String, Long, Double, Double)].collect()
    assert(nat.map(_._3).toSeq === Seq(0.8, 0.2))
    // an upweighted tiny source caps its rate at 1 (repeat epochs,
    // don't mint rows)
    val capped = Sampling.temperatureShares(df, col("src"), 0.5, 1000L)
      .orderBy("stratum").as[(String, Long, Double, Double)].collect()
    assert(capped(1)._4 === 1.0)
    // NULL strata drop
    assert(Sampling.temperatureShares(
      Seq(Some("a"), None).toDF("src"), col("src"), 0.5, 10L).count() === 1L)
  }

  test("labelNdcg: graded ranking quality, NULL for no-relevant, NULL labels never relevant") {
    import spark.implicits._
    import graft.operators.Similarity
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    // ranking by cosine against q=(1,0): c1 (1,0) → rank 1, c2 (1,0.2)
    // → rank 2, c3 (1,0.5) → rank 3; labels make ranks 2,3 relevant
    val queries = Seq((10L, Seq(1.0f, 0.0f))).toDF("q_id", "q_vec")
    val corpus = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.2f)),
      (3L, Seq(1.0f, 0.5f))).toDF("c_id", "c_vec")
    val labels = Seq((10L, Some(7)), (1L, Some(1)), (2L, Some(7)),
      (3L, Some(7))).toDF("vec_id", "label")
    val out = Similarity.labelNdcg(queries, corpus, labels, k = 3)
      .as[(Long, Long, Long, Double, Option[Double])].collect().toSeq
    val dcg = 1.0 / lg2(3) + 1.0 / lg2(4)
    val idcg = 1.0 / lg2(2) + 1.0 / lg2(3)
    assert(out === Seq((10L, 3L, 2L, r6(dcg), Some(r6(dcg / idcg)))))

    // no relevant retrieval → NULL nDCG; a NULL candidate label is
    // never relevant
    val labels2 = Seq((10L, Some(9)), (1L, Option.empty[Int]),
      (2L, Some(7)), (3L, Some(7))).toDF("vec_id", "label")
    val none = Similarity.labelNdcg(queries, corpus, labels2, k = 3)
      .as[(Long, Long, Long, Double, Option[Double])].collect().toSeq
    assert(none === Seq((10L, 3L, 0L, 0.0, None)))
  }

  test("trainingMix fills quotas with best-ranked rows, drops unlisted strata, underfills honestly") {
    val rows = (0 until 10).map(i => ("x", i.toLong, 100L + i)) ++
      (0 until 10).map(i => ("y", 100L + i, 200L + i)) ++
      (0 until 5).map(i => ("z", 200L + i, 300L + i))
    val df = rows.toDF("lang", "id", "len")
    val mix = Sampling.trainingMix(df, col("lang"), col("len"), col("id"),
        budget = 10L, shares = Seq(("x", 0.5), ("y", 0.3)))
      .as[(String, Long, Long, Int)].collect()
    val byLang = mix.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byLang.keySet == Set("x", "y"), "unlisted stratum z must drop")
    // x quota 5: the 5 longest x docs are ids 5..9; y quota 3: ids 107..109
    assert(byLang("x") == Set(5L, 6L, 7L, 8L, 9L))
    assert(byLang("y") == Set(107L, 108L, 109L))
    // underfill: y has only 10 rows against a quota of 30 → all 10, no backfill
    val under = Sampling.trainingMix(df, col("lang"), col("len"), col("id"),
        budget = 100L, shares = Seq(("y", 0.3)))
      .as[(String, Long, Long, Int)].collect()
    assert(under.length == 10 && under.forall(_._1 == "y"))
  }

  test("quantileNormalize: pooled interpolation, edges, singleton NULL, null drop") {
    // pooled sorted: [10, 15, 20, 30, 100, 200], N = 6
    val df = Seq(
      (1L, Some("a"), Some(10L)), (2L, Some("a"), Some(20L)),
      (3L, Some("a"), Some(30L)),
      (4L, Some("b"), Some(100L)), (5L, Some("b"), Some(200L)),
      (6L, Some("c"), Some(15L)),                  // singleton stratum
      (7L, Some("a"), Option.empty[Long]))         // NULL score drops
      .toDF("doc_id", "source", "n_chars")
    val out = graft.operators.Sampling.quantileNormalize(
        df, col("doc_id"), col("source"), col("n_chars"))
      .orderBy("id")
      .as[(Long, Option[String], Double, Option[Double], Option[Double])]
      .collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // a/20: p = 0.5 → pos 2.5 → halfway between pooled idx 2 (20)
    // and 3 (30) = 25; stratum extremes land on the pooled extremes
    assert(out(0)._5 === Some(10.0))
    assert(out(1)._4 === Some(0.5) && out(1)._5 === Some(25.0))
    assert(out(2)._5 === Some(200.0))
    assert(out(3)._5 === Some(10.0) && out(4)._5 === Some(200.0))
    // singleton stratum: (rank−1)/(n−1) is 0/0 → NULL, never 0
    assert(out(5)._4.isEmpty && out(5)._5.isEmpty)
  }
}
