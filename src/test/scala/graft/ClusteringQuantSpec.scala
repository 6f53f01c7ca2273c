package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Similarity, TextAnalysis}

/** Round-6 clustering/quantization/fusion operators: portable k-means
  * (separation, layout independence, empty-cluster fallback), int8
  * quantization (lane bounds, zero-vector guard, reconstruction
  * fidelity, quantized-vs-exact ANN agreement), reciprocal-rank fusion
  * (hand-computed scores), and DSIR importance scoring (target
  * affinity ordering). */
class ClusteringQuantSpec extends SparkSpec {
  import spark.implicits._

  private def twoBlobs = {
    // 8 points around the origin, 8 around (10,10,10,10) — separation
    // far beyond any quantization wobble
    val lo = Seq.tabulate(8)(i => (i.toLong, Array(0.1f * i, 0f, 0.1f, 0f)))
    val hi = Seq.tabulate(8)(i => (100L + i, Array(10f + 0.1f * i, 10f, 10f, 10f)))
    (lo ++ hi).toDF("id", "v")
  }

  test("kMeans separates two obvious blobs and is layout-independent") {
    val out = Clustering.kMeans(twoBlobs, col("id"), col("v"),
        k = 2, iters = 3, seed = "s", dim = 4)
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    assert(out.length == 16)
    val loClusters = out.filter(_._1 < 100).map(_._2).distinct
    val hiClusters = out.filter(_._1 >= 100).map(_._2).distinct
    assert(loClusters.length == 1 && hiClusters.length == 1,
      s"each blob must land in one cluster: $loClusters / $hiClusters")
    assert(loClusters.head != hiClusters.head, "blobs must separate")

    val shuffled = Clustering.kMeans(twoBlobs.repartition(7), col("id"),
        col("v"), k = 2, iters = 3, seed = "s", dim = 4)
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    assert(out.toSeq == shuffled.toSeq,
      "assignment must not depend on input partitioning")
  }

  test("kMeans keeps the previous centroid for an emptied cluster") {
    // k = 3 over 2 distinct points (one duplicated): one seed duplicates
    // another, its cluster drains to the lower cid on the first
    // assignment and must survive via the keep-previous fallback.
    val df = Seq(
      (1L, Array(0f, 0f)), (2L, Array(0f, 0f)), (3L, Array(5f, 5f)))
      .toDF("id", "v")
    val out = Clustering.kMeans(df, col("id"), col("v"),
        k = 3, iters = 2, seed = "s", dim = 2)
      .as[(Long, Int, Double)].collect()
    assert(out.length == 3, "every input row keeps exactly one assignment")
    assert(out.forall(_._3 == 0.0),
      "each point sits exactly on a surviving centroid here")
  }

  test("withInt8 lanes are integral, bounded, and zero-safe") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0f, 0f, 0f))).toDF("id", "v")
    val rows = Similarity.withInt8(df, col("v"))
      .select(col("id"), col("q_scale"), col("q8"))
      .as[(Long, Double, Seq[Double])].collect().sortBy(_._1).toSeq

    val (_, s1, q1) = rows(0)
    assert(math.abs(s1 - 1.0 / 127.0) < 1e-15)
    assert(q1.forall(v => v == math.floor(v) && v.abs <= 127.0),
      s"lanes must be integral in [-127,127]: $q1")
    assert(q1 == Seq(64.0, -127.0, 32.0))

    val (_, s2, q2) = rows(1)
    assert(s2 == 0.0 && q2 == Seq(0.0, 0.0, 0.0),
      "zero vector must quantize to zeros with scale 0")
  }

  test("int8 reconstruction keeps cosine ≈ 1 and the quantized " +
      "ranking agrees with the exact one on separated data") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val m = Similarity.int8Metrics(emb, col("vec_id"), col("embedding"))
      .agg(min(col("cos_recon")).as("mn"), max(col("sse")).as("mx"))
      .as[(Double, Double)].head()
    assert(m._1 > 0.999, s"int8 reconstruction cosine sagged: ${m._1}")
    assert(m._2 < 0.01, s"sse blew up: ${m._2}")

    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val cs = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val quant = Similarity.int8BruteForceTopK(qs, cs, k = 5)
      .select(col("q_id"), col("c_id")).as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(qs, cs, k = 5)
      .select(col("q_id"), col("c_id")).as[(Long, Long)].collect().toSet
    val overlap = (quant intersect exact).size.toDouble / exact.size
    assert(overlap >= 0.8, s"quantized top-5 lost too much: $overlap")
  }

  test("rrfFuse matches hand-computed reciprocal-rank sums") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val b = Seq((2L, 1L), (3L, 2L)).toDF("doc_id", "rank")
    val out = TextAnalysis.rrfFuse(Seq(a, b), k0 = 60)
      .as[(Long, Double, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out(1L) == ((1.0 / 61.0, 1L)))
    assert(out(2L) == ((1.0 / 62.0 + 1.0 / 61.0, 2L)))
    assert(out(3L) == ((1.0 / 62.0, 1L)))
  }

  test("dsirLogRatio ranks target-looking documents above off-target") {
    val docs = Seq(
      (1L, "alpha beta alpha beta", true),   // pure target vocabulary
      (2L, "alpha beta gamma delta", true),
      (3L, "gamma delta gamma delta", false), // pure off-target
      (4L, "alpha beta gamma delta", false))
      .toDF("doc_id", "text", "tgt")
    val out = TextAnalysis.dsirLogRatio(
        docs, col("doc_id"), col("text"), isTarget = col("tgt"))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(out(1L) > out(3L),
      s"pure-target doc must outscore pure-off-target: $out")
    // identical texts score identically regardless of their own label
    // (the model is corpus-level, not per-doc)
    assert(math.abs(out(2L) - out(4L)) < 1e-12)
    assert(out(1L) > 0 && out(3L) < 0,
      s"signs must reflect target affinity: $out")
  }

  test("kMeans refuses empty input, NULL ids, and NULL vectors with " +
      "named errors (not misleading downstream crashes)") {
    import graft.operators.Clustering
    def msgs(t: Throwable): Seq[String] = Option(t).toSeq
      .flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val empty = Seq.empty[(Long, Seq[Float])].toDF("id", "vec")
    val e1 = intercept[IllegalArgumentException] {
      Clustering.kMeans(empty, col("id"), col("vec"), k = 2, iters = 1,
        seed = "s", dim = 2)
    }
    assert(e1.getMessage.contains("input is empty"), e1.getMessage)
    val nullVec = Seq((1L, Some(Seq(1.0f, 2.0f))), (2L, Option.empty[Seq[Float]]))
      .toDF("id", "vec")
    val e2 = intercept[Exception] {
      Clustering.kMeans(nullVec, col("id"), col("vec"), k = 1, iters = 1,
        seed = "s", dim = 2).collect()
    }
    assert(msgs(e2).exists(_.contains("NULL vector")), e2.toString)
    val nullId = Seq((Some(1L), Seq(1.0f, 2.0f)), (Option.empty[Long], Seq(3.0f, 4.0f)))
      .toDF("id", "vec")
    val e3 = intercept[Exception] {
      Clustering.kMeans(nullId, col("id"), col("vec"), k = 1, iters = 1,
        seed = "s", dim = 2).collect()
    }
    assert(msgs(e3).exists(_.contains("NULL id")), e3.toString)
  }

  test("labelCoherenceMargin: hand 2-D fixture, traitor point, laws") {
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // label 0: two clean axis-x points + one traitor on axis-y;
    // label 1: two clean axis-y points. Centroid sums (scale 1e4):
    // L0 = (20000, 10000), L1 = (0, 20000).
    val df = Seq(
      (Option(0), Some(Seq(1.0f, 0.0f))),
      (Option(0), Some(Seq(1.0f, 0.0f))),
      (Option(0), Some(Seq(0.0f, 1.0f))),   // traitor
      (Option(1), Some(Seq(0.0f, 1.0f))),
      (Option(1), Some(Seq(0.0f, 1.0f))),
      (Option.empty[Int], Some(Seq(9.0f, 9.0f))),  // NULL label drops
      (Option(1), Option.empty[Seq[Float]]))        // NULL vec drops
      .toDF("label", "embedding")
    val out = graft.operators.Clustering.labelCoherenceMargin(
        df, col("embedding"), col("label"), dim = 2)
      .orderBy("label")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    val cleanA = 20000.0 / math.sqrt(20000.0 * 20000.0 + 10000.0 * 10000.0)
    val traitorA = 10000.0 / math.sqrt(20000.0 * 20000.0 + 10000.0 * 10000.0)
    assert(out.size === 2)
    // label 0: n=3, one confusable point (traitor: own 0.447 < rival 1.0)
    assert(out(0)._1 === 0L && out(0)._2 === 3L)
    assert(out(0)._3 === r6((2 * cleanA + traitorA) / 3.0))
    assert(out(0)._6 === r6(1.0 / 3.0))
    // label 1: both points sit ON the centroid ray → a = 1, rival 0.447
    assert(out(1)._1 === 1L && out(1)._2 === 2L)
    assert(out(1)._3 === 1.0 && out(1)._4 === r6(traitorA))
    assert(out(1)._6 === 0.0)
    // single label: loud refusal
    val one = Seq((0, Seq(1.0f, 0.0f))).toDF("label", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Clustering.labelCoherenceMargin(
        one, col("embedding"), col("label"), dim = 2)
    }
    assert(e.getMessage.contains(">= 2 labels"), e.getMessage)
  }

  test("labelCoherenceMargin: ragged vectors refuse loudly; all-NULL " +
      "(label, dim) cells coalesce to 0 (no driver NPE)") {
    def msgs(t: Throwable): Seq[String] = Option(t).toSeq
      .flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // ragged: the in-plan vectorDimGuard kills the query (without it
    // the native dot would fold to the short length and this label's
    // centroid dim would be inferred from its own max index)
    val ragged = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 2.0f))).toDF("label", "embedding")
    val e = intercept[Exception] {
      graft.operators.Clustering.labelCoherenceMargin(
        ragged, col("embedding"), col("label"), dim = 2).collect()
    }
    assert(msgs(e).exists(_.contains("dimension guard")), e.toString)
    // an all-NULL element position for one label: the centroid cell
    // sums to SQL NULL — must land as component 0.0 (the native fold's
    // null-as-0.0 law), never a Row.getLong NPE on the driver
    val nullEl = Seq(
      (0L, Seq(Option(1.0f), Option.empty[Float])),
      (0L, Seq(Option(1.0f), Option.empty[Float])),
      (1L, Seq(Option(0.0f), Option(1.0f))))
      .toDF("label", "embedding")
    val out = graft.operators.Clustering.labelCoherenceMargin(
        nullEl, col("embedding"), col("label"), dim = 2)
      .orderBy("label")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(out.size === 2)
    // label-0 centroid = (20000, 0); each point reads (1, null→0) in
    // the native fold → own cos exactly 1.0, rival cos 0.0
    assert(out(0)._1 === 0L && out(0)._2 === 2L)
    assert(out(0)._3 === 1.0 && out(0)._4 === 0.0 && out(0)._6 === 0.0)
  }
}
