package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Dedup, Similarity, TextAnalysis}

/** The duplicate-key (replayed-producer) laws the 16th dirt class
  * pins at the oracle gate, asserted directly on the operators with
  * hand-built replays — so the laws hold independent of which queries
  * happen to exercise them:
  *
  *  - [[Dedup.decontaminate]]: `n_overlap` is the DISTINCT-shingle
  *    intersection — a replayed eval (or corpus) row adds NO evidence,
  *    so a sub-threshold pair cannot cross `minOverlap` by replay, and
  *    a flagged pair still emits exactly one row.
  *  - [[TextAnalysis.sharedSpans]]: (doc, pos) postings are deduped
  *    in-plan, so a replayed row cannot fragment the island grouping
  *    (whose invariant is unique start positions per doc); df still
  *    counts stored rows — a full replay makes the doc self-shared,
  *    which IS the semantics (an exact replay is duplication).
  *
  * Round 14 adds the EMBEDDING replica laws (18th dirt class):
  *
  *  - the id-keyed trained/evaluated ANN family ([[Clustering.kMeans]]
  *    and the quantized [[Similarity]] operators) is exact-replica
  *    IDEMPOTENT — a replayed (id, vector) row re-weights no centroid,
  *    occupies no extra top-k slot, and fans out no recall join —
  *    while a CONFLICTING duplicate (same id, different vector)
  *    refuses loudly (no version column can resolve it);
  *  - the id-LESS [[Clustering.labelCoherenceMargin]] stays per-row
  *    count-weighted (a replica IS another point), the round-13
  *    event-family law. */
class DupKeyLawsSpec extends SparkSpec {

  test("decontaminate: a replayed eval row adds no overlap evidence") {
    import spark.implicits._
    // docs 1 and 2 share exactly 2 distinct 3-gram shingles (abc, bcd)
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val evalOnce = Seq((2L, "a b c d x")).toDF("doc_id", "text")
    val evalReplayed = evalOnce.unionAll(evalOnce)

    // minOverlap = 3: the true intersection is 2 — a replay must NOT
    // double the count over the threshold (the pre-fix bug)
    assert(Dedup.decontaminate(corpus, evalReplayed, "doc_id", col("text"),
      shingleN = 3, minOverlap = 3).count() === 0L)

    // minOverlap = 2: flagged once, with the SET-intersection count,
    // however many times either side was replayed
    val rows = Dedup.decontaminate(
        corpus.unionAll(corpus), evalReplayed, "doc_id", col("text"),
        shingleN = 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq((1L, 2L, 2L)))
  }

  test("debounce: a replayed burst-opener joins its own burst (the " +
      "opener-first tie law the oracles mirror with flag DESC)") {
    import spark.implicits._
    // user 1 / type a: events at t=0 and t=100 (gap > eps=50 opens a
    // burst), with the t=100 OPENER replayed verbatim. The replica
    // ties with the opener on (ts, tie) and must land in the opener's
    // burst — never a burst of its own (the cross-pass split the
    // dirty gate caught in DuckDB), so the output is exactly two
    // bursts with the replay counted
    val ev = Seq((1L, "a", 0L, 10L), (1L, "a", 100L, 11L),
        (1L, "a", 100L, 11L))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val got = graft.operators.EventAnalytics.debounce(
        ev, key = "user_id", ts = "ts_us", typeCol = "event_type",
        tie = "event_id", epsUs = 50L)
      .orderBy(col("ts_first"))
      .select("ts_first", "ts_last", "n_collapsed")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 0L, 1L), (100L, 100L, 2L)))
  }

  test("sharedSpans: a replayed row cannot fragment the island grouping") {
    import spark.implicits._
    val doc = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens, 6 5-grams
    val once = Seq((1L, doc)).toDF("doc_id", "text")
    // the replay makes every doc-1 gram reach minDocs = 2 (df counts
    // stored rows — documented), so the whole text is ONE shared
    // island; pre-fix, the duplicated (doc, pos) postings fragmented
    // pos − row_number into many runs
    val spans = TextAnalysis.sharedSpans(
        once.unionAll(once), col("doc_id"), col("text"),
        n = 5, minDocs = 2L, minSpanTokens = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq === Seq((1L, 0L, 10L, 6L)),
      s"expected one unfragmented full-text span, got ${spans.toSeq}")
  }

  // ---- round-14 laws: the embedding replica class (18th dirt) ---- //

  private def vecs: Seq[(Long, Seq[Double])] = Seq(
    (1L, Seq(0.1, 0.2, 0.3, 0.4)), (2L, Seq(0.9, 0.8, 0.7, 0.6)),
    (3L, Seq(0.2, 0.1, 0.4, 0.3)), (4L, Seq(0.8, 0.9, 0.6, 0.7)),
    (5L, Seq(0.5, 0.5, 0.5, 0.5)), (6L, Seq(0.0, 1.0, 0.0, 1.0)))

  test("kMeans: an exact (id, vector) replay is idempotent — no " +
      "centroid re-weighting, one output row per distinct id") {
    import spark.implicits._
    val once = vecs.toDF("vec_id", "embedding")
    val replayed = once.unionAll(
      once.filter(col("vec_id") === 2L || col("vec_id") === 5L))
    def run(df: org.apache.spark.sql.DataFrame) =
      Clustering.kMeans(df, col("vec_id"), col("embedding"),
          k = 2, iters = 2, seed = "dup14", dim = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    assert(run(replayed) === run(once),
      "a replayed embedding row re-weighted a centroid or re-emitted")
  }

  test("kMeans: a duplicate id with a CONFLICTING vector refuses loudly") {
    import spark.implicits._
    val conflicted = (vecs :+ ((2L, Seq(0.0, 0.0, 0.0, 0.0))))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Clustering.kMeans(conflicted, col("vec_id"), col("embedding"),
        k = 2, iters = 1, seed = "dup14", dim = 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("CONFLICTING")),
      s"expected the loud conflicting-vector refusal, got: $e")
  }

  test("ivfTopKQuant: a replayed corpus row is idempotent — it cannot " +
      "occupy two top-k slots or shift the coarse centroids") {
    import spark.implicits._
    val corp = vecs.toDF("c_id", "c_vec")
    val corpReplayed = corp.unionAll(corp.filter(col("c_id") === 3L))
    val qs = vecs.take(2).toDF("q_id", "q_vec")
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopKQuant(qs, c, k = 3, nLists = 2, nProbe = 2,
          dim = 4, iters = 1, seed = "dup14")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(run(corpReplayed) === run(corp),
      "a replayed candidate row changed the IVF ranking")
  }

  test("labelCoherenceMargin: NO id column, so a replayed row is a " +
      "real point — per-row count-weighting (n counts physical rows)") {
    import spark.implicits._
    val labeled = Seq(
      (Seq(0.1, 0.2, 0.3, 0.4), 0L), (Seq(0.2, 0.1, 0.4, 0.3), 0L),
      (Seq(0.9, 0.8, 0.7, 0.6), 1L), (Seq(0.8, 0.9, 0.6, 0.7), 1L))
      .toDF("embedding", "label")
    val replayed = labeled.unionAll(labeled.filter(col("label") === 0L).limit(1))
    val n = Clustering.labelCoherenceMargin(
        replayed, col("embedding"), col("label"), dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(n === Map(0L -> 3L, 1L -> 2L),
      s"per-row weighting must count the replica as a point, got $n")
  }
}
