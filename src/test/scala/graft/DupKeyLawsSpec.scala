package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

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
  *    which IS the semantics (an exact replay is duplication). */
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
}
