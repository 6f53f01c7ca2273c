package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.CorpusQuality

/** [[CorpusQuality]] — Gopher/C4 web-corpus heuristics on REAL
  * multi-line fixtures (the oracle queries run on the single-line
  * testdata corpus with derived lines; these pin the semantics the
  * derived structure can't exercise: true newlines, terminal
  * punctuation, the NULL/empty edge laws). */
class CorpusQualitySpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("withGopherStats: word shape stats + null law") {
    val df = CorpusQuality.withGopherStats(
      docs(1L -> "aa bbb cccc", 2L -> "# ... ok", 3L -> null, 4L -> ""),
      col("text"))
    val m = df.select("doc_id", "n_words", "mean_word_len",
      "alpha_word_frac", "symbol_word_ratio")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) == 3L)
    assert(m(1L).getDouble(2) == 3.0)          // (2+3+4)/3
    assert(m(1L).getDouble(3) == 1.0)
    assert(m(1L).getDouble(4) == 0.0)
    assert(m(2L).getLong(1) == 3L)
    assert(m(2L).getDouble(3) == 1.0 / 3.0)    // only "ok" has alpha
    assert(m(2L).getDouble(4) == 2.0 / 3.0)    // '#' + '...'
    assert(m(3L).isNullAt(1) && m(3L).isNullAt(2)
      && m(3L).isNullAt(3) && m(3L).isNullAt(4)) // NULL text -> NULL stats
    assert(m(4L).getLong(1) == 1L && m(4L).getDouble(2) == 0.0)
  }

  test("gopherKeep: three-valued gate — null text never passes") {
    val good = "the quick brown fox jumps over the lazy dog again " * 5
    val df = CorpusQuality.withGopherStats(
      docs(1L -> good.trim, 2L -> "short doc", 3L -> null), col("text"))
      .withColumn("keep", CorpusQuality.gopherKeep(minWords = 10L))
    val m = df.select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
      .toMap
    assert(m(1L).contains(true))
    assert(m(2L).contains(false))    // below minWords
    assert(m(3L).isEmpty)            // NULL, not a free pass
    // and a filter on the flag drops both the false and the null doc
    assert(df.filter(col("keep")).count() == 1L)
  }

  test("withLineStats: duplicate-line fractions on real newlines") {
    val df = CorpusQuality.withLineStats(
      docs(1L -> "alpha\nbeta\nalpha", 2L -> "\n\n", 3L -> null,
        4L -> "solo"),
      col("text"))
    val m = df.select("doc_id", "n_lines", "n_distinct_lines",
      "dup_line_frac", "dup_line_char_frac")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) == 3L && m(1L).getLong(2) == 2L)
    assert(math.abs(m(1L).getDouble(3) - 1.0 / 3.0) < 1e-15)
    // chars: total 5+4+5=14, first occurrences 5+4=9 -> 5/14 duplicated
    assert(math.abs(m(1L).getDouble(4) - 5.0 / 14.0) < 1e-15)
    // "\n\n" -> three empty lines: line dup is real, char mass is zero
    assert(m(2L).getLong(1) == 3L && m(2L).getLong(2) == 1L)
    assert(math.abs(m(2L).getDouble(3) - 2.0 / 3.0) < 1e-15)
    assert(m(2L).getDouble(4) == 0.0)
    assert(m(3L).isNullAt(1) && m(3L).isNullAt(3) && m(3L).isNullAt(4))
    assert(m(4L).getLong(1) == 1L && m(4L).getDouble(3) == 0.0)
  }

  test("c4CleanLines: min-words and terminal-punctuation rules") {
    val text = "This line has five words.\nshort\nno punct but four words\nOk."
    val base = docs(1L -> text, 2L -> null, 3L -> "")
    val lenient = CorpusQuality.c4CleanLines(base, col("text"), minWords = 3)
      .select("doc_id", "n_lines", "n_lines_kept", "clean_text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(lenient(1L).getLong(1) == 4L && lenient(1L).getLong(2) == 2L)
    assert(lenient(1L).getString(3) ==
      "This line has five words.\nno punct but four words")
    assert(lenient(2L).isNullAt(3))  // NULL text stays NULL
    assert(lenient(3L).getLong(2) == 0L && lenient(3L).getString(3) == "")

    val strict = CorpusQuality.c4CleanLines(base, col("text"), minWords = 3,
      requireTerminalPunct = true)
      .select("doc_id", "clean_text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(strict(1L).getString(1) == "This line has five words.")
  }

  test("c4CleanLines is idempotent on its own output") {
    val base = docs(1L -> "keep me here.\nno\nalso kept line.")
    val once = CorpusQuality.c4CleanLines(base, col("text"), minWords = 3)
      .select(col("doc_id"), col("clean_text").as("text"))
    val twice = CorpusQuality.c4CleanLines(once, col("text"), minWords = 3)
      .select("text", "clean_text").head()
    assert(twice.getString(0) == twice.getString(1))
  }

  test("topNgramCharFrac: dominant bigram coverage, short-doc and null laws") {
    val out = CorpusQuality.topNgramCharFrac(
      docs(1L -> "x y x y x y z", 2L -> "one", 3L -> null),
      col("doc_id"), col("text"), n = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "x y")
    assert(math.abs(out(1L).getDouble(2) - 9.0 / 13.0) < 1e-15) // 3 occ × 3 chars / 13
    assert(out(2L).isNullAt(1) && out(2L).getDouble(2) == 0.0)  // < n tokens
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(2))          // NULL law
  }

  test("dupNgramCharFrac: occurrence-sum with the 1.0 clamp") {
    val out = CorpusQuality.dupNgramCharFrac(
      docs(1L -> "x y x y x y z", 2L -> "a b c"),
      col("doc_id"), col("text"), n = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // "x y"×3 + "y x"×2 cover (3+2)·3 = 15 chars of 13 -> clamps
    assert(out(1L) == 1.0)
    assert(out(2L) == 0.0)                      // all bigrams unique
  }

  test("per-row quality ops lift to Structured Streaming unchanged (stateless)") {
    // the Gopher stats / line stats / C4 cleaner are pure per-row
    // column maps, so the SAME call works on a streaming DataFrame
    // with no state store, watermark, or output-mode constraint —
    // pinned here so a future refactor can't silently add an
    // aggregation that breaks append-mode streaming
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)]
    val streamed = CorpusQuality.c4CleanLines(
      CorpusQuality.withLineStats(
        CorpusQuality.withGopherStats(
          input.toDS().toDF("doc_id", "text"), col("text")),
        col("text")),
      col("text"), minWords = 2)
      .withColumn("keep", CorpusQuality.gopherKeep(minWords = 2L))
    val q = streamed.writeStream
      .format("memory").queryName("cq_stream_out").outputMode("append")
      .start()
    try {
      input.addData((1L, "good line here\nx"), (2L, "tiny"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("cq_stream_out")
      .select("doc_id", "n_words", "n_lines", "clean_text", "keep")
      .collect().map(r => r.getLong(0) -> r).toMap
    // 3 words: the whitespace tokenizer splits on ' ' only, so
    // "here\nx" is one word — the LINE structure is orthogonal
    assert(rows(1L).getLong(1) == 3L && rows(1L).getLong(2) == 2L)
    assert(rows(1L).getString(3) == "good line here")
    assert(rows(1L).getBoolean(4))
    assert(!rows(2L).getBoolean(4))
  }

  test("jsDivergence: identical sources 0, disjoint sources ln 2") {
    val df = Seq(
      ("a", "tok1 tok2 tok2"), ("b", "tok1 tok2 tok2"),
      ("c", "zzz www zzz"), (null: String, "ignored"), ("d", null: String))
      .toDF("source", "text")
    val js = CorpusQuality.jsDivergence(df, col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(math.abs(js(("a", "b"))) < 1e-15)
    assert(math.abs(js(("a", "c")) - math.log(2.0)) < 1e-12)
    // null source and null text rows are excluded, not divergence mass
    assert(!js.keys.exists { case (x, y) => x == null || y == null || x == "d" || y == "d" })
  }

  test("zipfFit: exact power law recovers slope -1; edge laws") {
    // counts 12/6/4/3 = 12/rank exactly -> ln f = ln 12 - 1*ln r:
    // collinear points, OLS must recover the line to float precision
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val df = Seq(
      ("pow", text),
      ("tiny", "solo solo solo"),              // 1 distinct token: drops
      (null: String, "ignored ignored"),       // null group: out
      ("nul", null: String)                    // null text: out
    ).toDF("source", "text")
    val out = CorpusQuality.zipfFit(df, col("source"), col("text"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("pow"))
    assert(out("pow").getLong(1) == 4L)
    assert(math.abs(out("pow").getDouble(2) - (-1.0)) < 1e-12)
    assert(math.abs(out("pow").getDouble(3) - math.log(12.0)) < 1e-12)
  }

  test("heapsFit: brute-force differential on a growing synthetic corpus") {
    // 60 docs, each introducing some new tokens and repeating old ones —
    // a real growth curve, checked against a plain-Scala restatement
    def lcg(x: Long): Long = x * 6364136223846793005L + 1442695040888963407L
    val corpus = (1L to 60L).map { i =>
      val fresh = (0 until (1 + (i % 3)).toInt).map(j => s"w${i}_$j")
      val old = Iterator.iterate(lcg(i))(lcg).take(5)
        .map(h => s"w${math.floorMod(h, i) + 1}_0").toSeq
      (i, (fresh ++ old).mkString(" "))
    }
    val k = 16
    // brute force: same checkpoints, same first-occurrence law
    val toks = corpus.flatMap { case (id, t) => t.split(" ").map((id, _)) }
    val firstDoc = toks.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val m = 60L
    val cps = (1 to k).map(j => math.floor(m.toDouble * j / k).toLong).distinct
    val pts = cps.map { cp =>
      (toks.count(_._1 <= cp).toLong, firstDoc.values.count(_ <= cp).toLong)
    }.filter(p => p._1 > 0 && p._2 > 0).distinct
      .map(p => (math.log(p._1.toDouble), math.log(p._2.toDouble)))
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icpt = (sy - beta * sx) / n
    val out = CorpusQuality.heapsFit(
        corpus.toDF("doc_id", "text"), col("doc_id"), col("text"), k)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == pts.size.toLong)
    assert(math.abs(out.head.getDouble(1) - beta) < 1e-9,
      s"${out.head.getDouble(1)} vs $beta")
    assert(math.abs(out.head.getDouble(2) - icpt) < 1e-9)
    // sanity: a growing corpus sits in the open (0, 1) Heaps band
    assert(beta > 0.0 && beta < 1.0)
  }

  test("heapsFit: degenerate curve (all growth in one prefix) yields no fit row") {
    // all text lives in doc 1; max doc_id 500 puts every checkpoint
    // past it -> one distinct (t, v) point -> no line, NO row (never 0/0)
    val df = Seq((1L, "a b c d e"), (500L, null: String))
      .toDF("doc_id", "text")
    assert(CorpusQuality.heapsFit(df, col("doc_id"), col("text")).count() == 0L)
  }

  test("ksMatrix: every pair equals twoSampleKs on that pair alone, on real documents") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, sf("sf0.001"), "documents")
    val matrix = CorpusQuality.ksMatrix(docs, col("source"), col("n_chars"))
      .as[(String, String, Long, Long, Double, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    val srcs = docs.select("source").distinct().as[String].collect().sorted
    assert(matrix.length === srcs.length * (srcs.length - 1) / 2,
      s"matrix must cover every unordered source pair")
    matrix.foreach { case (a, b, na, nb, num, tick, ks) =>
      val pair = graft.operators.EventAnalytics.twoSampleKs(
          docs.filter(col("source").isin(a, b))
            .withColumn("g", when(col("source") === a, 0L).otherwise(1L)),
          col("g"), col("n_chars"), scale = 1L)
        .as[(Long, Long, Double, Long, Double, Double)].collect().head
      assert((pair._1, pair._2, pair._3, pair._4, pair._5) ===
        ((na, nb, num, tick, ks)), s"pair ($a,$b) diverged from twoSampleKs")
    }
  }

  test("ksMatrix: hand case — identical groups score 0, disjoint score 1") {
    import spark.implicits._
    val df = (Seq.tabulate(4)(i => ("a", (i + 1).toDouble)) ++
      Seq.tabulate(4)(i => ("b", (i + 1).toDouble)) ++
      Seq.tabulate(4)(i => ("c", (i + 100).toDouble)))
      .toDF("g", "v")
    val out = CorpusQuality.ksMatrix(df, col("g"), col("v"), scale = 1L)
      .orderBy("g_a", "g_b")
      .as[(String, String, Long, Long, Double, Long, Double)]
      .collect().toSeq
    assert(out.map(r => (r._1, r._2, r._7)) ===
      Seq(("a", "b", 0.0), ("a", "c", 1.0), ("b", "c", 1.0)))
    // identical groups: num 0 everywhere, tie law → the smallest tick
    assert(out.head._6 === 1L)
  }

  test("zipfFit: rank ties break by token asc; topN cuts the tail") {
    // x:3 y:3 z:3 w:1 -> ranks x=1,y=2,z=3 (tie by token), w=4; topN=3
    // drops w, so the fit sees only the flat head: slope exactly 0
    val df = Seq(("s", Seq.fill(3)(Seq("x", "y", "z")).flatten
      .mkString(" ") + " w")).toDF("source", "text")
    val out = CorpusQuality.zipfFit(df, col("source"), col("text"), topN = 3)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 3L)
    assert(math.abs(out.head.getDouble(2)) < 1e-12)
    assert(math.abs(out.head.getDouble(3) - math.log(3.0)) < 1e-12)
  }
}
