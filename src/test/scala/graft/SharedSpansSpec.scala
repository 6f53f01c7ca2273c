package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** [[graft.operators.TextAnalysis.sharedSpans]] — cross-document
  * repeated-substring detection: maximal-span chaining, gram-overlap
  * text reconstruction, the distinct-docs (not occurrences) document
  * frequency, and the null/short-doc edge laws. */
class SharedSpansSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], n: Int, minDocs: Long = 2L,
                    minSpanTokens: Int = 0): Seq[(Long, Long, Long, Long, String)] =
    TextAnalysis.sharedSpans(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        n = n, minDocs = minDocs, minSpanTokens = minSpanTokens)
      .orderBy(col("doc_id"), col("start_pos"))
      .as[(Long, Long, Long, Long, String)].collect().toSeq

  test("a duplicated 10-token run chains 8 shared 3-grams into ONE maximal span, text reconstructed") {
    val shared = "a b c d e f g h i j"
    val out = spans(Seq(
      1L -> shared,
      2L -> s"x0 x1 $shared y0",
      3L -> "completely unrelated words here"), n = 3)
    assert(out === Seq(
      (1L, 0L, 10L, 8L, shared),
      (2L, 2L, 10L, 8L, shared)))
  }

  test("a gap splits the chain: two maximal spans per doc, and minSpanTokens prunes") {
    val out = spans(Seq(
      1L -> "p q r ZZ s t u v",
      2L -> "p q r WW s t u v"), n = 3)
    assert(out === Seq(
      (1L, 0L, 3L, 1L, "p q r"), (1L, 4L, 4L, 2L, "s t u v"),
      (2L, 0L, 3L, 1L, "p q r"), (2L, 4L, 4L, 2L, "s t u v")))
    val pruned = spans(Seq(
      1L -> "p q r ZZ s t u v",
      2L -> "p q r WW s t u v"), n = 3, minSpanTokens = 4)
    assert(pruned.map(_._2) === Seq(4L, 4L))
  }

  test("WITHIN-doc repetition alone is not cross-document duplication") {
    // the phrase repeats twice inside doc 1 but appears in no other
    // doc; shingles() is distinct-per-doc so its df stays 1
    val out = spans(Seq(
      1L -> "dup dup dup tail dup dup dup",
      2L -> "nothing in common at all"), n = 3)
    assert(out.isEmpty)
  }

  test("occurrence positions in the SAME doc both report when another doc shares the gram") {
    val out = spans(Seq(
      1L -> "m n o xx m n o",
      2L -> "m n o elsewhere"), n = 3)
    // doc 1 carries the shared gram at 0 AND 4 (two islands); doc 2 at 0
    assert(out === Seq(
      (1L, 0L, 3L, 1L, "m n o"), (1L, 4L, 3L, 1L, "m n o"),
      (2L, 0L, 3L, 1L, "m n o")))
  }

  test("null text and sub-n docs emit nothing and break nothing") {
    val out = spans(Seq(
      1L -> "a b c d",
      2L -> "a b c d",
      3L -> null.asInstanceOf[String],
      4L -> "a b"), n = 3)
    assert(out === Seq(
      (1L, 0L, 4L, 2L, "a b c d"),
      (2L, 0L, 4L, 2L, "a b c d")))
  }

  test("minDocs above the sharing count suppresses the span") {
    val docs = Seq(1L -> "s h a r e d r u n", 2L -> "s h a r e d r u n")
    assert(spans(docs, n = 3, minDocs = 3L).isEmpty)
    assert(spans(docs, n = 3, minDocs = 2L).nonEmpty)
  }

  private def scrub(docs: Seq[(Long, String)], n: Int,
                    minSpanTokens: Int = 0): Seq[(Long, Option[Long], Option[Long], Option[String])] =
    TextAnalysis.scrubSharedSpans(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        n = n, minDocs = 2L, minSpanTokens = minSpanTokens)
      .orderBy(col("doc_id"))
      .as[(Long, Option[Long], Option[Long], Option[String])].collect().toSeq

  test("scrub cuts every detected span everywhere; untouched docs pass through whole") {
    val out = scrub(Seq(
      1L -> "x0 a b c d y0",
      2L -> "x1 a b c d y1",
      3L -> "nothing shared here at all"), n = 3)
    assert(out === Seq(
      (1L, Some(6L), Some(4L), Some("x0 y0")),
      (2L, Some(6L), Some(4L), Some("x1 y1")),
      (3L, Some(5L), Some(0L), Some("nothing shared here at all"))))
  }

  test("scrub: full-coverage doc empties to ''; NULL text stays NULL (the q103 law)") {
    val out = scrub(Seq(
      1L -> "a b c d",
      2L -> "a b c d",
      3L -> null.asInstanceOf[String]), n = 3)
    assert(out === Seq(
      (1L, Some(4L), Some(4L), Some("")),
      (2L, Some(4L), Some(4L), Some("")),
      (3L, None, None, None)))
  }

  test("scrub honors minSpanTokens: short shared spans survive") {
    val docs = Seq(1L -> "p q r tail1", 2L -> "p q r tail2")
    val out = scrub(docs, n = 3, minSpanTokens = 5)
    assert(out.map(_._3) === Seq(Some(0L), Some(0L)))
    val cut = scrub(docs, n = 3, minSpanTokens = 3)
    assert(cut.map(_._3) === Seq(Some(3L), Some(3L)))
  }
}
