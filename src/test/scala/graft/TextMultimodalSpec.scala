package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, TextAnalysis}
import graft.functions.GraftFunctions

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("H multimodal: frame sampling slices, steps, and keeps the partial tail") {
    // 600-byte payload, 256-byte frames → frames 0,1,2 (88-byte tail);
    // everyN=2 keeps frames 0 and 2
    val df = Multimodal.withPayload(
      Seq((1L, "ab" * 300)).toDF("doc_id", "text"), "text")
    val frames = Multimodal.frameSample(df, frameBytes = 256, everyN = 2)
      .select("frame_idx", "frame_len").as[(Long, Long)].collect().sortBy(_._1)
    assert(frames.toSeq === Seq((0L, 256L), (2L, 88L)))
    // frame content is the right byte window
    val f2 = Multimodal.frameSample(df, 256, 2)
      .filter(col("frame_idx") === 2)
      .select(col("frame").cast("string")).as[String].collect().head
    assert(f2 === "ab" * 44)
    // empty payload → no frames
    val none = Multimodal.frameSample(
      Multimodal.withPayload(Seq((2L, "")).toDF("doc_id", "text"), "text"),
      256, 2)
    assert(none.count() === 0L)
  }

  test("H multimodal: frame dup census — exact copies share every frame, minDocs raises the bar") {
    // docs 1 and 2 are byte-identical (every frame shared), doc 3 is
    // unique except its FIRST frame, which it shares with 1 and 2
    val common = "xy" * 128                    // one full 256-byte frame
    val df = Multimodal.withPayload(Seq(
      (1L, common + "aa" * 128), (2L, common + "aa" * 128),
      (3L, common + "zz" * 128)).toDF("doc_id", "text"), "text")
    val frames = Multimodal.frameSample(df, frameBytes = 256, everyN = 1)
    val out = Multimodal.frameDupStats(frames)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 2L, 2L, 1.0), (2L, 2L, 2L, 1.0),
      (3L, 2L, 1L, 0.5)))
    // minDocs = 2: a frame must appear in MORE than 2 docs to count —
    // only the common first frame (3 docs) survives
    val strict = Multimodal.frameDupStats(frames, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(strict === Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5),
      (3L, 2L, 1L, 0.5)))
  }

  test("H4 text stats: counts and ratios") {
    val df = Seq((1L, "the cat and the hat is a cat")).toDF("id", "text")
    val row = TextAnalysis.withTextStats(df, col("text")).collect().head
    assert(row.getAs[Long]("n_tokens") === 8L)
    assert(row.getAs[Long]("n_distinct_tokens") === 6L)
    assert(row.getAs[Long]("n_stopwords") === 5L)   // the ×2, and, is, a
    assert(row.getAs[Double]("ttr") === 6.0 / 8.0)
  }

  test("H4 entropy: hand-computed H, evenness laws, NULL text drops") {
    val docs = Seq(
      (1L, "a a b b"),        // H = 2 − (2·1+2·1)/4 = 1; norm = 1/log2(2) = 1
      (2L, "a b c d"),        // uniform distinct: H = 2, norm = 2/log2(4) = 1
      (3L, "a a a a"),        // single token type: H = 0, norm NULL (0/0 law)
      (4L, "a a a b"),        // H = 2 − 3·log2(3)/4 ≈ 0.811278; norm = H
      (5L, null.asInstanceOf[String])) // NULL text → no row
      .toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(docs, col("doc_id"), col("text"))
      .orderBy("id")
      .select("id", "n_tokens", "n_distinct", "entropy", "norm_entropy")
      .as[(Long, Long, Long, Double, Option[Double])].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L, 3L, 4L))
    assert(out.map(r => (r._2, r._3)) ===
      Seq((4L, 2L), (4L, 4L), (4L, 1L), (4L, 2L)))
    def near(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(near(out(0)._4, 1.0) && out(0)._5.exists(near(_, 1.0)))
    assert(near(out(1)._4, 2.0) && out(1)._5.exists(near(_, 1.0)))
    assert(out(2)._4 === 0.0 && out(2)._5.isEmpty)
    val h4 = 2.0 - 3.0 * (math.log(3.0) / math.log(2.0)) / 4.0
    assert(near(out(3)._4, h4) && out(3)._5.exists(near(_, h4)))
  }

  test("H4 keyness: overrepresentation direction, minCount, rank order, NULL source") {
    // source A: 6 "spam" + 2 "the"; source B: 2 "spam" + 6 "the";
    // NULL source: 4 "odd" — its own group
    val docs = Seq(
      (1L, Some("a"), "spam spam spam spam spam spam the the"),
      (2L, Some("b"), "spam spam the the the the the the"),
      (3L, Option.empty[String], "odd odd odd odd"))
      .toDF("doc_id", "source", "text")
    val out = graft.operators.TextAnalysis.sourceKeyness(
        docs, col("source"), col("text"), minCount = 2L, topN = 5)
      .orderBy(asc_nulls_last("source"), col("rank"))
      .select("source", "token", "n", "rank")
      .as[(Option[String], String, Long, Long)].collect().toSeq
    // corpus: spam=8 the=8 odd=4, N=20; cg(a)=8 cg(b)=8 cg(null)=4
    // a: spam 6/8 vs 8/20 → over; the 2 under. b: the 6 over; spam under.
    // null: odd 4·20 > 4·4 → over.
    assert(out === Seq(
      (Some("a"), "spam", 6L, 1L),
      (Some("b"), "the", 6L, 1L),
      (None, "odd", 4L, 1L)))
    // minCount excludes a 1-occurrence token even when overrepresented
    val rare = graft.operators.TextAnalysis.sourceKeyness(
        Seq((1L, "a", "rare x x x x"), (2L, "b", "x x x x x")).toDF(
          "doc_id", "source", "text"),
        col("source"), col("text"), minCount = 2L, topN = 5)
      .select("token").as[String].collect().toSeq
    assert(!rare.contains("rare"))
  }

  test("H4 repetition: duplicate 2-gram fraction; short docs score 0") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),     // 4 bigrams, 1 distinct → 0.75
      (2L, "all words here are different"), // 4 bigrams, 4 distinct → 0.0
      (3L, "one")                           // no bigrams → 0.0 (not NaN/null)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.withRepetition(docs, col("text"), n = 2)
      .select("doc_id", "n_grams", "n_distinct_grams", "rep_ratio")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 4L, 1L, 0.75)))
    assert(got(2L) === ((2L, 4L, 4L, 0.0)))
    assert(got(3L) === ((3L, 0L, 0L, 0.0)))
  }

  test("H4 langid: marker-word argmax with tie order") {
    val df = Seq(
      (1L, "the cat of a dog and the bird"),
      (2L, "la casa de el perro y la en"),
      (3L, "der hund und die katze ist das")).toDF("id", "text")
    val out = df.withColumn("pred", TextAnalysis.langId(col("text")))
      .select("id", "pred").as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(2L) === "es")
    assert(out(3L) === "de")
  }

  test("H4 unigram LM: corpus-trained smoothed log-probs match hand computation") {
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(df, col("doc_id"), col("text"))
      .select("doc_id", "n_tokens", "avg_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // counts: a=2, b=2, c=1; T=5, V=3; lp(t) = ln((c+1)/(5+3))
    val lpA = math.log(3.0 / 8.0); val lpB = lpA; val lpC = math.log(2.0 / 8.0)
    assert(got(1L)._1 === 3L)
    assert(math.abs(got(1L)._2 - (lpA + lpA + lpB) / 3.0) < 1e-12)
    assert(got(2L)._1 === 2L)
    assert(math.abs(got(2L)._2 - (lpB + lpC) / 2.0) < 1e-12)
    // rarer tokens score lower: doc 2 (contains the hapax) below doc 1
    assert(got(2L)._2 < got(1L)._2)
  }

  test("H4 fingerprints: deterministic, dup-sensitive") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d f"))
      .toDF("id", "text")
    val fp = TextAnalysis.withFingerprints(df, col("text"))
      .select("id", "fingerprint", "min_shingle_fp")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("H4 polyhash matches the documented 31-polynomial") {
    val got = Seq("hello").toDF("s")
      .select(GraftFunctions.polyHash(col("s"))).as[Long].collect().head
    // h("hello") = fold(0, c => 31h+c) mod 1e9+7
    val expected = "hello".foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    assert(got === expected)
  }

  test("multimodal: partition-batched resize decimates deterministically") {
    val docs = Seq(
      (1L, "x" * 1000),   // 1000 bytes → decimated to 256
      (2L, "short"),      // 5 bytes ≤ 256 → passes through whole
      (3L, "")            // empty stays empty
    ).toDF("doc_id", "text")
    val out = Multimodal.resize(Multimodal.withPayload(docs, "text"), targetW = 16, targetH = 16)
      .select("doc_id", "src_len", "resized_len", "resized_md5")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 1000L && out(1L)._3 === 256L)
    assert(out(2L)._2 === 5L && out(2L)._3 === 5L)
    assert(out(3L)._3 === 0L)
    // deterministic: same payload → same digest on every run
    val again = Multimodal.resize(Multimodal.withPayload(docs, "text"), 16, 16)
      .select("doc_id", "resized_md5").as[(Long, String)].collect().toMap
    assert(again === out.view.mapValues(_._4).toMap)
  }

  test("multimodal: payload metadata + stubbed partition-batched decode") {
    val df = Seq((1L, "some media payload"), (2L, "")).toDF("doc_id", "text")
    val meta = Multimodal.withPayloadMeta(Multimodal.withPayload(df, "text"))
      .select("doc_id", "byte_len", "fake_width").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(meta(1L)._1 === "some media payload".getBytes("UTF-8").length.toLong)
    assert(meta(1L)._2 >= 64L)
    val decoded = Multimodal.decodeFeatures(Multimodal.withPayload(df, "text")).collect()
    assert(decoded.length === 2)
    val r1 = decoded.find(_.getLong(0) == 1L).get
    assert(r1.getLong(1) === "some media payload".getBytes("UTF-8").length.toLong)
    assert(r1.getDouble(2) > 0.0)
    assert(r1.getAs[Seq[Float]]("feature").length === 8)
    assert(!r1.getAs[Boolean]("is_image")) // text payload → stub path
    val r2 = decoded.find(_.getLong(0) == 2L).get
    assert(r2.getDouble(2) === 0.0)
  }
}
