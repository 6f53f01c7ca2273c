package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, TextAnalysis}
import graft.sources.Tables

/** Round-6 corpus operators: hashed decontamination (differential vs
  * the exact string-join form), TF-IDF keyword extraction (hand-checked
  * values + deterministic ranking), and the partitioned-layout
  * round-trip (directory pruning asserted on the plan). */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminateHashed ≡ decontaminate on real documents") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val evalSet = Sampling.hashSample(docs, col("doc_id"), fraction = 0.2)
    val exact = Dedup.decontaminate(docs, evalSet, "doc_id", col("text"))
      .orderBy("doc_id", "eval_id")
      .as[(Long, Long, Long)].collect()
    val hashed = Dedup.decontaminateHashed(docs, evalSet, "doc_id", col("text"))
      .orderBy("doc_id", "eval_id")
      .as[(Long, Long, Long)].collect()
    assert(exact.nonEmpty, "fixture must produce contamination hits")
    assert(hashed.toSeq == exact.toSeq)
  }

  test("excludeSameId=false flags same-id pairs across independent id spaces") {
    // eval and corpus ids COLLIDE (both start at 1) but the datasets
    // are independent: with the default exclusion doc 1's overlap with
    // eval doc 1 would be silently suppressed
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "completely different content sharing nothing with the evals"))
      .toDF("doc_id", "text")
    val evalSet = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"))
      .toDF("doc_id", "text")
    val default = Dedup.decontaminate(docs, evalSet, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect()
    assert(default.isEmpty, "same-id exclusion suppresses the colliding pair")
    val cross = Dedup.decontaminate(docs, evalSet, "doc_id", col("text"),
        excludeSameId = false)
      .as[(Long, Long, Long)].collect()
    assert(cross.map(p => (p._1, p._2)).toSet === Set((1L, 1L)))
    val crossHashed = Dedup.decontaminateHashed(docs, evalSet, "doc_id",
        col("text"), excludeSameId = false)
      .as[(Long, Long, Long)].collect()
    assert(crossHashed.toSeq === cross.toSeq)
  }

  test("decontaminateHashed shuffles fewer bytes than the string join on a long-doc corpus") {
    // The operator's reason to exist is shuffle BYTES, not toy-scale
    // wall-clock: postings ride the exchange as 8-byte hashes instead
    // of word-3-gram strings. Measure both variants' total shuffle
    // writes via task metrics on a corpus with long shingles.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 800).map(i => s"verylongtokenword$i")
    val docs = (0 until 120).map { i =>
      val words = Seq.fill(300)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val evalSet = docs.filter(col("doc_id") < 12)

    def shuffleBytes(run: => Unit): Long = {
      val total = new java.util.concurrent.atomic.AtomicLong
      val seen = new java.util.concurrent.atomic.AtomicLong
      val l = new SparkListener {
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
          seen.incrementAndGet()
          val m = e.taskMetrics
          if (m != null) total.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        run
        // listener bus is async: wait until the task-end count settles
        var last = -1L; var stable = 0
        while (stable < 3) {
          Thread.sleep(200)
          val now = seen.get()
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
      } finally spark.sparkContext.removeSparkListener(l)
      total.get()
    }

    // force the shuffle-join regime the operator exists for (at toy
    // scale AQE broadcasts the eval postings and neither side
    // shuffles for the join; at 100 TB an eval set can exceed any
    // broadcast threshold)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = scala.util.Try(
      spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold"))
      .toOption.filter(_ != null)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val (exactBytes, hashedBytes) =
      try {
        (shuffleBytes {
          Dedup.decontaminate(docs, evalSet, "doc_id", col("text")).count()
        },
        shuffleBytes {
          Dedup.decontaminateHashed(docs, evalSet, "doc_id", col("text")).count()
        })
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        prevAqe match {
          case Some(v) =>
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
          case None =>
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        }
      }
    assert(hashedBytes < exactBytes,
      s"hashed variant must shuffle fewer bytes: hashed=$hashedBytes exact=$exactBytes")
    info(f"shuffle bytes: exact=$exactBytes%,d hashed=$hashedBytes%,d " +
      f"(${100.0 * hashedBytes / exactBytes}%.0f%% of exact)")
  }

  test("decontaminateHashed: empty eval set → empty result") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val empty = docs.filter(lit(false))
    assert(Dedup.decontaminateHashed(docs, empty, "doc_id", col("text")).count() == 0)
  }

  test("topTfIdfTerms: hand-computed scores, smoothed idf, k cap") {
    // 3 docs; "common" appears in all → idf = ln(4/4) = 0
    val docs = Seq(
      (1L, "apple apple common banana"),
      (2L, "banana common"),
      (3L, "cherry common")).toDF("id", "text")
    val got = TextAnalysis.topTfIdfTerms(docs, col("id"), col("text"), k = 2)
      .orderBy("doc_id", "term")
      .as[(Long, String, Long, Double)].collect().toSeq
    def s(tf: Long, df: Long): Double = {
      val raw = tf * math.log(4.0 / (1.0 + df))
      math.floor(raw * 10000 + 0.5) / 10000
    }
    // doc1: apple tf=2 df=1 beats banana tf=1 df=2; common (idf=0) never ranks
    assert(got.filter(_._1 == 1L).map(r => (r._2, r._3, r._4)).toSet ==
      Set(("apple", 2L, s(2, 1)), ("banana", 1L, s(1, 2))))
    // doc2: only banana + common exist; k=2 returns both, common scored 0
    assert(got.filter(_._1 == 2L).map(r => (r._2, r._4)).toSet ==
      Set(("banana", s(1, 2)), ("common", 0.0)))
    assert(got.groupBy(_._1).forall(_._2.size <= 2))
  }

  test("topTfIdfTerms: equal scores tie-break by term ascending") {
    // two docs so nothing is corpus-universal; in doc 1, b/c/d all have
    // tf=1, df=1 → identical scores; k=2 must keep b and c, drop d
    val docs = Seq((1L, "b c d"), (2L, "x y z")).toDF("id", "text")
    val got = TextAnalysis.topTfIdfTerms(docs, col("id"), col("text"), k = 2)
      .filter(col("doc_id") === 1L).select("term")
      .as[String].collect().sorted.toSeq
    assert(got == Seq("b", "c"))
  }

  test("partitioned layout: read-back values survive and pruning reaches the scan") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout_spec_")
    try {
      graft.sources.Sinks.writeParquet(docs, tmp.toString,
        partitionBy = Seq("lang"))
      val rb = spark.read.parquet(tmp.toString).filter(col("lang") === "en")
        .select("doc_id", "lang", "n_chars")
      val plan = rb.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("lang"),
        s"lang filter must prune directories, not scan rows:\n$plan")
      val expected = docs.filter(col("lang") === "en")
        .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
      val got = rb.orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
      assert(expected.nonEmpty && got == expected)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("contaminationScore: hand-computed fractions; no-shingle docs drop") {
    // c1 shares 1 of its 2 shingles with the eval set; c2 shares none;
    // c3 is too short to shingle and must be absent.
    val corpus = Seq(
      (1L, "x y z w"),        // shingles {x y z, y z w}
      (2L, "p q r s"),        // shingles {p q r, q r s}
      (3L, "a b")             // no 3-gram shingles
    ).toDF("doc_id", "text")
    val evalSet = Seq((10L, "x y z q")).toDF("doc_id", "text")
    val got = Dedup.contaminationScore(corpus, evalSet, "doc_id", col("text"))
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_hit", "contamination")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 0L, 0.0)))
  }

  test("contaminationScore ≡ 1.0 for an eval doc scored against itself") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val evalSet = Sampling.hashSample(docs, col("doc_id"), fraction = 0.1)
    val scored = Dedup.contaminationScore(docs, evalSet, "doc_id", col("text"))
    val evalScores = scored.join(evalSet.select("doc_id"), "doc_id")
      .select("contamination").as[Double].collect()
    assert(evalScores.nonEmpty && evalScores.forall(_ == 1.0),
      "every eval doc's own shingles are all in the eval set")
  }

  test("tokenPmi: hand-computed PMI; within-doc repeats count once") {
    // N=3. a,b co-occur in 2 docs (df_a=2, df_b=2); c,d in 1 (df 1,1).
    // pmi(a,b) = ln(2·3/(2·2)) = ln 1.5 ; pmi(c,d) = ln(1·3/1) = ln 3.
    val docs = Seq(
      (1L, "a a b"),          // repeated 'a' counts once
      (2L, "b a"),
      (3L, "c d")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenPmi(docs, col("doc_id"), col("text"),
        minPairDocs = 1L)
      .orderBy("term_a", "term_b")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Seq(("a", "b", 2L), ("c", "d", 1L)))
    assert(math.abs(got(0)._4 - math.log(1.5)) < 1e-12)
    assert(math.abs(got(1)._4 - math.log(3.0)) < 1e-12)
  }

  test("quantileGate: per-stratum cut at percent_rank ≤ keepFrac, inclusive") {
    // Group A: 6 rows, keepFrac .2 → pct = (rank−1)/5 keeps ranks 1
    // (0.0) and 2 (0.2, boundary INCLUSIVE); group B: 1 row → pct 0.
    val df = (Seq((1L, "A", 60.0), (2L, "A", 50.0), (3L, "A", 40.0),
      (4L, "A", 30.0), (5L, "A", 20.0), (6L, "A", 10.0),
      (7L, "B", 1.0))).toDF("id", "g", "score")
    val kept = TextAnalysis.quantileGate(df, col("g"), col("score"),
        col("id"), keepFrac = 0.2)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 7L))
  }

  test("quantileGate: score ties break on the tie-break column") {
    val df = Seq((1L, "A", 5.0), (2L, "A", 5.0), (3L, "A", 5.0),
      (4L, "A", 5.0), (5L, "A", 5.0), (6L, "A", 5.0))
      .toDF("id", "g", "score")
    // All-equal scores: rank order is the tie-break (id), so the 20%
    // cut keeps exactly ids 1 and 2 — deterministically.
    val kept = TextAnalysis.quantileGate(df, col("g"), col("score"),
        col("id"), keepFrac = 0.2)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("tokenPmi: one corpus pass, no postings self-join") {
    // The operator's scale claims, read off the plan: (1) every join
    // above the barrier is vocabulary-sized — exactly 3 (df_a, df_b,
    // and the 1-row N cross join); a postings self-join would add a
    // fourth. (2) The corpus appears NOWHERE in the final plan — all
    // corpus work (marker+term+pair generation and the single count
    // aggregate) sits below ONE checkpoint barrier, so the corpus is
    // scanned once however many slices consume the counts table
    // (the naive three-consumer form measurably planned three
    // scan+tokenize stacks).
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val plan = TextAnalysis.tokenPmi(docs, col("doc_id"), col("text"),
        minPairDocs = 50L)
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.length == 3,
      s"expected exactly the 2 df lookups + 1-row N join, got " +
        s"${joins.length}:\n$plan")
    val relations = plan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r }
    assert(relations.isEmpty,
      s"corpus scan leaked above the counts barrier:\n$plan")
  }

  test("pruneFrequentNgrams: hand-built corpus, overlap union, full wipe") {
    // "a b c" lives in d0,d1,d2 and "b c d" in d0,d3,d4 — both hit
    // minDocs=3. d0 "a b c d" is covered by the UNION of both windows
    // (positions 0..3) and reconstructs to the empty string; the other
    // docs lose exactly their one trigram window; d5 is clean and d6 is
    // too short to have trigrams at all.
    val docs = Seq(
      0L -> "a b c d", 1L -> "a b c x", 2L -> "y a b c",
      3L -> "b c d x", 4L -> "y b c d", 5L -> "p q r s t",
      6L -> "a b").toDF("doc_id", "text")
    val out = TextAnalysis.pruneFrequentNgrams(
        docs, col("doc_id"), col("text"), n = 3, minDocs = 3L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out === Array(
      (0L, 4L, 4L, ""), (1L, 4L, 3L, "x"), (2L, 4L, 3L, "y"),
      (3L, 4L, 3L, "x"), (4L, 4L, 3L, "y"), (5L, 5L, 0L, "p q r s t"),
      (6L, 2L, 0L, "a b")))
  }

  test("pruneFrequentNgrams: only vocab-sized joins above the frequent-set barrier") {
    // Plan law: the frequent set is checkpointed, so the final plan
    // holds exactly 2 joins — the posting semi-join against it and the
    // covered-starts left join back onto the token table. A (doc,gram)
    // dedup self-join or a third corpus consumer would add more.
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val plan = TextAnalysis.pruneFrequentNgrams(
        docs, col("doc_id"), col("text"), n = 3, minDocs = 5L)
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.length == 2,
      s"expected the frequent-set semi-join + starts left join, got " +
        s"${joins.length}:\n$plan")
  }

  test("bigram merge mining plans as a bounded-heap cut, never a global sort") {
    import graft.functions.GraftFunctions
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val df = docs
      .select(explode(GraftFunctions.positionedShingles(
        GraftFunctions.tokens(col("text")), 2)).as("p"))
      .groupBy(col("p.ng").as("pair")).agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("pair")).limit(25)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      s"expected the sort-limit to plan as TakeOrderedAndProject:\n$phys")
  }

  test("epochShuffle: dense per-shard positions, layout-independent, epoch-sensitive") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"))
    val e0 = Sampling.epochShuffle(docs, col("doc_id"), "epoch-0", 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // every shard's positions are exactly 1..count (a true permutation)
    e0.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq) }
    assert(e0.map(_._2).distinct.forall(s => s >= 0 && s < 8))
    // identical assignment after a physical re-layout
    val relaid = Sampling.epochShuffle(docs.repartition(7), col("doc_id"),
        "epoch-0", 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(relaid.toSeq == e0.toSeq)
    // a new epoch seed is a different permutation of the same rows
    val e1 = Sampling.epochShuffle(docs, col("doc_id"), "epoch-1", 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(e1.map(_._1).toSeq == e0.map(_._1).toSeq)
    assert(e1.toSeq != e0.toSeq)
  }

  test("source overlap: hash-granularity counts (q124's exact side) == string counts (q107)") {
    import graft.functions.GraftFunctions.{polyHash, shingles, tokens}
    val docs = Tables.documents(spark, sf("sf0.001"))
    // string-level: distinct (source, shingle) pairs, shared per pair
    val byString = docs
      .select(col("source"), explode(shingles(tokens(col("text")), 3)).as("ng"))
      .distinct().alias("a")
      .join(docs
        .select(col("source"), explode(shingles(tokens(col("text")), 3)).as("ng"))
        .distinct().alias("b"),
        col("a.ng") === col("b.ng") && col("a.source") < col("b.source"))
      .groupBy(col("a.source"), col("b.source")).count()
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // hash-level: the exact side q124 actually joins on
    def hashed = docs
      .select(col("source"), explode(shingles(tokens(col("text")), 3)).as("ng"))
      .select(col("source"), polyHash(col("ng")).as("h")).distinct()
    val byHash = hashed.alias("a")
      .join(hashed.alias("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source"), col("b.source")).count()
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(byString.nonEmpty)
    assert(byHash === byString,
      "hash-granularity intersection must be collision-free on this corpus")
  }
}
