package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunking, TextAnalysis}

/** Chunking, packing, and PII redaction — the corpus → training-
  * sequence transforms. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunk: 100 tokens at 50/overlap 10 → 3 chunks of 50/50/20, overlap preserved") {
    val words = (1 to 100).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val chunks = Chunking.chunk(df, col("text"), chunkTokens = 50, overlap = 10)
      .select("chunk_idx", "chunk_tokens", "chunk_text")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(chunks.map(c => (c._1, c._2)).toSeq === Seq((0L, 50L), (1L, 50L), (2L, 20L)))
    // chunk 1 starts at token 41 → its first 10 tokens are chunk 0's last 10
    val c0 = chunks(0)._3.split(" ")
    val c1 = chunks(1)._3.split(" ")
    assert(c1.take(10).toSeq === c0.takeRight(10).toSeq)
    assert(c1.head === "w41")
    assert(chunks(2)._3.split(" ").last === "w100")
  }

  test("chunk: the walk stops once a chunk reaches the end — no suffix duplicates") {
    // 10 tokens at 4/overlap 2 (step 2): starts 0,2,4,6 — the start-8
    // chunk [w9 w10] would be a strict suffix of [w7..w10] (the naive
    // (n-1)/step bound emitted it, double-counting the tail)
    val words = (1 to 10).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val chunks = Chunking.chunk(df, col("text"), chunkTokens = 4, overlap = 2)
      .select("chunk_idx", "chunk_text").as[(Long, String)].collect().sortBy(_._1)
    assert(chunks.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(chunks.last._2 === "w7 w8 w9 w10")
    // every token still covered exactly (union of chunks = the doc)
    assert(chunks.flatMap(_._2.split(" ")).distinct.sorted.toSeq ===
      words.sorted)
  }

  test("chunk: shorter than one chunk → single partial chunk") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val chunks = Chunking.chunk(df, col("text"), chunkTokens = 50, overlap = 10)
      .select("chunk_idx", "chunk_tokens").as[(Long, Long)].collect()
    assert(chunks.toSeq === Seq((0L, 3L)))
  }

  test("packSequential: bins cut at the budget, chunk belongs where it starts") {
    val chunks = Seq(
      (0L, 0L, 300L), (0L, 1L, 300L),   // second straddles 512 → starts in bin 0
      (1L, 0L, 500L),                   // starts at 600 → bin 1
      (2L, 0L, 100L)                    // starts at 1100 → bin 2
    ).toDF("doc_id", "chunk_idx", "n")
      .withColumn("shard", lit(0L))
    val packed = Chunking.packSequential(chunks, col("n"), budget = 512,
        order = Seq(col("doc_id"), col("chunk_idx")), shard = Seq(col("shard")))
      .select("doc_id", "chunk_idx", "bin_id").as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(packed((0L, 0L)) === 0L)
    assert(packed((0L, 1L)) === 0L)     // cum−n = 300 → bin 0 (straddles)
    assert(packed((1L, 0L)) === 1L)     // cum−n = 600
    assert(packed((2L, 0L)) === 2L)     // cum−n = 1100
  }

  test("packSequential: unsharded call refuses unless explicitly allowed") {
    val chunks = Seq((0L, 0L, 600L), (1L, 0L, 300L)).toDF("doc_id", "chunk_idx", "n")
    // the global single-partition window is banned by default (SCALE.md)
    intercept[IllegalArgumentException] {
      Chunking.packSequential(chunks, col("n"), budget = 512,
        order = Seq(col("doc_id"), col("chunk_idx")))
    }
    // explicit opt-in still packs (small/single-shard jobs)
    val global = Chunking.packSequential(chunks, col("n"), budget = 512,
        order = Seq(col("doc_id"), col("chunk_idx")), allowGlobal = true)
      .select("doc_id", "bin_id").as[(Long, Long)].collect().toMap
    assert(global === Map(0L -> 0L, 1L -> 1L))
  }

  test("hash sampling: deterministic, partitioning-independent, stratified rates honored") {
    import graft.operators.Sampling
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("lang"))
    val s1 = Sampling.hashSample(docs, col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    // identical selection after a different physical layout
    val s2 = Sampling.hashSample(docs.repartition(7), col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2 && s1.nonEmpty)
    // roughly the requested fraction
    val total = docs.count().toDouble
    assert(math.abs(s1.size / total - 0.2) < 0.1)
    // stratified: fr fully kept, unlisted langs fully dropped
    val strat = Sampling.stratifiedHashSample(docs, col("doc_id"), col("lang"),
        Map("fr" -> 1.0, "de" -> 0.0))
      .select("lang").distinct().as[String].collect().toSet
    assert(strat === Set("fr"))
    // split column partitions the sample, deterministically
    val split = Sampling.withSplit(docs, col("doc_id"), 0.6)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(split.keySet === Set("train", "test"))
    assert(split("train") > split("test"))
  }

  test("seeded split: disjoint+exhaustive, layout-stable, seed gives an independent split") {
    import graft.operators.Sampling
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"))
    val w = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val a = Sampling.seededSplit(docs, col("doc_id"), "s1", w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // exhaustive (every doc assigned) and only the declared splits appear
    assert(a.size === docs.count())
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(a.values.toSet.contains("train"))
    // identical assignment after a different physical layout
    val b = Sampling.seededSplit(docs.repartition(7), col("doc_id"), "s1", w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(b === a)
    // a different seed reassigns SOME rows (independent split), but the
    // weights still roughly hold
    val c = Sampling.seededSplit(docs, col("doc_id"), "s2", w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(c.exists { case (k, v) => a(k) != v })
    val trainFrac = c.values.count(_ == "train").toDouble / c.size
    assert(math.abs(trainFrac - 0.8) < 0.1, s"train fraction $trainFrac")
    // invalid weights refuse loudly
    intercept[IllegalArgumentException] {
      Sampling.seededSplit(docs, col("doc_id"), "s1", Seq(("a", 0.5), ("b", 0.4)))
    }
  }

  test("redact: emails, IPv4, and phone numbers become typed placeholders") {
    val out = Seq("mail a.b+c@ex-ample.co.uk from 10.0.0.1 or call 555-123-4567 ok")
      .toDF("t").select(TextAnalysis.redact(col("t"))).as[String].collect().head
    assert(out === "mail <EMAIL> from <IP> or call <PHONE> ok")
    // non-PII text passes through untouched (incl. decimals that look IP-ish)
    val clean = Seq("version 1.2 costs 3.50 at example.com shop")
      .toDF("t").select(TextAnalysis.redact(col("t"))).as[String].collect().head
    assert(clean === "version 1.2 costs 3.50 at example.com shop")
  }
}
