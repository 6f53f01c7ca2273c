package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Document chunking and sequence packing — the two transforms that
  * turn a curated corpus into model-ready training sequences
  * (`SURVEY.md` §2 H4 extension).
  *
  * Both are oracle-reproducible column/window expressions:
  * [[chunk]] is an embarrassingly-parallel per-row explode (pipelines
  * behind the scan, zero shuffles), [[packSequential]] is one window
  * pass over a deterministic global order (a single range exchange —
  * the unavoidable cost of a reproducible packing; at 100 TB you pack
  * within partition-sized shards instead by adding the shard key to
  * the ordering's partitionBy).
  */
object Chunking {

  /** Split each document into token-window chunks of `chunkTokens`
    * tokens advancing by `chunkTokens − overlap` (overlapping context
    * windows, the standard pretraining shape). The trailing partial
    * chunk is kept; the walk stops at the FIRST chunk that reaches the
    * document's end — a further start would be a strict suffix of the
    * previous chunk (pure tail duplication: with overlap o, the naive
    * "any start below the token count" bound re-emits up to o trailing
    * tokens as bogus extra chunks). Last useful start index:
    * ceil((n − chunkTokens) / step), clamped at 0. Adds (chunk_idx,
    * chunk_text, chunk_tokens); one output row per chunk. */
  def chunk(df: DataFrame, text: Column, chunkTokens: Int,
            overlap: Int = 0): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"need chunkTokens ($chunkTokens) > overlap ($overlap) >= 0 " +
        "or the chunk walk cannot advance")
    val step = chunkTokens - overlap
    val toks = tokens(text)
    df.withColumn("_toks", toks)
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          greatest(longDiv(size(col("_toks")) - chunkTokens + (step - 1),
            step.toLong), lit(0L)).cast("int"))))
      .withColumn("chunk_toks",
        slice(col("_toks"), col("chunk_idx") * step + 1, lit(chunkTokens)))
      .filter(size(col("chunk_toks")) > 0)
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
      .withColumn("chunk_text", concat_ws(" ", col("chunk_toks")))
      .withColumn("chunk_tokens", size(col("chunk_toks")).cast("long"))
      .drop("_toks", "chunk_toks")
  }

  /** Sequence packing, concat-and-cut style: order the chunks by
    * `order` (within each `shard`, when given), run a cumulative token
    * count, and cut bins every `budget` tokens — bin id =
    * floor((cumsum − n) / budget), i.e. a chunk belongs to the bin its
    * FIRST token lands in (chunks may straddle a boundary, exactly
    * like context-window packing of a concatenated corpus).
    * Deterministic given a total `order` per shard.
    *
    * ALWAYS pass a `shard` at scale: an empty shard means one global
    * cumulative sum — a single-partition window, the one plan shape
    * the engine otherwise bans (SCALE.md rule 2). Sharding keeps the
    * window hash-partitioned; bins are then (shard, bin_id) pairs.
    * The contract is enforced: an empty `shard` THROWS unless the
    * caller opts in with `allowGlobal = true` (small corpora /
    * single-shard jobs where a global packing is the explicit intent). */
  def packSequential(chunks: DataFrame, nTokens: Column, budget: Long,
                     order: Seq[Column], shard: Seq[Column] = Nil,
                     allowGlobal: Boolean = false): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(shard.nonEmpty || allowGlobal,
      "packSequential with no shard runs ONE global single-partition " +
        "window — banned at scale (SCALE.md rule 2). Pass a shard key, " +
        "or opt in explicitly with allowGlobal = true.")
    val w = (if (shard.isEmpty) Window.orderBy(order: _*)
             else Window.partitionBy(shard: _*).orderBy(order: _*))
      .rowsBetween(Window.unboundedPreceding, 0)
    chunks
      .withColumn("_cum", sum(nTokens).over(w))
      .withColumn("bin_id", longDiv(col("_cum") - nTokens, budget))
      .drop("_cum")
  }

  /** Per-bin summary of a packed corpus (bin sizes and fill levels —
    * the sanity numbers a packing job reports). `keys` must be the
    * FULL bin identity: for a SHARDED packing that is the shard
    * column(s) + `bin_id` ([[packSequential]]'s contract — bins are
    * (shard, bin_id) pairs), and the bare-`bin_id` default is only
    * correct for an `allowGlobal` packing. Grouping a sharded packing
    * by `bin_id` alone would merge bin 0 of EVERY shard into one row
    * and report ~shards× the budget — exactly the sanity number this
    * function exists to make trustworthy, so the ambiguity is refused
    * loudly: the default is rejected when the frame still carries a
    * column named `shard`. */
  def binStats(packed: DataFrame, nTokens: Column,
               keys: Seq[Column] = Seq(col("bin_id"))): DataFrame = {
    require(!(keys.map(_.toString) == Seq(col("bin_id").toString) &&
        packed.columns.contains("shard")),
      "binStats: the frame carries a 'shard' column but keys is the " +
        "bare-bin_id default — a sharded packing's bins are (shard, " +
        "bin_id) pairs; pass keys = Seq(col(\"shard\"), col(\"bin_id\")) " +
        "(or your shard columns) so bins from different shards don't " +
        "merge into one misleading fill-level row")
    packed.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_chunks"),
        sum(nTokens).as("n_tokens"))
  }
}
