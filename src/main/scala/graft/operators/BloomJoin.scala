package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered joins — explicit, user-controlled runtime
  * filtering (`SURVEY.md` §2 C+).
  *
  * The 100 TB problem this solves: a semi/inner join against a build
  * side too large to broadcast forces BOTH sides through a shuffle —
  * including every probe-side row that matches nothing and will be
  * discarded after the exchange. A Bloom filter of the build-side keys
  * is megabytes even for 10^8 keys, so it CAN broadcast; applying it
  * before the exchange drops most non-matching probe rows at the scan,
  * and the shuffle carries survivors only. Catalyst's own
  * `InjectRuntimeFilter` does this opportunistically (and only when a
  * selective filter sits on the build side); this operator is the
  * deterministic, tunable version for pipeline code that KNOWS its
  * build side is selective.
  *
  * Exactness: the Bloom filter never yields false negatives, so
  * prefiltering loses no matching row; false positives (rate `fpp`)
  * are eliminated by the exact join that follows. Both the aggregate
  * that builds the filter and the `might_contain` probe are Spark's
  * own codegen'd expressions (`BloomFilterAggregate`,
  * `BloomFilterMightContain`) over `xxhash64(key)` — the identical
  * expression pair `InjectRuntimeFilter` plants, reused through the
  * bridge rather than reimplemented.
  */
object BloomJoin {

  /** Serialized Bloom filter of `key` over `df`, built distributed
    * (partial aggregation; one filter merge per partition) and
    * returned to the driver — legitimately tiny driver metadata, like
    * IVF centroids: `optimalNumBits(10^8, 3%)` ≈ 87 MB worst case,
    * ~1 MB at 10^6 keys. NULL keys hash to the xxhash64 seed and are
    * harmless: a null never equi-joins, and the exact join after the
    * prefilter discards any survivor. */
  def bloomFilterBytes(df: DataFrame, key: Column,
                       expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val wanted = optimalNumBits(expectedItems, fpp)
    // BloomFilterAggregate silently Math.min's the requested size
    // against spark.sql.optimizer.runtime.bloomFilter.maxNumBits
    // (default 64M bits) — above ~9M keys at 3% the effective fpp
    // would quietly blow past the requested one and the prefilter
    // would stop filtering. Surface that instead of hiding it.
    val confMax = df.sparkSession.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    // the aggregate ALSO Math.min's estimatedNumItems against
    // ...bloomFilter.maxNumItems (default 4M) and sizes its hash-
    // function count k = bits/items·ln2 from the CAPPED value: passing
    // 10^8 raw items would make it pick ~20× too many hash functions,
    // saturate the filter, and the true fpp approaches 1.0 with no
    // sign — clamp OURSELVES and account for it in the warning.
    val confMaxItems = df.sparkSession.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val items = math.min(expectedItems, confMaxItems)
    val numBits = math.min(wanted, confMax)
    if (wanted > confMax || expectedItems > confMaxItems) {
      // k is sized from `items`; with n=expectedItems real insertions
      // the standard fpp estimate is (1 − e^(−k·n/m))^k
      val kHash = math.max(1, math.round(numBits.toDouble / items * math.log(2.0)))
      val effFpp = math.pow(
        1.0 - math.exp(-kHash.toDouble * expectedItems / numBits), kHash.toDouble)
      org.apache.log4j.Logger.getLogger(getClass).warn(
        f"BloomJoin: requested $wanted bits for $expectedItems keys at fpp=$fpp, " +
          f"but the bloomFilter confs cap the aggregate at $confMax bits / " +
          f"$confMaxItems items — effective fpp ≈ $effFpp%.3f. " +
          "Raise the confs (or accept the weaker prefilter; correctness is " +
          "unaffected — the exact join erases false positives).")
    }
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(expression(key))),
      Literal(items), Literal(numBits), 0, 0)
    val row = df.select(column(agg.toAggregateExpression())).head()
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** Standard Bloom sizing: m = -n·ln(p)/ln(2)², capped at Spark's
    * aggregate ceiling (it rejects absurd sizes itself; the cap keeps
    * the request sane for huge n). */
  def optimalNumBits(n: Long, p: Double): Long =
    math.min(math.ceil(-n * math.log(p) / (math.log(2) * math.log(2))).toLong,
      67108864L * 8L) // 64 MB of bits

  /** Probe predicate: true iff `key` MIGHT be in the serialized filter
    * (no false negatives). Codegen'd; pushes to the scan like any
    * deterministic predicate. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    column(new BloomFilterMightContain(
      Literal.create(bloom, BinaryType), new XxHash64(Seq(expression(key)))))

  /** Exact left-semi join with a Bloom prefilter on the probe side.
    * `expectedItems` sizes the filter; pass the build side's
    * (approximate) key count — overestimating wastes filter bits,
    * underestimating raises the false-positive rate, neither affects
    * correctness. If `expectedItems <= 0` the build side is counted
    * first (one extra small job). Returns probe-side rows whose
    * `probeKey` appears in `buildKey`. */
  def semiJoin(probe: DataFrame, build: DataFrame,
               probeKey: Column, buildKey: Column,
               expectedItems: Long = -1L, fpp: Double = 0.03): DataFrame = {
    val n = if (expectedItems > 0) expectedItems else build.count()
    if (n == 0) return probe.filter(lit(false))
    val bloom = bloomFilterBytes(build, buildKey, n, fpp)
    val pre =
      if (bloom == null) probe.filter(lit(false))
      else probe.filter(mightContain(bloom, probeKey))
    pre.join(build, probeKey === buildKey, "left_semi")
  }
}
