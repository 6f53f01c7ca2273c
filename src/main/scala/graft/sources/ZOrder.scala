package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional clustering for
  * scan pruning (`SURVEY.md` §2 A+; the `OPTIMIZE ZORDER BY` move of
  * lakehouse table formats, done with plain Spark + parquet).
  *
  * Why it matters at 100 TB: partitioning prunes ONE low-cardinality
  * column; a sort clusters ONE high-cardinality column. A box query
  * over two+ dimensions (user × time, partkey × suppkey, lat × lon)
  * prunes poorly under either. Interleaving the bits of the normalized
  * dimensions into one Morton key and range-partitioning + sorting by
  * it gives every file/row-group a SMALL bounding box in all
  * dimensions at once, so parquet min/max stats skip most of the data
  * for any box predicate. Pure column expressions (shift/and/or — all
  * codegen'd built-ins), one tiny driver-side bounds aggregate, one
  * range exchange: nothing here is driver-bound or row-at-a-time.
  */
object ZOrder {

  /** Morton code over pre-normalized non-negative integer columns:
    * bit `b` of column `i` lands at interleaved position `b·n + i`.
    * Composed entirely of codegen'd bitwise built-ins. */
  def interleaveBits(cols: Seq[Column], bitsPer: Int = 16): Column = {
    require(cols.nonEmpty, "interleaveBits needs at least one column")
    require(cols.size * bitsPer <= 63,
      s"${cols.size} cols × $bitsPer bits/col = ${cols.size * bitsPer} " +
        "interleaved bits — must fit a signed long (<= 63)")
    val n = cols.size
    val terms = for {
      b <- 0 until bitsPer
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Min-max scale a numeric column onto the [0, 2^bitsPer) integer
    * grid. NULLs land on the min corner (they cluster together, the
    * useful behavior for stats pruning). A constant column maps to 0
    * everywhere — harmless, it contributes no discriminating bits. */
  def gridScale(c: Column, lo: Double, hi: Double, bitsPer: Int): Column = {
    val steps = (1L << bitsPer) - 1
    if (hi <= lo) lit(0L)
    else least(lit(steps), greatest(lit(0L),
      floor((coalesce(c.cast("double"), lit(lo)) - lit(lo))
        / lit(hi - lo) * lit(steps.toDouble)).cast("long")))
  }

  /** The Morton key for `df` over `zCols`, bounds computed with one
    * tiny aggregate (2·|zCols| doubles of driver metadata — the same
    * legitimacy class as IVF centroids). */
  def zValue(df: DataFrame, zCols: Seq[String], bitsPer: Int = 16): Column = {
    val aggs = zCols.flatMap(c => Seq(
      min(col(c).cast("double")), max(col(c).cast("double"))))
    val boundsRow = df.agg(aggs.head, aggs.tail: _*).head()
    // an all-NULL (or empty-input) column has NULL bounds → constant 0
    def at(j: Int): Double =
      if (boundsRow.isNullAt(j)) 0.0 else boundsRow.getDouble(j)
    val scaled = zCols.zipWithIndex.map { case (c, i) =>
      gridScale(col(c), at(2 * i), at(2 * i + 1), bitsPer)
    }
    interleaveBits(scaled, bitsPer)
  }

  /** Write `df` as parquet clustered by the Morton key over `zCols`:
    * range-partition into `numFiles` output tasks (a range exchange —
    * the only shuffle), sort within each, drop the key, write. Every
    * output file then owns a contiguous Morton range = a small box in
    * every z dimension, and parquet min/max stats prune box queries. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    bitsPer: Int = 16, numFiles: Int = 0): Unit = {
    val files = if (numFiles > 0) numFiles
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    require(!df.columns.contains("_z"),
      "writeZOrdered: input already has a _z column — it would be " +
        "silently overwritten and dropped from the written data; " +
        "rename it first")
    df.withColumn("_z", zValue(df, zCols, bitsPer))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
