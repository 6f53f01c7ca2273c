package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, AttributeSet, Cast, CurrentRow, Descending, EqualTo, Expression, GenericInternalRow, GreaterThan, GreaterThanOrEqual, JoinedRow, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowFrame, RowNumber, RowOrdering, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types.DoubleType

/** Whole-operator Catalyst extension (`SURVEY.md` §4.3 option c):
  * per-group top-k under a SortOrder with a BOUNDED HEAP.
  *
  * The built-in formulation — `row_number().over(partitionBy(keys)
  * .orderBy(...))` then `filter(rn <= k)` — hash-partitions AND FULLY
  * SORTS every group, O(n log n) comparisons and a complete sort buffer
  * per partition. This operator declares the same ClusteredDistribution
  * requirement (so Catalyst still plans the single exchange, or reuses
  * an existing co-partitioning) but replaces the sort with an O(n log k)
  * streaming pass holding only `groups × k` rows — the difference
  * between spilling a 100 TB sort and never materializing more than the
  * answer. When even `groups × k` exceeds the per-task resident cap,
  * the operator degrades gracefully (partial: flush downstream; final:
  * sorted-run disk spill + streaming merge) instead of OOMing.
  *
  * Pieces: [[TopKPerGroup]] (logical; carries the full `Seq[SortOrder]`
  * so composite orderings — score desc, id asc — rank exactly like
  * `row_number`, and optionally emits the rank column itself),
  * [[TopKStrategy]] (planner rule: plans a PARTIAL map-side pass below
  * the exchange and a FINAL merging pass above it, like partial
  * aggregation — the shuffle carries per-partition survivors, not the
  * input), [[TopKPerGroupExec]] (physical, heap-per-group with a
  * codegen'd `RowOrdering`), and [[TopKRewrite]] (optimizer rule:
  * user-written `filter(row_number().over(...) <= k)` plans become
  * this operator automatically — no Window, no Sort). Registered
  * through `GraftExtensions` (cluster path) or self-registered on
  * first use via `experimental.extraStrategies` (ad-hoc path).
  */
case class TopKPerGroup(k: Int, groupExprs: Seq[Expression],
                        order: Seq[SortOrder], rankOutput: Option[Attribute],
                        child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankOutput
  override def producedAttributes: AttributeSet = AttributeSet(rankOutput.toSeq)
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  /** Two-stage plan, exactly like partial aggregation: a PARTIAL pass
    * with no distribution requirement keeps each map partition's own
    * top-k per group, so the exchange ships ≤ partitions × groups × k
    * candidate rows instead of the whole input — at 100 TB the
    * difference between shuffling the table and shuffling the answer.
    * The FINAL pass (clustered on the group keys) merges candidates
    * and emits ranks. The global top-k of a union is the top-k of the
    * per-partition top-ks, so results are identical. On an already
    * co-partitioned child (bucketed input) the partial pass is a
    * cheap extra scan, not a plan change. */
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, g, o, r, child) =>
      // canonicalize float/double group keys HERE (expressions are
      // resolved by planning time): the optimizer's
      // NormalizeFloatingNumbers only rewrites Window/Aggregate/Join,
      // so without this a -0.0 and a 0.0 key would land in different
      // hash partitions AND different byte-compared heap groups —
      // diverging from the Window plan this operator replaces. No-op
      // for non-float keys.
      val gn = g.map(GraftColumnBridge.normalizeFloatKey)
      TopKPerGroupExec(k, gn, o, r, partial = false,
        TopKPerGroupExec(k, gn, o, None, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: rewrite `Filter(rn <= k)` over a single-expression
  * `row_number()` Window into [[TopKPerGroup]] emitting the rank
  * column under the window output's ExprId. The Filter is kept (it
  * still prunes when the predicate carries extra conjuncts, and costs
  * nothing on ≤ groups×k rows); the Window — and with it the full
  * per-group sort — disappears. Only `row_number` qualifies: `rank`/
  * `dense_rank` admit more than k rows on boundary ties, which a
  * bounded heap of k cannot represent.
  *
  * Memory safety: the replaced WindowExec sort spills to disk; the
  * heap operator's resident set is bounded by
  * [[TopKPerGroupExec.MaxResidentRowsKey]] — the partial pass FLUSHES
  * its heaps at the cap (correct: the top-k of a union is contained
  * in the union of the parts' top-ks), and the final pass SPILLS
  * sorted runs to local disk and streaming-merges them, so extreme
  * groups × k (e.g. rn=1 latest-per-key over extreme-cardinality
  * keys) degrades to disk exactly like the window sort would, never
  * to OOM. Escape hatches, both honored and documented:
  * `spark.graft.topk.rewrite=false` (this flag) or the standard
  * `spark.sql.optimizer.excludedRules=graft.plans.TopKRewrite`. */
object TopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Conf flag gating the rewrite (default on). */
  val RewriteEnabledKey = "spark.graft.topk.rewrite"

  /** Rewrite ceiling: above this k the heap's O(n log k) advantage
    * over the window sort's O(n log n) fades while its per-group
    * bookkeeping overhead doesn't — large-k queries keep the window
    * plan. */
  val MaxRewriteK = 65536

  private def enabled: Boolean =
    conf.getConfString(RewriteEnabledKey, "true").toBoolean

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  /** The Int value of any integral literal (byte/short/int/in-range
    * long) — shared with `GraftExtensions.intLit` so the two literal
    * extractors in this package cannot disagree on which SQL integer
    * literals count (`2S`, `2L`, …). */
  private[plans] def intVal(l: Literal): Option[Int] = l.value match {
    case i: Int => Some(i)
    case v: Long if v <= Int.MaxValue && v >= Int.MinValue => Some(v.toInt)
    case s: Short => Some(s.toInt)
    case b: Byte => Some(b.toInt)
    case _ => None
  }

  /** The tightest `rank ≤ K` bound implied by the predicate's
    * conjuncts, if any constrain the rank attribute from above. */
  private def rankLimit(cond: Expression, rank: Attribute): Option[Int] = {
    def isRank(e: Expression): Boolean = stripCast(e) match {
      case a: AttributeReference => a.exprId == rank.exprId
      case _ => false
    }
    val bounds = splitConjunctivePredicates(cond).flatMap {
      case LessThanOrEqual(l, lt: Literal) if isRank(l) => intVal(lt)
      case LessThan(l, lt: Literal) if isRank(l) => intVal(lt).map(_ - 1)
      case GreaterThanOrEqual(lt: Literal, r) if isRank(r) => intVal(lt)
      case GreaterThan(lt: Literal, r) if isRank(r) => intVal(lt).map(_ - 1)
      case EqualTo(l, lt: Literal) if isRank(l) => intVal(lt)
      case EqualTo(lt: Literal, r) if isRank(r) => intVal(lt)
      case _ => None
    }
    bounds.reduceOption(math.min)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else plan.transformUp {
    case f @ Filter(cond, Window(
        Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, order,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
        _, _, child, _)) if part.nonEmpty && order.nonEmpty =>
      rankLimit(cond, alias.toAttribute) match {
        case Some(k) if k >= 1 && k <= MaxRewriteK =>
          Filter(cond, TopKPerGroup(k, part, order, Some(alias.toAttribute), child))
        case _ => f
      }
  }
}

object TopKPerGroupExec {
  /** Per-task cap on rows resident across all heaps. The partial pass
    * flushes (emits and clears) its heaps at the cap — downstream
    * consumes the flushed rows streaming, so task memory stays
    * bounded regardless of group cardinality. The final pass SPILLS
    * at the cap: each overflow writes one run to local disk — groups
    * in key-byte order, each group's ≤k survivors in rank order — and
    * the runs are streaming-merged at the end (resident: one ≤k group
    * list per run), so extreme groups × k degrades to disk exactly
    * like the WindowExec sort it replaces, instead of OOMing. Default
    * 4M rows ≈ a few hundred MB of UnsafeRow copies per task — sized
    * for a 4-8 core executor with 8 GB heap. */
  val MaxResidentRowsKey = "spark.graft.topk.maxResidentRows"
  val DefaultMaxResidentRows = 4 * 1024 * 1024

  /** Byte-denominated twin of the row cap: kept rows are full-width
    * UnsafeRow COPIES, so with wide rows (a 2 KB text column, say) the
    * row cap alone would admit gigabytes before flushing — the
    * WindowExec sort this operator replaces tracks bytes under the
    * memory manager, so the substitute must too. Whichever cap trips
    * first flushes/spills. Default 256 MB per task. */
  val MaxResidentBytesKey = "spark.graft.topk.maxResidentBytes"
  val DefaultMaxResidentBytes: Long = 256L * 1024 * 1024
}

/** Spilled-run plumbing for the final pass: a run holds groups in
  * unsigned key-byte order (UnsafeRow group keys compare equal iff
  * their bytes do — the same equality the in-memory hash map uses, so
  * byte order is a total order consistent with grouping), each group's
  * ≤k survivors in rank order. */
private[plans] object TopKSpill {
  def compareKeys(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** Sequential reader over one run file; `key`/`rows` hold the
    * current group until [[advance]]. */
  final class Reader(file: java.io.File, nFields: Int) {
    private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(file), 1 << 16))
    var key: Array[Byte] = _
    var rows: Array[InternalRow] = _
    // a truncated run (disk-full spill) throws out of the eager first
    // advance — close the stream on the way out or the fd (on a
    // soon-deleted file) leaks for the executor's lifetime
    try advance()
    catch { case t: Throwable => try in.close() catch { case _: Throwable => () }; throw t }
    def advance(): Unit = {
      val kl = try in.readInt() catch { case _: java.io.EOFException => -1 }
      if (kl < 0) { key = null; rows = null; in.close(); return }
      key = new Array[Byte](kl)
      in.readFully(key)
      rows = Array.tabulate(in.readInt()) { _ =>
        val len = in.readInt()
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        val r = new UnsafeRow(nFields)
        r.pointTo(bytes, len)
        r
      }
    }
    def done: Boolean = key == null
    /** Idempotent close for abandoned merges (e.g. a LIMIT above the
      * operator stops consuming mid-stream) — without it a
      * deleted-while-open run file pins its fd and disk space. */
    def close(): Unit = if (!done) { key = null; rows = null; in.close() }
  }

  /** Spill target: Spark's configured local dirs (sized, monitored
    * volumes — where the window sort this operator replaces would
    * spill). Resolution mirrors Spark's own order: the cluster
    * manager's env (`LOCAL_DIRS` on YARN, `SPARK_LOCAL_DIRS` on
    * standalone/K8s — where `spark.local.dir` is ignored), then the
    * conf, then java.io.tmpdir (unit tests). Comma lists use the
    * first entry. One UNIQUE per-JVM subdirectory (creation checked,
    * not silently ignored) — a fixed shared name under a world-shared
    * tmpdir would collide across users. */
  lazy val spillDir: java.io.File = {
    val base = sys.env.get("LOCAL_DIRS")
      .orElse(sys.env.get("SPARK_LOCAL_DIRS"))
      .orElse(Option(org.apache.spark.SparkEnv.get)
        .flatMap(_.conf.getOption("spark.local.dir")))
      .getOrElse(System.getProperty("java.io.tmpdir"))
      .split(",").head.trim
    val d = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(base), "graft-topk-spill-").toFile
    d.deleteOnExit() // one JVM-global entry for the dir, not per run file
    d
  }
}

case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
                            order: Seq[SortOrder], rankOutput: Option[Attribute],
                            partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output ++ rankOutput
  override def producedAttributes: AttributeSet = AttributeSet(rankOutput.toSeq)
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroup"

  override lazy val metrics = Map(
    "spillRuns" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "spilled runs"))

  /** Final: one hash exchange on the group keys — or none, if the
    * child is already co-partitioned (e.g. bucketed input). Partial:
    * runs wherever the data already is. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial)
      org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val outAttrs = output
    val (kL, groupL, orderL, rankL, partialL) = (k, groupExprs, order, rankOutput, partial)
    val maxResident = math.max(1,
      org.apache.spark.sql.internal.SQLConf.get.getConfString(
        TopKPerGroupExec.MaxResidentRowsKey,
        TopKPerGroupExec.DefaultMaxResidentRows.toString).toInt)
    val maxResidentBytes = math.max(1L << 20,
      org.apache.spark.sql.internal.SQLConf.get.getConfString(
        TopKPerGroupExec.MaxResidentBytesKey,
        TopKPerGroupExec.DefaultMaxResidentBytes.toString).toLong)
    val spillMetric = longMetric("spillRuns")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupL, childOutput)
      // codegen'd comparator for the FULL SortOrder sequence — composite
      // orderings and null-ordering semantics match row_number exactly
      val ord = RowOrdering.create(orderL, childOutput)
      // identity projection: spilled rows must be UnsafeRow bytes
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      new Iterator[InternalRow] {
        // max-heap under ord: head = the currently-weakest kept row
        private val heaps = mutable.LinkedHashMap
          .empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
        private var resident = 0
        private var residentBytes = 0L
        // kept rows are UnsafeRow copies in practice (codegen output);
        // the fallback is a coarse width estimate for exotic children
        private def rowSize(r: InternalRow): Long = r match {
          case u: UnsafeRow => u.getSizeInBytes.toLong
          case _ => 24L * (childOutput.length + 2)
        }
        private var out: Iterator[InternalRow] = Iterator.empty
        private var done = false
        private val joined = new JoinedRow
        private val rankRow = new GenericInternalRow(1)
        private val projOpt = rankL.map(rankAttr =>
          UnsafeProjection.create(outAttrs, childOutput :+ rankAttr))
        private val spillFiles = mutable.ArrayBuffer.empty[java.io.File]
        private val openReaders = mutable.ArrayBuffer.empty[TopKSpill.Reader]
        private var cleanupRegistered = false

        /** Registered at the FIRST spill (not at merge time): a task
          * killed mid-ingest still deletes its runs and closes any
          * readers. */
        private def registerCleanup(): Unit = if (!cleanupRegistered) {
          cleanupRegistered = true
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit] { _ =>
              openReaders.foreach(_.close())
              spillFiles.foreach(_.delete())
            })
        }

        // dequeueAll drains worst-first; reverse = rank order (best first)
        private def ranked(heap: mutable.PriorityQueue[InternalRow]): Seq[InternalRow] = {
          val worstFirst: Seq[InternalRow] = heap.dequeueAll
          worstFirst.reverse
        }

        private def emit(rows: Iterator[InternalRow]): Iterator[InternalRow] =
          projOpt match {
            case None => rows
            case Some(proj) => rows.zipWithIndex.map { case (r, i) =>
              rankRow.setInt(0, i + 1)
              proj(joined(r, rankRow))
            }
          }

        /** PARTIAL pass overflow/end: emit and forget everything held —
          * the resident set goes to the downstream consumer (shuffle
          * write / parent operator), which drains it streaming, so task
          * memory drops back to 0. */
        private def drain(): Iterator[InternalRow] = {
          val snapshot = heaps.values.toSeq
          heaps.clear()
          resident = 0
          residentBytes = 0L
          snapshot.iterator.flatMap(h => emit(ranked(h).iterator))
        }

        /** FINAL pass overflow: write one sorted run (groups in
          * key-byte order, rows in rank order) to local disk and keep
          * ingesting — the merge recombines groups split across runs. */
        private def spill(): Unit = {
          registerCleanup()
          val file = java.io.File.createTempFile("topk-", ".run", TopKSpill.spillDir)
          // outside a Spark task (no TaskContext to clean up) fall back
          // to JVM-exit deletion so runs cannot accumulate forever
          if (org.apache.spark.TaskContext.get() == null) file.deleteOnExit()
          spillFiles += file
          spillMetric += 1
          val entries = heaps.toArray.map { case (kb, h) => (kb.getBytes, ranked(h)) }
            .sortWith((x, y) => TopKSpill.compareKeys(x._1, y._1) < 0)
          heaps.clear()
          resident = 0
          residentBytes = 0L
          val outS = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(file), 1 << 16))
          val writeBuf = new Array[Byte](1 << 16)
          try entries.foreach { case (kb, rows) =>
            outS.writeInt(kb.length)
            outS.write(kb)
            outS.writeInt(rows.length)
            rows.foreach { r =>
              val u = toUnsafe(r)
              outS.writeInt(u.getSizeInBytes)
              u.writeToStream(outS, writeBuf)
            }
          } finally outS.close()
        }

        /** Streaming k-way merge of the spilled runs: resident memory
          * is one ≤k group list per run, independent of group count. */
        private def mergeSpills(): Iterator[InternalRow] = {
          if (heaps.nonEmpty) spill() // remainder becomes the last run
          // append each reader AS CONSTRUCTED: if a later constructor
          // throws, the task-completion cleanup must still close the
          // ones already open (a whole-map-then-append would leak them)
          spillFiles.foreach { f =>
            openReaders += new TopKSpill.Reader(f, childOutput.length)
          }
          val active = mutable.ArrayBuffer.from(openReaders.filterNot(_.done))
          new Iterator[InternalRow] {
            private var cur: Iterator[InternalRow] = Iterator.empty
            override def hasNext: Boolean = {
              while (!cur.hasNext && active.nonEmpty) {
                var minKey: Array[Byte] = null
                active.foreach { r =>
                  if (minKey == null || TopKSpill.compareKeys(r.key, minKey) < 0)
                    minKey = r.key
                }
                val merged = mutable.ArrayBuffer.empty[InternalRow]
                active.foreach { r =>
                  if (TopKSpill.compareKeys(r.key, minKey) == 0) {
                    merged ++= r.rows
                    r.advance()
                  }
                }
                active.filterInPlace(!_.done)
                cur = emit(merged.sortWith((x, y) => ord.compare(x, y) < 0)
                  .take(kL).iterator)
              }
              cur.hasNext
            }
            override def next(): InternalRow = cur.next()
          }
        }

        override def hasNext: Boolean = {
          while (!out.hasNext && !done) {
            if (!iter.hasNext) {
              out = if (!partialL && spillFiles.nonEmpty) mergeSpills() else drain()
              done = true
            } else {
              var flush = false
              while (iter.hasNext && !flush) {
                val row = iter.next()
                // probe with the REUSED projection row; copy the key
                // only on first sight — getOrElseUpdate(copy, ...)
                // would allocate a fresh UnsafeRow per input row just
                // to probe, pure GC pressure on the O(n) ingest loop
                val probeKey = keyProj(row)
                val heap = heaps.get(probeKey) match {
                  case Some(h) => h
                  case None =>
                    val h = mutable.PriorityQueue.empty[InternalRow](ord)
                    heaps.put(probeKey.copy(), h)
                    h
                }
                if (heap.size < kL) {
                  val kept = row.copy()
                  heap.enqueue(kept)
                  resident += 1
                  residentBytes += rowSize(kept)
                } else if (ord.compare(row, heap.head) < 0) {
                  residentBytes -= rowSize(heap.dequeue())
                  val kept = row.copy()
                  heap.enqueue(kept)
                  residentBytes += rowSize(kept)
                }
                if (resident >= maxResident || residentBytes >= maxResidentBytes)
                  flush = true
              }
              if (flush) {
                if (partialL) out = drain() else spill()
              }
            }
          }
          out.hasNext
        }

        override def next(): InternalRow = out.next()
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopK {
  /** Top-`k` rows per group by `score` (descending, SQL null-ordering:
    * nulls last). Score is cast to double. Column NAMES (not Columns):
    * Spark 4's Column→Expression wrapper (`ColumnNodeExpression`)
    * reports itself resolved, so the analyzer would not rewrite it
    * inside a custom logical node — `UnresolvedAttribute`s resolve
    * through the standard path. */
  def perGroup(df: DataFrame, groupCols: Seq[String], score: String,
               k: Int): DataFrame = {
    require(k >= 1, s"top-k requires k >= 1 (got $k)")
    // an empty group list would only fail at planning time, deep inside
    // ClusteredDistribution's own require — name the caller's mistake
    require(groupCols.nonEmpty,
      "top-k requires at least one group column (for a global top-k, " +
        "orderBy(...).limit(k) already plans a bounded TakeOrdered)")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    GraftColumnBridge.ofRows(spark,
      TopKPerGroup(k,
        groupCols.map(UnresolvedAttribute.quoted),
        SortOrder(Cast(UnresolvedAttribute.quoted(score), DoubleType),
          Descending) :: Nil,
        None,
        df.queryExecution.logical))
  }
}
