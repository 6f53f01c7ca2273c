package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Cast, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types.DoubleType

/** Whole-operator Catalyst extension (`SURVEY.md` §4.3 option c):
  * per-group top-k by score with a BOUNDED HEAP.
  *
  * The built-in formulation — `row_number().over(partitionBy(keys)
  * .orderBy(score))` then `filter(rn <= k)` — hash-partitions AND FULLY
  * SORTS every group, O(n log n) comparisons and a complete sort buffer
  * per partition. This operator declares the same ClusteredDistribution
  * requirement (so Catalyst still plans the single exchange, or reuses
  * an existing co-partitioning) but replaces the sort with an O(n log k)
  * streaming pass holding only `groups × k` rows — the difference
  * between spilling a 100 TB sort and never materializing more than the
  * answer.
  *
  * Pieces: [[TopKPerGroup]] (logical, analyzer-resolved expressions),
  * [[TopKStrategy]] (planner rule), [[TopKPerGroupExec]] (physical,
  * heap-per-group over `mapPartitionsInternal`). Registered through
  * `GraftExtensions` (cluster path) or self-registered on first use via
  * `experimental.extraStrategies` (ad-hoc path). Ties on the score are
  * broken arbitrarily (like the RDD `top` idiom); pass a composite
  * score for determinism.
  */
case class TopKPerGroup(k: Int, groupExprs: Seq[Expression],
                        scoreExpr: Expression, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, g, s, child) =>
      TopKPerGroupExec(k, g, s, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
                            scoreExpr: Expression, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** One hash exchange on the group keys — or none, if the child is
    * already co-partitioned (e.g. bucketed input). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprs, child.output)
      val score = BindReferences.bindReference(scoreExpr, child.output)
      // min-heap of size k per group: head = weakest kept row
      implicit val ord: Ordering[(Double, InternalRow)] =
        Ordering.by[(Double, InternalRow), Double](_._1).reverse
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[(Double, InternalRow)]]
      iter.foreach { row =>
        val sv = score.eval(row)
        if (sv != null) {                    // null scores never rank
          val s = sv.asInstanceOf[Double]
          val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
            mutable.PriorityQueue.empty[(Double, InternalRow)])
          if (heap.size < k) heap.enqueue((s, row.copy()))
          else if (s > heap.head._1) {
            heap.dequeue()
            heap.enqueue((s, row.copy()))
          }
        }
      }
      heaps.valuesIterator.flatMap(_.toSeq.sortBy(-_._1).map(_._2).iterator)
    }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopK {
  /** Top-`k` rows per group by `score` (descending). Score is cast to
    * double. Column NAMES (not Columns): Spark 4's Column→Expression
    * wrapper (`ColumnNodeExpression`) reports itself resolved, so the
    * analyzer would not rewrite it inside a custom logical node —
    * `UnresolvedAttribute`s resolve through the standard path. */
  def perGroup(df: DataFrame, groupCols: Seq[String], score: String,
               k: Int): DataFrame = {
    require(k >= 1, s"top-k requires k >= 1 (got $k)")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    GraftColumnBridge.ofRows(spark,
      TopKPerGroup(k,
        groupCols.map(org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted),
        Cast(org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(score),
          DoubleType),
        df.queryExecution.logical))
  }
}
