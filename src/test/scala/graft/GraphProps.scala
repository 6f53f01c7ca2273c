package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.operators.Graph

/** Property tests for the round-9 graph operators: for ANY random
  * edge list, [[Graph.labelPropagation]] equals a brute-force
  * driver-side sync-LPA reference round for round, and [[Graph.hits]]
  * equals a brute-force L1-HITS reference to FP-noise tolerance —
  * plus the structural invariants (label provenance stays inside the
  * connected component; score columns are L1-normalized). */
object GraphProps extends Properties("Graph") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    verts <- Gen.choose(2, 10)
    es <- Gen.listOfN(n, for {
      a <- Gen.choose(1L, verts.toLong)
      b <- Gen.choose(1L, verts.toLong)
    } yield (a, b))
  } yield es

  /** Driver-side sync LPA on the canonical simple graph — the
    * operator's contract restated in ~15 lines of plain Scala. */
  private def bruteLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (a min b, a max b) }
      .filter { case (a, b) => a != b }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      labels = labels.map { case (v, old) =>
        val nbr = adj(v).map(labels)
        if (nbr.isEmpty) v -> old
        else {
          val counts = nbr.groupBy(identity).view.mapValues(_.size).toMap
          v -> counts.toSeq.map { case (lab, c) => (-c, lab) }.min._2
        }
      }
    }
    labels
  }

  /** Driver-side L1 HITS with the same init/normalization contract. */
  private def bruteHits(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Double, Double)] = {
    val e = edges.distinct
    val verts = e.flatMap(p => Seq(p._1, p._2)).distinct
    var hub = verts.map(_ -> 1.0).toMap
    var auth = Map.empty[Long, Double]
    for (_ <- 1 to iters) {
      val aRaw = verts.map(v =>
        v -> e.filter(_._2 == v).map(p => hub(p._1)).sum).toMap
      val aS = aRaw.values.sum
      auth = aRaw.view.mapValues(_ / aS).toMap
      val hRaw = verts.map(v =>
        v -> e.filter(_._1 == v).map(p => auth(p._2)).sum).toMap
      val hS = hRaw.values.sum
      hub = hRaw.view.mapValues(_ / hS).toMap
    }
    verts.map(v => v -> (hub(v), auth(v))).toMap
  }

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (a min b, a max b) }
      .filter { case (a, b) => a != b }.distinct
    val verts = und.flatMap(p => Seq(p._1, p._2)).distinct
    var rep = verts.map(v => v -> v).toMap
    var changed = true
    while (changed) {
      changed = false
      (und ++ und.map(_.swap)).foreach { case (a, b) =>
        if (rep(b) < rep(a)) { rep += a -> rep(b); changed = true }
      }
    }
    rep
  }

  property("labelPropagation equals the brute-force sync reference; labels stay in-component") =
    Prop.forAll(genEdges, Gen.choose(0, 4)) { (es, rounds) =>
      import spark.implicits._
      val got = Graph.labelPropagation(es.toDF("s", "t"), col("s"), col("t"), rounds)
        .as[(Long, Long)].collect().toMap
      val want = bruteLpa(es, rounds)
      val comp = components(es)
      val inComponent = got.forall { case (v, lab) =>
        comp.contains(lab) && comp(lab) == comp(v)
      }
      (got == want: Prop) :| s"engine $got vs brute $want" &&
        (inComponent: Prop) :| "a label escaped its connected component"
    }

  property("hits equals the brute-force L1 reference; both columns sum to 1") =
    Prop.forAll(genEdges, Gen.choose(1, 3)) { (es, iters) =>
      import spark.implicits._
      val got = Graph.hits(es.toDF("s", "t"), col("s"), col("t"), iters)
        .as[(Long, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val want = bruteHits(es, iters)
      val eps = 1e-9   // Σ-order FP noise only
      val close = got.keySet == want.keySet && got.forall { case (v, (h, a)) =>
        math.abs(h - want(v)._1) < eps && math.abs(a - want(v)._2) < eps
      }
      val sums = math.abs(got.values.map(_._1).sum - 1.0) < eps &&
        math.abs(got.values.map(_._2).sum - 1.0) < eps
      (close: Prop) :| s"engine $got vs brute $want" &&
        (sums: Prop) :| "a score column lost its L1 normalization"
    }
}
