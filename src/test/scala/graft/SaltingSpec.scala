package graft

import org.apache.spark.sql.functions._
import graft.operators.Salting

/** Salted operators must be RESULT-IDENTICAL to their plain twins —
  * including on null salt sources and with targeted hot keys. */
class SaltingSpec extends SparkSpec {
  import spark.implicits._

  val fact = Seq(
    (1L, Some(10L), 100.0), (1L, Some(11L), 200.0), (1L, None, 400.0),
    (2L, Some(12L), 800.0), (3L, Some(13L), 1600.0)
  ).toDF("k", "salt_src", "v")
  val dim = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("dk", "attr")

  private def plain = fact.join(dim, col("k") === col("dk"))
    .select("k", "v", "attr").collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("saltedEquiJoin == plain join, including NULL salt-source rows") {
    val salted = Salting.saltedEquiJoin(fact, dim,
        factKey = col("k"), dimKey = col("dk"),
        saltSource = col("salt_src"), saltBuckets = 4)
      .select("k", "v", "attr").collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(salted === plain)   // the null-salt row (k=1, v=400) must survive
    assert(salted.exists(_.contains(400.0)))
  }

  test("hot-key-targeted salting == plain join; cold dim rows not replicated") {
    val salted = Salting.saltedEquiJoin(fact, dim,
        factKey = col("k"), dimKey = col("dk"),
        saltSource = col("salt_src"), saltBuckets = 4, hotKeys = Seq(1L))
      .select("k", "v", "attr").collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(salted === plain)
  }
}
