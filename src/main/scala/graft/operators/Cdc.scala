package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold a keyed changelog of upserts and
  * deletes into a snapshot — the batch MERGE every warehouse runs to
  * roll a table forward from a CDC feed (Debezium/“apply the binlog”
  * shape; the reference's domain has the same need the moment its
  * user table stops being static, cf.
  * `/root/reference/src/main/java/com/actitracker/data/DataManager.java`
  * which only ever re-reads a full static table).
  *
  * Semantics: per key, the row with the HIGHEST `(seq…, source)` wins
  * — changes outrank the snapshot on a seq tie (the snapshot is “state
  * as of” and a change at the same sequence number supersedes it); a
  * winning `D` removes the key, a winning `U` keeps the change's
  * payload. Keys never touched by the changelog pass through. The fold
  * is associative: applying `a ++ b` in one pass equals applying `a`
  * then `b` (latest-wins is a max), which is what lets a pipeline
  * checkpoint snapshots at arbitrary cut points — q188 proves the law
  * against a single-pass oracle, CdcSpec against random changelogs.
  *
  * Callers must make `(seq…)` unique per key within each input (an
  * event-log `(ts, event_id)` is); on a full tie the payload itself
  * is the final comparator, so the result is still deterministic,
  * just not meaningfully “latest”.
  *
  * Scale shape: ONE aggregation on the key — `max(struct(seq…,
  * source, payload))` collapses map-side (partial max), so the
  * shuffle carries one candidate row per key per map task, never the
  * changelog. Struct max sort-aggregates in Spark: each map task
  * sorts its own slice by key, locally and spill-safely — still far
  * cheaper at scale than the window alternative, which SHUFFLES every
  * change row before its sort. No window, no join. NULL seq fields sort
  * below any value on BOTH engines (Spark struct ordering and the
  * oracles' `ORDER BY … DESC` with DuckDB's default NULLS-LAST treat
  * null as smallest), so a dirty null-seq change can never beat a
  * real one.
  */
object Cdc {

  /** Apply `changes` (carrying `opCol` ∈ {'U','D'}) to `snapshot`.
    * Both frames carry `key ++ seq ++ payload` columns; the snapshot
    * has no op column (it is all live rows). Output schema = the
    * snapshot's. Unknown op codes kill the query loudly in-plan — a
    * silently-dropped op code is a lost delete. */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
                     key: Seq[String], seq: Seq[String],
                     opCol: String): DataFrame = {
    val cols = snapshot.columns.toSeq
    val missing = (key ++ seq).filterNot(cols.contains)
    require(missing.isEmpty,
      s"snapshot must carry the key+seq columns; missing " +
        s"${missing.mkString(",")} from (${cols.mkString(",")})")
    val payload = cols.filterNot(c => key.contains(c))
    val guarded = changes.filter(coalesce(
      assert_true(col(opCol).isin("U", "D"),
        concat(lit(s"Cdc.applyChangelog: unknown op code '"), col(opCol),
          lit("' — only U (upsert) and D (delete) exist; a dropped " +
            "delete resurrects rows, fix the producer"))),
      lit(true)))
    val all = snapshot
      .select(cols.map(col) :+ lit("U").as("_op") :+ lit(0L).as("_src"): _*)
      .unionByName(guarded
        .select(cols.map(col) :+ col(opCol).as("_op") :+ lit(1L).as("_src"): _*))
    // latest-wins as a MAP-SIDE-COMBINING max, not a window sort: the
    // struct comparator is (seq…, _src, _op, payload…) — key-constant
    // fields excluded
    val ordered = struct(
      (seq.map(col) :+ col("_src") :+ col("_op")) ++
        payload.filterNot(seq.contains).map(col): _*)
    all.groupBy(key.map(col): _*)
      .agg(max(ordered).as("_w"))
      .filter(col("_w._op") === "U")
      .select(key.map(col) ++
        cols.filterNot(key.contains).map(c => col(s"_w.$c").as(c)): _*)
  }
}
