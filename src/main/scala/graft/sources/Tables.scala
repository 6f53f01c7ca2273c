package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema'd readers for the driver-generated parquet testdata
  * (`TESTDATA.md`) — the engine's batch sources.
  *
  * The reference scans Cassandra (`job/RecognizeActivity.java:49`
  * `cassandraTable("actitracker","users")`) with hand-written column
  * projection and predicate pushdown (`:50,60-69`). Here sources are
  * declarative `spark.read.parquet` DataFrames: Catalyst's
  * `ColumnPruning` / `PushDownPredicates` push projections and filters
  * into the parquet scan automatically (visible as `ReadSchema` /
  * `PushedFilters` in `.explain("formatted")`), and the vectorized
  * parquet reader + whole-stage codegen replace the row-at-a-time
  * `CassandraRow.toMap` access path (`data/DataManager.java:12-22`).
  *
  * 100 TB notes: parquet scans split by row-group, so parallelism
  * scales with data size; no scan here materializes on the driver.
  * A Cassandra deployment would swap `format("parquet")` for the
  * connector format string — the plan shape is unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one testdata table. `events.ts` has shipped in two physical
    * encodings across testdata generations: parquet TIMESTAMP(NANOS)
    * (Spark's reader rejects it by default → read as an epoch-nanos
    * long via the legacy flag) and plain TIMESTAMP µs (read as
    * TIMESTAMP_NTZ). Consumers never branch on this —
    * `GraftFunctions.epochMicros` schema-dispatches both onto the same
    * exact epoch-µs long basis, and all session/window math stays
    * exact integer arithmetic (never double division, which loses
    * precision above 2^53 — epoch-nanos are ~1.7e18). Matches the
    * reference's data model: timestamps as opaque long ticks
    * (`RecognizeActivity.java:64`).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The flag should be set at session BUILD time (the graft mains and
    // test sessions all do), but EXTERNAL sessions — the driver harness
    // smoke-calls SparkEntry.entry with a session this library does not
    // build — must keep working, so the nanos read self-heals with a
    // logged warning rather than failing. The mutation is guarded (only
    // when unset, only for the nanos table) to keep the shared-conf
    // side effect minimal and visible.
    // SQLConf.contains probes the EXPLICIT settings only (get() would
    // fall back to the registered default, hiding the distinction) —
    // an explicit false is a deliberate choice (e.g. a harness
    // asserting the modern timestamp path) and must be respected, not
    // silently flipped session-wide; only a truly unset conf self-heals
    if (name == "events" &&
        !spark.sessionState.conf.contains("spark.sql.legacy.parquet.nanosAsLong")) {
      org.apache.log4j.Logger.getLogger(getClass).warn(
        "graft.Tables.load: setting spark.sql.legacy.parquet.nanosAsLong=true " +
          "for the events table (prefer setting it at session build time)")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Pluggable source seam (A1): the engine's plans are source-agnostic
    * DataFrames — swapping parquet for the Cassandra connector is
    * `loadFormat(spark, "org.apache.spark.sql.cassandra",
    * Map("keyspace" -> "actitracker", "table" -> "users"))`; predicate
    * and projection pushdown then flow through the connector's
    * DataSource V2 capabilities exactly as they reach parquet here. */
  def loadFormat(spark: SparkSession, format: String,
                 options: Map[String, String],
                 path: Option[String] = None): DataFrame = {
    val r = spark.read.format(format).options(options)
    path.map(r.load).getOrElse(r.load())
  }

  /** Idempotently materialize testdata table `name` as a BUCKETED
    * table (`bucketBy`/`sortBy` on `key`) and return its catalog name.
    * Bucketing is the at-rest half of the co-located join: both sides
    * of a repeated equi-join pre-partitioned at write time, so the
    * join plans with ZERO exchange on its inputs — pay the shuffle
    * once when the table is written, never again per query. The name
    * is suffixed with the source dir so different scale factors can't
    * alias each other's data.
    *
    * Concurrency protocol (temp-write-and-rename — multiple sessions
    * may derive the same name):
    *  1. each session writes its build under a UNIQUE temp table name;
    *  2. the finished build is `rename`d into the final location ONLY
    *     when that location does not exist — first writer wins. Hadoop
    *     `rename` onto an existing directory does NOT fail (it nests
    *     the source inside it), so losing is detected by a pre-check
    *     plus a post-rename nesting check, and a nested loser build is
    *     removed; the loser discards only its own temp data.
    *  3. a COMPLETE final location (its job-commit `_SUCCESS` marker
    *     present) is ADOPTED, never deleted: the catalog entry is
    *     re-registered over it via bucketed-DDL `CREATE TABLE ...
    *     LOCATION`. A location without `_SUCCESS` is a crashed build
    *     (live builds are under temp names) and is cleared — with a
    *     completeness re-check right before the swap, shrinking the
    *     crash-cleanup race window from build-length to milliseconds.
    *     (True mutual exclusion needs a transactional catalog/lock
    *     service; this protocol is the strongest filesystem-only
    *     version.) */
  def bucketed(spark: SparkSession, dir: String, name: String, key: String,
               buckets: Int = 8): String = {
    // saveAsTable lowercases identifiers; derive the name lowercased so
    // catalog names and filesystem paths never diverge by case
    // buckets is part of the name: the file layout is hash-mod-buckets,
    // so a leftover build with a DIFFERENT count adopted under the same
    // name would register the wrong CLUSTERED BY spec and silently lose
    // join rows (bucket pruning assumes the registered modulus)
    val tbl = (s"${name}_${key}_b${buckets}_" + dir.replaceAll("[^a-zA-Z0-9]", "_"))
      .toLowerCase(java.util.Locale.ROOT)
    val log = org.apache.log4j.Logger.getLogger(getClass)
    // managed tables live under the CURRENT DATABASE's location, which
    // equals spark.sql.warehouse.dir only for the in-memory default db —
    // deriving paths from warehouse.dir under `USE analytics` (or a
    // metastore whose default-db location moved) would fingerprint an
    // empty directory, rename it over nothing, and drop the real build
    val catalog = spark.sessionState.catalog
    val dbLocation = new org.apache.hadoop.fs.Path(
      catalog.getDatabaseMetadata(catalog.getCurrentDatabase).locationUri)
    val finalPath = new org.apache.hadoop.fs.Path(dbLocation, tbl)
    val fs = finalPath.getFileSystem(spark.sessionState.newHadoopConf())

    // source fingerprint (file names + sizes + mtimes): adoption is only
    // safe while the source parquet is byte-identical to what the build
    // read — if the testdata is ever regenerated in place, a stale
    // adopted build would silently serve old rows. The fingerprint is
    // written beside _SUCCESS (underscore-prefixed → invisible to
    // readers) and must match for a leftover to count as complete.
    // Listed through the SOURCE path's own filesystem — a source on a
    // different scheme (s3a:// vs a local warehouse) would make the
    // warehouse FS throw "Wrong FS".
    val srcPath = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val srcFp = srcPath.getFileSystem(spark.sessionState.newHadoopConf())
      .listStatus(srcPath).filter(_.isFile)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("\n")
    val fpFile = "_GRAFT_SRC_FINGERPRINT"
    def isComplete = {
      val fp = new org.apache.hadoop.fs.Path(finalPath, fpFile)
      fs.exists(new org.apache.hadoop.fs.Path(finalPath, "_SUCCESS")) &&
        fs.exists(fp) && {
          val in = fs.open(fp)
          val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          val ok = got == srcFp
          if (!ok) log.warn(s"graft.Tables.bucketed: build at $finalPath " +
            s"was built from different source data (fingerprint mismatch) " +
            "— rebuilding")
          ok
        }
    }

    // an existing catalog entry is only trusted while the source
    // fingerprint still matches — the early "tableExists → return"
    // shortcut silently served STALE rows after an in-place testdata
    // regeneration (the exact failure the fingerprint exists to catch),
    // both within a session and across JVMs via the persistent metastore
    if (spark.catalog.tableExists(tbl)) {
      if (isComplete) return tbl
      log.warn(s"graft.Tables.bucketed: catalog entry $tbl points at a " +
        "build whose source fingerprint no longer matches — dropping " +
        "and rebuilding from the regenerated source")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }

    val src = load(spark, dir, name)      // one reader: build + schema DDL
    if (!isComplete) {
      val tmpTbl = tbl + "_tmp_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      src.write
        .bucketBy(buckets, key).sortBy(key)
        .mode("overwrite").saveAsTable(tmpTbl)
      // the authoritative location of the temp build — asking the
      // catalog (not assuming a path layout) keeps the fingerprint and
      // rename pointed at the directory saveAsTable actually wrote
      val tmpPath = new org.apache.hadoop.fs.Path(
        catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(tmpTbl)).location)
      val out = fs.create(new org.apache.hadoop.fs.Path(tmpPath, fpFile), true)
      try out.write(srcFp.getBytes("UTF-8")) finally out.close()
      // swap: re-check completeness (a racer may have finished during
      // our build — adopt theirs), clear a crashed leftover, rename.
      val won =
        if (isComplete) false
        else {
          if (fs.exists(finalPath)) {
            log.warn(s"graft.Tables.bucketed: clearing incomplete build " +
              s"at $finalPath (no _SUCCESS) before installing $tbl")
            fs.delete(finalPath, true)
          }
          fs.rename(tmpPath, finalPath)
        }
      // Hadoop rename onto a directory that appeared between the check
      // and the call NESTS tmp inside it and still returns true — detect
      // and remove the nested copy (it would double rows for any
      // recursive reader and leak disk)
      val nested = new org.apache.hadoop.fs.Path(finalPath, tmpTbl)
      if (fs.exists(nested)) fs.delete(nested, true)
      if (!won)
        log.info(s"graft.Tables.bucketed: lost the build race for $tbl, " +
          "discarding this session's temp build")
      // DROP removes only OUR temp catalog entry (+ its location if the
      // rename never happened)
      spark.sql(s"DROP TABLE IF EXISTS `$tmpTbl`")
    }
    // register (or re-register after a JVM restart) the catalog entry
    // over the final location, preserving the bucket spec via DDL
    try
      spark.sql(
        s"""CREATE TABLE `$tbl` (${src.schema.toDDL})
           |USING PARQUET
           |CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $buckets BUCKETS
           |LOCATION '${finalPath.toUri}'""".stripMargin)
    catch {
      // concurrent registration in this session — same table, same data
      case e: org.apache.spark.sql.AnalysisException
        if spark.catalog.tableExists(tbl) => ()
    }
    tbl
  }

  /** Append an increment into an existing bucketed table WITHOUT
    * rewriting it: new files land in the same bucket layout (hash of
    * the key → bucket id is stable), so co-located joins keep their
    * zero-exchange plans over base + increment — the incremental
    * maintenance story for write-once-bucketed fact tables. */
  def bucketedAppend(spark: SparkSession, table: String, df: DataFrame,
                     key: String, buckets: Int = 8): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode(org.apache.spark.sql.SaveMode.Append).saveAsTable(table)

  /** ORC scan — Spark's second first-class columnar format; same
    * pushdown behavior as parquet (PushedFilters/ReadSchema flow into
    * the ORC reader). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** A5: schema'd CSV scan (the reference's test fixture path,
    * `ExtractFeatureTest.java:25-31` — `textFile` + split replaced by
    * the declarative reader; schema declared, never inferred). */
  def csv(spark: SparkSession, path: String,
          schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "false").csv(path)

  /** Schema'd JSON-lines scan — the interchange format crawl dumps and
    * API exports actually arrive in. Schema DECLARED, never inferred:
    * inference reads the whole dataset once before the query even
    * plans (a full extra pass at 100 TB) and silently widens types on
    * dirty rows. Column pruning still reaches the reader (Jackson
    * parses only requested fields); predicate pushdown does not exist
    * for JSON — convert to parquet (`Sinks.writeParquet`) for anything
    * queried more than once. */
  def json(spark: SparkSession, path: String,
           schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
