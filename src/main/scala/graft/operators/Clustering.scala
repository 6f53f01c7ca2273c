package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Portable k-means clustering over an embedding column
  * (`SURVEY.md` §2 H2/H3 adjunct) — the semantic-clustering primitive
  * a corpus pipeline uses for topic bucketing, cluster-balanced
  * sampling, and IVF coarse-quantizer training
  * ([[Similarity.ivfTopK]] wraps spark.ml's KMeans; THIS one is the
  * engine-checkable twin whose every arithmetic step an external SQL
  * engine can reproduce bit-for-bit).
  *
  * Why it is exactly reproducible, when floating-point k-means
  * normally is not: a distributed centroid mean sums doubles in
  * whatever order the shuffle delivers, so two runs — let alone two
  * engines — disagree in the last ulps, and near-boundary points then
  * flip clusters. We remove the order dependence instead of rounding
  * it away: coordinates are quantized once to INTEGRAL doubles
  * (`floor(x·scale + 0.5)`, exact in IEEE for |x·scale| < 2^53), so
  * per-dimension member sums are integer-valued and therefore
  * associative-exact in ANY summation order, and each centroid
  * coordinate `sum/count` is a single exact division. Distances on
  * (integral member, rational centroid) pairs use one fixed op
  * sequence — the sequential-fold dot identity
  * `x·x − 2·x·c + c·c` — shared with the DuckDB oracle. Every engine
  * computes the identical assignment every iteration; ties break to
  * the lowest cluster id.
  *
  * Scale shape (better than spark.ml's loop): centroids are k·dim
  * driver literals (the same tiny-metadata contract as
  * [[Similarity.ivfTopK]]'s cluster centers), so the assignment step
  * is a NARROW per-row expression — k codegen'd `graft_dot` calls and
  * an argmin over a k-element struct array, no join, no shuffle of
  * the corpus, ever. Per iteration the only exchange is the
  * map-side-combined (cluster, dim) partial-sum aggregation:
  * k·dim·partitions tiny rows. Empty clusters keep their previous
  * centroid (the standard Lloyd fallback, and the only deterministic
  * choice that needs no re-seeding pass).
  *
  * Seeding: the k rows with the smallest portable seeded hash
  * `polyHash(seed ∥ id ∥ "#graft-kmeans") mod 10000` (id tie-break)
  * — engine- and layout-independent, and cheap: one bounded top-k
  * pass, no distance computations (k-means++ would cost k corpus
  * passes; the fixed-iteration budget recovers the quality).
  *
  * Reference analogue: the reference clusters activity windows only
  * implicitly via its classifiers (`RecognizeActivity.java:49-77`);
  * corpus-scale clustering is a graft extension.
  */
object Clustering {

  /** Lloyd's k-means, engine-portable (see class doc).
    *
    * @param df    input with `id` and `vec` (array&lt;float|double&gt;)
    * @param scale quantization factor (coordinates become
    *              `floor(x·scale + 0.5)`); 10000 keeps 4 decimals of
    *              a unit-scale embedding, far inside the 2^53 window
    * @return one row per DISTINCT id — exact-duplicate (id, vector)
    *         replays collapse idempotently; same-id CONFLICTING
    *         vectors refuse loudly (see buildXq): (id, cluster_id,
    *         dist2) where
    *         `cluster_id` ∈ [0, k) is the seed rank and `dist2` the
    *         quantized-space squared distance to the final centroid.
    *         With 0 &lt; n &lt; k input rows the seeding yields n
    *         clusters (the standard Lloyd degradation); an EMPTY
    *         input refuses loudly.
    */
  /** Pairwise cosine similarity between per-group embedding CENTROIDS
    * (every ordered group pair grp_a < grp_b) — embedding-SPACE drift,
    * the geometric twin of the token-level JS matrix
    * ([[CorpusQuality.jsDivergence]]): "did source A's documents move
    * away from source B's in representation space?" Also the
    * label-coherence check for a labeled corpus (near-identical label
    * centroids mean the labels don't separate).
    *
    * Bit-portable by the same move as [[kMeans]]: components quantize
    * to LONGS (`floor(x·scale + 0.5) cast long`), so the per-(group,
    * dim) sums and the dot/norm product sums are integer-exact in any
    * shuffle order — and past their range they fail LOUDLY (ANSI long
    * overflow) rather than silently drifting, the way double
    * accumulation would past 2^53. Cosine is scale-invariant so the
    * SUM vector stands in for the mean — no float op until the final
    * cosine, whose long→double conversions are deterministic, whose
    * sqrt is exactly rounded by IEEE, and whose one division is
    * deterministic. The whole matrix hash-replays in the SQL oracle
    * with zero float-order caveats (unlike the ln-based JS, which
    * leans on r(·)). Range: unit-scale embeddings at scale=10⁴ give
    * |s| ≤ 10⁴·n_grp, so s·s sums stay under 2^63 while
    * dim·(10⁴·n_grp)² < 9.2e18 — ~10⁸ docs per group at dim 64; the
    * loud overflow marks the ceiling instead of a wrong matrix.
    *
    * Shape at 100 TB: one posexplode → (group, dim) integral-sum
    * aggregation with map-side combine (state = groups × dim), the
    * component table barriered (it feeds the norms and BOTH sides of
    * the dim-join), then a |groups|²/2 × dim pair join — all
    * group-bounded however large the corpus. NULL groups and NULL
    * vectors are excluded (each family's null law). Zero-mass groups
    * cannot occur (a group exists only via ≥ 1 non-null vector);
    * zero-NORM centroids score 0.0 against everything (the
    * [[GraftFunctions.cosine]] convention). Returns
    * (grp_a, grp_b, cos). */
  def groupCentroidCosine(df: DataFrame, group: Column, vec: Column,
                          scale: Double = 10000.0): DataFrame = {
    val comp = OpUtils.barrier(
      df.filter(group.isNotNull && vec.isNotNull)
        .select(group.as("grp"), posexplode(vec).as(Seq("d", "x")))
        .groupBy(col("grp"), col("d"))
        .agg(sum(floor(col("x") * scale + lit(0.5)).cast("long")).as("s")),
      reliable = false)
    val norms = comp.groupBy(col("grp"))
      .agg(sum(col("s") * col("s")).as("n2"))
    val a = comp.select(col("grp").as("grp_a"), col("d"), col("s").as("sa"))
    val b = comp.select(col("grp").as("grp_b"), col("d"), col("s").as("sb"))
    a.join(b, a("d") === b("d") && col("grp_a") < col("grp_b"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(sum(col("sa") * col("sb")).as("dot"))
      .join(broadcast(norms.select(col("grp").as("grp_a"), col("n2").as("na"))),
        Seq("grp_a"))
      .join(broadcast(norms.select(col("grp").as("grp_b"), col("n2").as("nb"))),
        Seq("grp_b"))
      .select(col("grp_a"), col("grp_b"),
        when(col("na") === 0.0 || col("nb") === 0.0, lit(0.0))
          .otherwise(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))
          .as("cos"))
  }

  /** Per-label coherence margin — the centroid silhouette for a
    * labeled embedding corpus: for every point, own-centroid cosine
    * `a` vs the BEST other-label centroid cosine `b`; per label the
    * mean affinities, the mean margin a − b, and the fraction of
    * points a rival centroid claims (margin ≤ 0 — the confusable
    * mass). High margin = the label names a real region; a label
    * whose confused_frac is large is noise or a duplicate of its
    * rival — the label-QUALITY gate before training on weak labels
    * (q166's centroid matrix says which labels are close; this says
    * how many POINTS that closeness actually confuses).
    *
    * Determinism: centroids are the [[groupCentroidCosine]]-style
    * quantized-long SUM vectors (order-independent-exact; cosine is
    * scale-invariant so the sum stands in for the mean, and the own
    * centroid includes the point itself — the standard simplified
    * silhouette). The k·dim sums collect to driver literals (the
    * [[kMeans]] tiny-metadata contract), so scoring is a NARROW
    * per-row projection: k fused `graft_dot` cosines and two
    * when-chains — no join, no corpus shuffle; the only exchanges are
    * the (label, dim) cell aggregation and the final label-bounded
    * groupBy. The margin SIGN test (≤ 0) compares two identically-
    * derived doubles — engine-exact; the means are r(6)-masked float
    * sums like every mean in the engine.
    *
    * Needs ≥ 2 labels (a margin against no rival is undefined —
    * loud). NULL labels/vectors drop (the family law); a RAGGED
    * vector is refused in-plan by [[GraftFunctions.vectorDimGuard]]
    * (the buildXq/kMeans dim contract — without it the native dot
    * folds to the shorter length and each label's centroid dim would
    * be inferred from whatever that label happened to contain, a
    * silently wrong margin). NULL ELEMENTS inside a kept vector
    * contribute 0 to the centroid cell sums (coalesced — an all-NULL
    * (label, dim) cell is a 0 component, not a driver NPE), matching
    * the native dot/norm fold's null-as-0.0 law on the scoring side. */
  def labelCoherenceMargin(df: DataFrame, vec: Column, label: Column,
                           dim: Int,
                           scale: Double = 10000.0,
                           reliableCheckpoint: Boolean = false): DataFrame = {
    val r = graft.functions.GraftFunctions.r _
    // barrier BEFORE the centroid collect (the buildXq contract): the
    // collect pass and the scoring pass must read the SAME rows — an
    // unbarriered source re-read between the two jobs (refreshed
    // view, appended directory, non-deterministic sample) would score
    // points against stale centroids with no error. Also halves the
    // corpus reads.
    val base = OpUtils.barrier(
      df.filter(label.isNotNull && vec.isNotNull)
        .filter(graft.functions.GraftFunctions.vectorDimGuard(vec, dim))
        .select(label.cast("long").as("_l"), vec.as("_v")),
      reliableCheckpoint)
    val comps = base
      .select(col("_l"), posexplode(col("_v")).as(Seq("_d", "_x")))
      .groupBy(col("_l"), col("_d"))
      .agg(coalesce(
        sum(floor(col("_x") * scale + lit(0.5)).cast("long")), lit(0L))
        .as("_s"))
      .collect()
    val cents: Map[Long, Seq[Double]] = comps.groupBy(_.getLong(0)).map {
      case (l, rows) =>
        val arr = new Array[Double](dim)
        rows.foreach(r0 => arr(r0.getInt(1)) = r0.getLong(2).toDouble)
        l -> arr.toSeq
    }
    require(cents.size >= 2,
      s"labelCoherenceMargin needs >= 2 labels, got ${cents.size}")
    val labels = cents.keys.toSeq.sorted
    val cos: Map[Long, Column] = labels.map(l =>
      l -> graft.functions.GraftFunctions.cosine(
        col("_v"), typedLit(cents(l)))).toMap
    def ownOf(sel: Long => Column): Column =
      labels.foldRight(lit(null).cast("double")) { (l, tail) =>
        when(col("_l") === l, sel(l)).otherwise(tail)
      }
    val a = ownOf(cos)
    // greatest() requires >= 2 args — a 2-label corpus has ONE rival
    def best(cs: Seq[Column]): Column =
      if (cs.size == 1) cs.head else greatest(cs: _*)
    val b = ownOf(l => best(labels.filterNot(_ == l).map(cos)))
    base
      .withColumn("_a", a).withColumn("_b", b)
      .groupBy(col("_l"))
      .agg(count(lit(1)).as("n"),
        r(avg(col("_a")), 6).as("mean_own_cos"),
        r(avg(col("_b")), 6).as("mean_best_other"),
        r(avg(col("_a") - col("_b")), 6).as("mean_margin"),
        r(sum(when(col("_a") - col("_b") <= 0.0, 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double"), 6)
          .as("confused_frac"))
      .withColumnRenamed("_l", "label")
  }

  def kMeans(df: DataFrame, id: Column, vec: Column, k: Int, iters: Int,
             seed: String, dim: Int, scale: Long = 10000L): DataFrame = {
    val xq = buildXq(df, id, vec, dim, scale)
    val centroids = lloydLoop(xq, k, iters, seed)
    assigned(xq, centroids)
      .select(col("_id").as("id"), col("_cid").as("cluster_id"),
        col("_dist2").as("dist2"))
  }

  /** The Lloyd loop alone — final centroids (cid → mean vector in the
    * quantized space), no assignment pass. The building block for
    * operators that need the CODEBOOK rather than the clustering
    * ([[Similarity.pqTopK]]'s per-subspace product-quantization
    * codebooks). Same seeding, update rule, and empty-cluster
    * fallback as [[kMeans]] — one shared core, so the SQL oracles'
    * unrolled replay covers both. */
  private[operators] def kMeansCentroids(
      df: DataFrame, id: Column, vec: Column, k: Int, iters: Int,
      seed: String, dim: Int, scale: Long = 10000L,
      assumeUnique: Boolean = false): Seq[(Int, Seq[Double])] =
    lloydLoop(buildXq(df, id, vec, dim, scale, assumeUnique), k, iters, seed)

  private def buildXq(df: DataFrame, id: Column, vec: Column,
                      dim: Int, scale: Long,
                      assumeUnique: Boolean = false): DataFrame = {
    // quantize once; integral doubles make every downstream sum exact.
    // x·x is per-row constant across iterations — compute it behind the
    // same barrier. `dim` is ENFORCED in-plan: a ragged vector would
    // silently fold to its short length in the min-length dot product
    // and corrupt the assignment with no error.
    // ONE in-plan assert with a case-selected message: separate
    // null-vec / null-id / dim filters could be reordered by the
    // optimizer, and then a NULL row would die on the dim assert with
    // a misleading ragged-vector diagnosis (size(NULL) is NULL and
    // assert_true(NULL) raises).
    val rowOk =
      when(col("_id").isNull || col("_xq").isNull, lit(false))
        .otherwise(size(col("_xq")) === dim)
    val rowMsg =
      when(col("_id").isNull,
        lit("Clustering.kMeans: NULL id — ids must be non-null (they " +
          "key the deterministic seeding and the output rows)"))
      .when(col("_xq").isNull,
        lit("Clustering.kMeans: NULL vector — filter or impute " +
          "upstream; a NULL row cannot be assigned to any cluster"))
      .otherwise(lit(s"Clustering.kMeans: vector length must equal dim=$dim"))
    // exact-replica idempotence (the id-keyed family law, PLANS.md
    // round 14): a replayed producer re-emitting the SAME (id, vector)
    // row must not re-weight any centroid mean — replicas collapse in
    // ONE map-side-combinable hash aggregation (the only exchange this
    // operator ever runs on the corpus). An id carrying CONFLICTING
    // vectors has no deterministic resolution here (no version column)
    // and refuses loudly — resolve upstream (e.g. the CDC merge) —
    // detected as min ≠ max of the quantized vector's hash (collision
    // risk 2^-64 per id, the xxhash64 tie-break precedent above).
    //
    // `assumeUnique = true` is the caller's CONTRACT that ids are
    // already distinct (Similarity's trained-index entry points dedup
    // and checkpoint both sides ONCE via the same law before slicing
    // subspaces) — it skips this aggregation, removing a redundant
    // corpus exchange per codebook training (r14 bench: the PQ family
    // paid it 9× per query). The dedup groupBy (or the pre-deduped,
    // already-spread checkpoint input) is the parallelism spread, so
    // no extra repartition is needed in either mode; the lazy
    // localCheckpoint stores the quantized rows so the per-iteration
    // consumers never re-evaluate the transform.
    val quant = df.select(
        id.as("_id"),
        transform(vec, x =>
          floor(x.cast("double") * lit(scale.toDouble) + lit(0.5)).cast("double"))
          .as("_xq"))
      .filter(coalesce(assert_true(rowOk, rowMsg), lit(true)))
    val deduped =
      if (assumeUnique) quant
      else quant
        .groupBy(col("_id"))
        .agg(first(col("_xq")).as("_xq"),
          min(xxhash64(col("_xq"))).as("_h1"),
          max(xxhash64(col("_xq"))).as("_h2"))
        .filter(coalesce(assert_true(col("_h1") === col("_h2"),
          lit("Clustering.kMeans: duplicate id with CONFLICTING " +
            "vectors — exact replays collapse idempotently, but " +
            "same-id different-vector rows need a resolution pass " +
            "(e.g. CDC merge / latest-version filter) upstream")),
          lit(true)))
        .select(col("_id"), col("_xq"))
    deduped.withColumn("_xx", dotProduct(col("_xq"), col("_xq")))
      .localCheckpoint(false) // consumed once per iteration + final pass
  }

  /** ALL `slices` per-slice Lloyd loops fused into ONE driver loop —
    * the PQ-codebook shape ([[Similarity]] trains m independent
    * codebooks over contiguous `sliceLen` sub-vectors of the same
    * corpus): instead of m sequential loops of (seed pass + `iters`
    * update passes) each, the slices ride ONE exploded (slice, subvec)
    * table, the seed pass is one bounded-heap top-k per slice (the
    * TopKRewrite plans the row_number ≤ k window as TopKPerGroup), and
    * each update pass is one job whose (slice, cid, pos) integral sums
    * cover every codebook — 3 jobs total instead of 3·m (r14 bench:
    * the PQ family's dominant cost). Per-slice arithmetic is UNCHANGED:
    * the same quantization, the same portable seed key (the in-plan
    * seed string `seedPrefix ∥ slice` concatenates to exactly the
    * per-slice literal the sequential loop hashes), the same
    * integral-double sums (associative-exact in any order), the same
    * empty-cluster fallback — so the returned codebooks are
    * bit-identical to `slices` separate [[kMeansCentroids]] calls and
    * the unrolled per-subspace SQL oracles still replay them.
    *
    * Input contract (the [[Similarity]] prepKeyed contract): ids
    * deduped upstream; NULL ids and ragged vectors refuse loudly with
    * the kMeans family messages. Returns codebooks slice-ascending. */
  private[operators] def kMeansCentroidsFused(
      df: DataFrame, id: Column, vec: Column, k: Int, iters: Int,
      seedPrefix: String, slices: Int, sliceLen: Int,
      scale: Long = 10000L): Seq[Seq[(Int, Seq[Double])]] = {
    require(k >= 1 && iters >= 1,
      s"need k >= 1 and iters >= 1, got k=$k iters=$iters")
    require(slices >= 1 && sliceLen >= 1,
      s"need slices, sliceLen >= 1: $slices/$sliceLen")
    val sliceCols = (0 until slices).map { s =>
      transform(slice(vec, s * sliceLen + 1, sliceLen), x =>
        floor(x.cast("double") * lit(scale.toDouble) + lit(0.5)).cast("double"))
    }
    val rowOk =
      when(col("_id").isNull || col("_xq").isNull, lit(false))
        .otherwise(size(col("_xq")) === sliceLen)
    val rowMsg =
      when(col("_id").isNull,
        lit("Clustering.kMeans: NULL id — ids must be non-null (they " +
          "key the deterministic seeding and the output rows)"))
      .when(col("_xq").isNull,
        lit("Clustering.kMeans: NULL vector — filter or impute " +
          "upstream; a NULL row cannot be assigned to any cluster"))
      .otherwise(lit(s"Clustering.kMeans: vector length must equal dim=$sliceLen"))
    val xqm = df
      .select(id.as("_id"), posexplode(array(sliceCols: _*)).as(Seq("_s", "_xq")))
      .filter(coalesce(assert_true(rowOk, rowMsg), lit(true)))
      .withColumn("_xx", dotProduct(col("_xq"), col("_xq")))
      .localCheckpoint(false) // shared by the seed pass + every update pass
    lloydCentsInPlan(xqm,
      concat(lit(seedPrefix), col("_s").cast("string"),
        col("_id").cast("string"), lit("#graft-kmeans")),
      k, iters, slices).toSeq
  }

  /** The Lloyd loop as ONE Spark action (r15): seeds, every update
    * pass, and the empty-cluster fallback are chained lazily through
    * tiny (slice, cid, cvec) frames — the driver collects ONLY the
    * final centroids, instead of one blocking collect per pass with a
    * freshly planned k·dim-literal assignment chain each time (r14's
    * remaining PQ cost: ~3 driver round-trips + literal-churn codegen
    * per training). Each intermediate frame is pinned with a lazy
    * `localCheckpoint`, so both of its consumers (the broadcast
    * assignment side and the fallback join's left side) share ONE
    * computed RDD — evaluation stays linear in `iters`, never
    * re-expanding the lineage.
    *
    * Per-slice arithmetic is UNCHANGED from the sequential loop:
    *  - seeds: per slice the k smallest (portable hash, id, vec-hash)
    *    rows, cid = rank − 1 — the exact key and order the collected
    *    zipWithIndex produced;
    *  - assignment: lexicographic (dist², cid) struct min where
    *    dist² = x·x − 2·x·c + c·c; c·c is `graft_dot(c, c)` — the
    *    SAME sequential multiply-add fold the driver's
    *    `foldLeft(0.0)((a,v) => a + v*v)` ran, so every distance is
    *    bit-identical whether c arrives as a literal or a column (the
    *    argmin is order-independent: (dist², cid) is a total order,
    *    so the collect_list order into the codebook array is
    *    irrelevant);
    *  - update: the same (slice, cid, pos) integral sums and exact
    *    per-coordinate division; empty clusters keep their previous
    *    centroid via the left-join coalesce.
    * The returned codebooks are therefore bit-identical to the
    * sequential collect-per-pass loop and the unrolled SQL oracles
    * still replay them. */
  private def lloydCentsInPlan(xqm: DataFrame, seedKey: Column, k: Int,
                               iters: Int, slices: Int)
      : Array[Seq[(Int, Seq[Double])]] = {
    val seeds = xqm
      .withColumn("_h", pmod(polyHash(seedKey), lit(10000L)))
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("_s"))
          .orderBy(col("_h"), col("_id"), xxhash64(col("_xq")))))
      .filter(col("_rn") <= k)
      .select(col("_s"), (col("_rn") - 1).cast("int").as("_cid"),
        col("_xq").as("_cvec"))
    var cents = seeds.localCheckpoint(false)
    for (_ <- 1 to iters) {
      // per-slice codebook array, broadcast onto the corpus rows; the
      // per-row argmin is the same (dist², cid) struct min as the
      // literal form, over the row's OWN slice's centroids
      val cb = cents.groupBy(col("_s"))
        .agg(collect_list(struct(col("_cid"), col("_cvec"))).as("_cb"))
      val best = array_sort(transform(col("_cb"), c =>
        struct(
          (col("_xx")
            - lit(2.0) * dotProduct(col("_xq"), c.getField("_cvec"))
            + dotProduct(c.getField("_cvec"), c.getField("_cvec")))
            .as("_dist2"),
          c.getField("_cid").as("_cid"))))
        .getItem(0).getField("_cid")
      val updated = xqm.join(broadcast(cb), Seq("_s"))
        .withColumn("_cid", best)
        .select(col("_s"), col("_cid"), posexplode(col("_xq")).as(Seq("_pos", "_v")))
        .groupBy(col("_s"), col("_cid"), col("_pos"))
        .agg(sum(col("_v")).as("_sm"), count(lit(1)).as("_n"))
        .groupBy(col("_s"), col("_cid"))
        .agg(transform(array_sort(collect_list(struct(col("_pos"), col("_sm"), col("_n")))),
          t => t.getField("_sm") / t.getField("_n").cast("double")).as("_uvec"))
      cents = cents.join(updated, Seq("_s", "_cid"), "left")
        .select(col("_s"), col("_cid"),
          coalesce(col("_uvec"), col("_cvec")).as("_cvec"))
        .localCheckpoint(false)
    }
    val rows = cents.collect()
    require(rows.nonEmpty,
      "Clustering.kMeans: input is empty (0 rows after upstream " +
        "filters) — nothing to cluster")
    Array.tabulate(slices) { s =>
      rows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
        .map(r => (r.getInt(1), r.getSeq[Double](2))).toSeq
    }
  }

  private def lloydLoop(xq: DataFrame, k: Int, iters: Int,
                        seed: String): Seq[(Int, Seq[Double])] = {
    require(k >= 1 && iters >= 1, s"need k >= 1 and iters >= 1, got k=$k iters=$iters")
    // the slices = 1 instance of the fused in-plan loop (ONE Spark
    // action for seeds + every update — r15): the seed key is the
    // portable (hash, id, vec-hash) order the SQL oracle replays — a
    // single-slice window rank ≤ k IS the old global orderBy+limit(k),
    // and cid = rank − 1 the old zipWithIndex. The vector-hash third
    // key only disambiguates DUPLICATE ids (two rows sharing (_h, _id)
    // would otherwise seed nondeterministically run to run) — with
    // unique ids, the contract, it never engages, so oracle parity is
    // untouched. Update rule, integral-exact sums, and empty-cluster
    // fallback all live in [[lloydCentsInPlan]].
    lloydCentsInPlan(xq.withColumn("_s", lit(0)),
      concat(lit(seed), col("_id").cast("string"), lit("#graft-kmeans")),
      k, iters, slices = 1).head
  }

  // narrow argmin: k distances per row from centroid LITERALS, best =
  // lexicographic min of (dist2, cid) structs — no join, no shuffle.
  private def assigned(xq: DataFrame,
                       cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val distCols = cents.map { case (cid, cv) =>
      // c·c on the driver with the SAME left fold over products the
      // engines' sequential dot uses — one canonical value everywhere
      val cc = cv.foldLeft(0.0)((a, v) => a + v * v)
      struct(
        (col("_xx") - lit(2.0) * dotProduct(col("_xq"), typedLit(cv)) + lit(cc))
          .as("_dist2"),
        lit(cid).as("_cid"))
    }
    xq.withColumn("_best", array_sort(array(distCols: _*)).getItem(0))
      .select(col("_id"), col("_xq"),
        col("_best").getField("_cid").as("_cid"),
        col("_best").getField("_dist2").as("_dist2"))
  }
}
