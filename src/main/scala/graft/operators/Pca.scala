package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{VecMomentsExpression, VectorFunctions}

/** Principal-component analysis over an embedding column — the
  * dimensionality-reduction stage the semantic-dedup literature runs
  * BEFORE clustering/ANN (SemDeDup clusters PCA'd embeddings; spectral
  * quality filters rank corpus slices by leading-component energy).
  *
  * Spark-first split of the classic algorithm:
  *  - the DATA-sized work — count, mean, Gram matrix — is ONE corpus
  *    pass through [[graft.functions.VecMomentsExpression]], a
  *    bounded O(d²)-state Catalyst aggregate with map-side partials
  *    (no d²-row explode, no second pass for the mean);
  *  - the MODEL-sized work — the d×d eigendecomposition — runs on the
  *    driver over the one collected moments row (cyclic Jacobi,
  *    deterministic sweep order, no RNG). d ≤ 512 by the aggregate's
  *    own guard, so the driver step is microseconds-to-milliseconds
  *    whatever the corpus size: this is the same bounded-collect shape
  *    as the k-means quantizer ([[Similarity.kmeansRefine]]).
  *
  * Projection is a narrow, shuffle-free map: each component is folded
  * to `x·w − mean·w` with the `mean·w` half precomputed on the driver,
  * so a row costs k codegen'd dot kernels and centering costs nothing
  * per row. Exact copies project to IDENTICAL vectors (same input,
  * same literal weights, same arithmetic), which is what makes the
  * planted-copy gate (`q_sim_pca_topk`) engine-portable even though
  * covariance sums are floating-point.
  */
object Pca {

  /** A fitted PCA model: `components` holds the top-k unit
    * eigenvectors of the covariance matrix (rows, length `dim`),
    * eigenvalue-descending; `totalVariance` is the covariance trace,
    * so `explainedVariance` is the usual captured-energy ratio.
    * Eigenvector signs are normalized (largest-|component| entry
    * positive, lowest index on ties) so a refit of the same data
    * reproduces the same model up to floating-point noise.
    */
  case class PcaModel(
      dim: Int,
      k: Int,
      count: Long,
      mean: Seq[Double],
      components: Seq[Seq[Double]],
      eigenvalues: Seq[Double],
      totalVariance: Double) {
    def explainedVariance: Double =
      if (totalVariance <= 0.0) 0.0 else eigenvalues.sum / totalVariance
  }

  /** Fit a PCA model: one distributed moments pass, then the driver
    * eigensolve. `dim` is declared (not sniffed) so a ragged corpus
    * fails loudly inside the aggregate, not with a misshaped model.
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"components k must be in [1, dim=$dim], got $k")
    // bounded collect BY CONSTRUCTION: a global aggregate yields one
    // row of 1 + d + d(d+1)/2 doubles (d ≤ 512 → ≤ ~1 MB)
    val row = df.agg(
      VecMomentsExpression.vecMoments(col(vecCol), dim).as("m")).head()
    modelFromBuffer(row.getSeq[Double](0).toArray, dim, k)
  }

  /** The projection as a Column: component j of the output is
    * `dot(vec, w_j) − mean·w_j`, with the constant half computed once
    * on the driver — centering without per-row vector subtraction.
    * `whiten = true` additionally scales component j by `1/√λ_j`
    * (folded into the literal weights, so whitening is free per row) —
    * unit variance per retained direction, the Mahalanobis-flavored
    * space SemDeDup-style pipelines cluster in. Degenerate directions
    * stay unscaled rather than exploding; "degenerate" is judged
    * RELATIVE to the model's top eigenvalue (λ ≤ 1e-12·λ_max), so
    * small-magnitude but well-conditioned data still whitens.
    */
  def projectionColumn(
      model: PcaModel, vec: Column, whiten: Boolean = false): Column = {
    val evMax = if (model.eigenvalues.isEmpty) 0.0 else model.eigenvalues.max
    val planes = typedlit(model.components.zip(model.eigenvalues).map {
      case (w, ev) =>
        val s = if (whiten && ev > 1e-12 * evMax && evMax > 0.0)
          1.0 / math.sqrt(ev) else 1.0
        (w.map(_ * s), w.zip(model.mean).map { case (wi, mi) => wi * mi }.sum * s)
    })
    val v = vec.cast("array<double>")
    transform(planes, p =>
      VectorFunctions.dot(v, p.getField("_1")) - p.getField("_2"))
  }

  /** Project a frame's vector column onto the model's components. */
  def project(
      df: DataFrame,
      vecCol: String,
      model: PcaModel,
      outCol: String = "pca",
      whiten: Boolean = false
  ): DataFrame =
    df.withColumn(outCol, projectionColumn(model, col(vecCol), whiten))

  /** End-to-end reduced-space exact search: fit on the corpus, project
    * both sides, brute-force cosine top-k in k-dim space — the
    * SemDeDup-style "cheap exact search after a good linear squeeze".
    * The corpus pays one moments pass + one projection map; per-query
    * cost drops by dim/k versus full-width brute force.
    */
  def pcaTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      corpusIdCol: String,
      corpusVecCol: String,
      dim: Int,
      nComponents: Int,
      k: Int
  ): DataFrame =
    pcaTopKWithModel(queries, corpus, queryIdCol, queryVecCol,
      corpusIdCol, corpusVecCol, fit(corpus, corpusVecCol, dim, nComponents), k)

  /** [[pcaTopK]] with a caller-supplied model — the serving half when
    * the projector comes from [[readPcaModel]] or [[fitFromMoments]]
    * instead of an inline fit.
    */
  def pcaTopKWithModel(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      corpusIdCol: String,
      corpusVecCol: String,
      model: PcaModel,
      k: Int
  ): DataFrame = {
    val q = project(queries, queryVecCol, model, "__p")
      .select(col(queryIdCol), col("__p"))
    val c = project(corpus, corpusVecCol, model, "__p")
      .select(col(corpusIdCol), col("__p"))
    Similarity.bruteForceTopK(q, c, queryIdCol, "__p", corpusIdCol, "__p", k)
  }

  /** Persist a fitted model — the train-once/score-many shape of the
    * index families applied to the projector: `<table>` holds one row
    * per component (comp_id, eigenvalue, component) and `<table>_meta`
    * one row of (dim, k, n, total_variance, mean). Self-describing;
    * to incorporate new data, refit — the moments pass is the cost.
    */
  def writePcaModel(spark: SparkSession, model: PcaModel, tableName: String): Unit = {
    import spark.implicits._
    model.components.zip(model.eigenvalues).zipWithIndex
      .map { case ((comp, ev), idx) => (idx, ev, comp) }
      .toDF("comp_id", "eigenvalue", "component")
      .write.mode("overwrite").format("parquet").saveAsTable(tableName)
    Seq((model.dim, model.k, model.count, model.totalVariance, model.mean))
      .toDF("dim", "k", "n", "total_variance", "mean")
      .write.mode("overwrite").format("parquet").saveAsTable(tableName + "_meta")
    spark.catalog.refreshTable(tableName)
    spark.catalog.refreshTable(tableName + "_meta")
  }

  /** Load a persisted model ([[writePcaModel]]). Both reads are
    * bounded by construction: k component rows + one meta row.
    */
  def readPcaModel(spark: SparkSession, tableName: String): PcaModel = {
    val meta = spark.table(tableName + "_meta").head()
    val comps = spark.table(tableName)
      .orderBy(col("comp_id")).collect()
    PcaModel(
      dim = meta.getAs[Int]("dim"),
      k = meta.getAs[Int]("k"),
      count = meta.getAs[Long]("n"),
      mean = meta.getAs[scala.collection.Seq[Double]]("mean").toSeq,
      components = comps.map(_.getAs[scala.collection.Seq[Double]]("component").toSeq).toSeq,
      eigenvalues = comps.map(_.getAs[Double]("eigenvalue")).toSeq,
      totalVariance = meta.getAs[Double]("total_variance"))
  }

  /** Sampled ground-truth recall of the PCA squeeze — the same honest
    * telemetry [[Similarity.ivfRecallProbe]] gives the IVF index: a
    * deterministic portable-hash sample of the corpus queries BOTH
    * paths — exact full-width cosine top-k (ground truth) and the
    * reduced-space top-k under the fitted projector — and recall is
    * the exact integer fraction of ground-truth neighbors the squeeze
    * preserved. Run it when choosing `nComponents`: the first k whose
    * recall clears the application's bar is the cheapest safe squeeze.
    *
    * Cost, stated honestly: both sides scan the corpus against
    * `nQueries` broadcast queries — the labeled-audit tier; run it
    * between epochs at bounded `nQueries`, not per batch.
    * Deterministic end to end (hash-ordered sample, tie-broken ranks).
    *
    * @return recall in ppm: matched pairs · 10⁶ div ground-truth pairs
    */
  def pcaRecallProbe(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nComponents: Int,
      nQueries: Int = 32,
      k: Int = 10): Long = {
    require(nQueries > 0 && k > 0)
    val live = df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    val queries = live
      .orderBy(graft.operators.Corpus.portableHash(col("vec_id")), col("vec_id"))
      .limit(nQueries)
      .localCheckpoint(true) // one sample frame feeds both paths
    val truth = Similarity.bruteForceTopK(queries, live,
      "vec_id", "embedding", "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
    val got = pcaTopK(queries, live, "vec_id", "embedding",
      "vec_id", "embedding", dim, nComponents, k)
      .select(col("query_id"), col("neighbor_id"))
    val r = truth.join(got, Seq("query_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("hit"))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n"))))
      .select(call_function("div", col("hit") * lit(1000000L), col("n")))
      .head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  // ------------------------------------------ persisted moments lifecycle

  /** Persist one batch's moments as a single `(batch_id, dim, buf)`
    * row, append-mode — the PCA analog of the index families' O(batch)
    * epoch appends. Moments are EXACTLY mergeable (element-wise sums),
    * so a streaming corpus keeps its projector current by appending
    * one bounded row per epoch and refitting from the stored rows
    * ([[fitFromMoments]]) — no corpus re-scan, ever.
    *
    * Replay safety: appends are idempotent BY KEY — a re-run epoch
    * re-appends its `batchId` and [[fitFromMoments]] keeps exactly one
    * row per key (the array-minimum, a deterministic pick among
    * float-ulp twins), so a crashed-and-retried epoch can't
    * double-count. Choose batch ids the way the index families do:
    * stable per epoch, never reused across different data.
    *
    * Takedown note: moments rows hold only corpus-level SUMS — no
    * per-document residue exists to audit, so this table is not a
    * [[graft.verify.Takedown]] surface. A takedown's effect on the
    * projector is statistical; rebuild the moments table when the
    * deleted mass matters (compare [[momentsStats]]' n_rows with the
    * live corpus).
    */
  def appendMoments(
      batch: DataFrame,
      vecCol: String,
      dim: Int,
      batchId: Long,
      tableName: String
  ): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val row = batch.agg(
      VecMomentsExpression.vecMoments(col(vecCol), dim).as("m")).head()
    val buf = row.getSeq[Double](0)
    Seq((batchId, dim, buf)).toDF("batch_id", "dim", "buf")
      .write.mode(if (spark.catalog.tableExists(tableName)) "append" else "overwrite")
      .format("parquet").saveAsTable(tableName)
    spark.catalog.refreshTable(tableName)
  }

  /** Fit a model from persisted per-batch moments rows: dedupe by
    * batch_id (replay twins collapse), element-wise-sum the buffers —
    * a position-keyed aggregate over `batches × bufLen` values, never
    * a corpus scan — then the same driver eigensolve as [[fit]].
    * Appending batch B to batches A and refitting equals fitting A∪B
    * up to float-sum ordering; exact copies still project identically,
    * so the planted-copy gate holds for the from-moments path too.
    */
  def fitFromMoments(spark: SparkSession, tableName: String, k: Int): PcaModel = {
    val t = spark.table(tableName)
    val dims = t.select(col("dim")).distinct().collect().map(_.getInt(0))
    require(dims.length == 1,
      s"moments table $tableName mixes dims ${dims.mkString(",")}")
    val dim = dims.head
    val deduped = t.groupBy(col("batch_id")).agg(min(col("buf")).as("buf"))
    // bounded collect BY CONSTRUCTION: one summed row of bufLen doubles
    val summed = deduped
      .select(posexplode(col("buf")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(sum(col("v")).as("s"))
      .orderBy(col("pos"))
      .collect().map(_.getDouble(1))
    modelFromBuffer(summed, dim, k)
  }

  /** Batch count / row count / dim telemetry for a moments table —
    * the staleness surface: compare `n_rows` with the live corpus to
    * decide when the projector needs a refit from scratch (moments
    * only ever ADD; deletions require rebuilding the table).
    */
  def momentsStats(spark: SparkSession, tableName: String): DataFrame = {
    val t = spark.table(tableName)
    t.groupBy(col("batch_id")).agg(min(col("buf")).as("buf"), min(col("dim")).as("dim"))
      .agg(count(lit(1)).as("n_batches"),
        sum(element_at(col("buf"), 1)).cast("long").as("n_rows"),
        min(col("dim")).as("dim"))
  }

  private def modelFromBuffer(buf: Array[Double], dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"components k must be in [1, dim=$dim], got $k")
    val n = buf(0)
    require(n >= 2.0, s"PCA needs at least 2 rows, got ${n.toLong}")
    val mean = Array.tabulate(dim)(i => buf(1 + i) / n)
    // Covariance via E[xy] − E[x]E[y] from the raw second moments. This
    // single-pass form is numerically fine for the unit-scale embedding
    // vectors this tier targets, but it cancels catastrophically when a
    // dimension's mean magnitude dwarfs its variance (large un-centered
    // offsets, e.g. raw feature columns around 1e6 with variance ~1):
    // shift such inputs toward zero (subtract a per-dimension pivot)
    // before calling fit/appendMoments.
    val cov = Array.ofDim[Double](dim, dim)
    var tri = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = buf(tri) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        tri += 1
        j += 1
      }
      i += 1
    }
    val trace = (0 until dim).map(d0 => cov(d0)(d0)).sum
    val (evals, evecs) = jacobiEigen(cov)
    val order = (0 until dim).sortBy(idx => (-evals(idx), idx)).take(k)
    val comps = order.map { idx =>
      val v = Array.tabulate(dim)(r => evecs(r)(idx))
      val pivot = v.indices.maxBy(p => (math.abs(v(p)), -p))
      if (v(pivot) < 0.0) v.map(x => -x).toSeq else v.toSeq
    }
    PcaModel(dim, k, n.toLong, mean.toSeq, comps,
      order.map(idx => math.max(evals(idx), 0.0)), math.max(trace, 0.0))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * Deterministic — fixed (p,q) sweep order, no pivot search RNG —
    * and O(d³) per sweep with ≤ 64 sweeps on a d ≤ 512 driver-held
    * matrix. Convergence threshold is relative to the matrix scale so
    * near-zero covariances (constant columns) terminate immediately.
    */
  private[operators] def jacobiEigen(
      a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = a.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val scale = math.max((0 until d).map(i => math.abs(m(i)(i))).max, 1e-300)
    val tol = 1e-13 * scale
    var sweep = 0
    var maxOff = Double.MaxValue
    while (sweep < 64 && maxOff > tol) {
      maxOff = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = m(p)(q)
          if (math.abs(apq) > maxOff) maxOff = math.abs(apq)
          if (math.abs(apq) > tol) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0.0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val mrp = m(r)(p); val mrq = m(r)(q)
              m(r)(p) = c * mrp - s * mrq
              m(r)(q) = s * mrp + c * mrq
              r += 1
            }
            r = 0
            while (r < d) {
              val mpr = m(p)(r); val mqr = m(q)(r)
              m(p)(r) = c * mpr - s * mqr
              m(q)(r) = s * mpr + c * mqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => m(i)(i)), v)
  }
}
