package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.LongArrayDot.dotLong

/** Distributed Lloyd's k-means over the embedding corpus — the in-engine
  * trainer for the IVF coarse quantizer ([[Similarity.ivfTopK]] routes by
  * nearest centroid; this op is where those centroids come from, replacing
  * the testdata's pre-assigned `label` column with learned cells).
  *
  * Built the way MLlib trains k-means, but engine-portable:
  *  - Every per-vector computation is quantized to fixed point
  *    (`floor(x·1e6)` longs, the [[graft.functions.QuantizedDot]]
  *    convention) so distances are EXACT integers — no float-sum
  *    nondeterminism across partitionings or engines.
  *  - Assignment = the k×Dim centroid table (the model — tiny by
  *    definition) rides into a compiled per-partition argmin kernel
  *    (`|x−c|² = x·x − 2x·c + c·c`, the x·x term precomputed once per
  *    vector; ties to the smallest cluster id) — n·k·Dim fused integer
  *    multiply-adds with NO n×k row materialization (r11; the r1–r10
  *    broadcast-crossJoin + min(struct) aggregate computed the same
  *    integers through an n×k-row shuffle-combine).
  *  - Update = posexplode to (cluster, dim, q) cells and sum/count — also
  *    map-side combinable; the k×Dim result collects to the driver (the
  *    standard Lloyd's driver-sync; it is the model, not data).
  *  - Centroid means divide in double (`floor(sum/count)`): both sum
  *    (≤ n·1e6 < 2^53) and quotient are exactly representable/correctly
  *    rounded IEEE, so the floor is engine-identical.
  *  - Seeding is content-deterministic: the k vectors with the smallest
  *    `md5("km|" ++ vec_id)` — a TakeOrdered top-k, no RNG state.
  *  - Empty clusters keep their previous centroid (documented, mirrored in
  *    the oracle) instead of vanishing.
  *
  * The oracle unrolls the same iterations in DuckDB SQL (zip-unnest for
  * per-dim sums, window argmin with the same tie-break), so the LEARNED
  * MODEL is hash-checked cross-engine, not just "some clusters exist".
  */
object KMeans {
  val Dim: Int = Similarity.Dim
  val K = 8
  val Iters = 2

  /** Training-sample cap: Lloyd's iterations run on the `TrainCap` vectors
    * with the smallest `md5("km|" ++ vec_id)` (the same deterministic
    * hash-order the seeds come from, so seeds ⊂ sample by construction),
    * and only the FINAL assignment touches the full corpus — standard
    * bounded-sample quantizer training (FAISS practice recommends
    * ~39–256 training points per centroid; 4096 is 512× k=8). Training
    * cost is therefore independent of corpus size. At the verification
    * volume (n ≤ cap) the sample IS the corpus, so the learned model —
    * and every oracle hash downstream — is unchanged there.
    */
  val TrainCap = 4096

  /** floor(x·1e6) per element — the QuantizedDot fixed-point convention. */
  private[ops] def quantize(emb: org.apache.spark.sql.Column) =
    transform(emb, x => floor(x.cast("double") * 1e6).cast("long"))

  /** Quantized corpus: (vec_id, xq, x·x), malformed vectors dropped up
    * front (a NULL distance would otherwise win Spark's nulls-first argmin
    * while losing DuckDB's nulls-last one). `dim` ≠ [[Dim]] when training
    * a PQ subspace on pre-sliced vectors ([[PQ]]).
    */
  private def corpus(embeddings: DataFrame, dim: Int = Dim): DataFrame =
    embeddings
      .filter(col("embedding").isNotNull && size(col("embedding")) === dim)
      .repartition(col("vec_id")) // single-split parquet → spread the work
      .select(col("vec_id"), quantize(col("embedding")).as("xq"))
      .withColumn("xx", dotLong(col("xq"), col("xq")))
      .cache()

  private def seedCentroids(xq: DataFrame, k: Int): Array[(Int, Array[Long])] =
    xq.select(col("vec_id"), col("xq"),
        md5(concat(lit("km|"), col("vec_id").cast("string"))).as("h"))
      .orderBy(col("h"), col("vec_id"))
      .limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getAs[scala.collection.Seq[Long]]("xq").toArray) }

  /** Nearest-centroid assignment: (vec_id, cluster) — a compiled
    * per-partition argmin kernel. Replaces the r1–r10
    * crossJoin(broadcast centroids) → groupBy-min form, whose cost was
    * MATERIALIZING n·k candidate rows through an aggregation: at the 200×
    * probe (1M vectors × adaptive k=512) that aggregation alone ran ~75 s
    * (`SCALEPROBE_r10_200x.json` ann_ivf_trained) while the useful work —
    * n·k·Dim integer multiply-adds — is ~2 s of JIT-compiled loop across
    * 32 threads. Bit-identical results (same fixed-point integers, same
    * smallest-(dist, cluster) tie-break), so every trained-model oracle
    * hash is unchanged; only the n·k row blowup is gone.
    */
  private def assign(xq: DataFrame, cents: Array[(Int, Array[Long])]): DataFrame = {
    val spark = xq.sparkSession
    import spark.implicits._
    val ordered = cents.sortBy(_._1)
    val ids = ordered.map(_._1)
    val dim = ordered.head._2.length
    val flat = ordered.flatMap(_._2) // k×dim, row-major — cache-friendly scan
    val cc = ordered.map { case (_, cq) => cq.map(v => v * v).sum }
    val k = ids.length
    xq.select(col("vec_id"), col("xq"), col("xx"))
      .as[(Long, scala.collection.Seq[Long], Long)]
      .mapPartitions { it =>
        it.map { case (id, xqSeq, xx) =>
          val x = xqSeq.toArray
          var best = 0
          var bestD = Long.MaxValue
          var c = 0
          while (c < k) {
            var dot = 0L
            val off = c * dim
            var d = 0
            while (d < dim) { dot += x(d) * flat(off + d); d += 1 }
            val dist = xx - 2L * dot + cc(c)
            // strict < over ascending cluster ids == min(struct(dist, c)):
            // equal distances keep the smaller cluster id
            if (dist < bestD) { bestD = dist; best = ids(c) }
            c += 1
          }
          (id, best)
        }
      }.toDF("vec_id", "cluster")
  }

  /** One Lloyd's update; clusters with no members keep `prev`'s centroid. */
  private def updateCentroids(
      xq: DataFrame, assigned: DataFrame,
      prev: Array[(Int, Array[Long])], dim: Int = Dim): Array[(Int, Array[Long])] = {
    val cells = assigned.join(xq, "vec_id")
      .select(col("cluster"), posexplode(col("xq")).as(Seq("dim", "v")))
      .groupBy("cluster", "dim")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .withColumn("cq", floor(col("s").cast("double") / col("n")).cast("long"))
      .collect()
    val byCluster = cells.groupBy(_.getAs[Int]("cluster")).map { case (c, rows) =>
      val arr = new Array[Long](dim)
      rows.foreach(r => arr(r.getAs[Int]("dim")) = r.getAs[Long]("cq"))
      c -> arr
    }
    prev.map { case (c, old) => (c, byCluster.getOrElse(c, old)) }
  }

  /** Session-scoped trained-model memo, keyed by the CANONICALIZED logical
    * plan of the input corpus (+ k, iters): structural plan equality, so
    * the same corpus read through the same lineage trains ONCE per session
    * and every consumer (q68 model dump, q69 trained search, q76 serving
    * assignment, streaming serve) shares the k×Dim-long artifact — a model
    * registry, the same reuse a production train→index→serve loop has.
    * Values are tiny (k·Dim longs) and deterministic in the input, so
    * memoization cannot change any result, only skip repeated training.
    *
    * Bounded LRU (r14 VERDICT #5), same pattern and rationale as
    * [[graft.ops.PQ]] `refineCache` / [[Similarity]] `tuneCache`: the key
    * retains the full canonicalized logical plan (and, through
    * `LogicalRelation`, file-index state), so a long-lived session
    * training against many distinct corpora would otherwise accumulate
    * analyzed plans forever. 32 entries covers any realistic number of
    * concurrently-served models while keeping retention O(1). Same
    * same-plan-same-data assumption: files under a memoized plan are
    * immutable for the session; new corpus snapshot = new path = new plan
    * = fresh training.
    */
  private val modelCache = graft.util.BoundedLru[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int, Int, Int),
    Array[(Int, Array[Long])]]()

  /** The md5-prefix training sample: first [[TrainCap]] vectors in the
    * seed hash order, eagerly materialized (localCheckpoint) so every
    * Lloyd's pass reads ~cap·dim longs of local blocks instead of
    * re-running the TakeOrdered; repartitioned back out because the
    * top-cap collapses to one partition.
    */
  private def trainingSample(xq: DataFrame): DataFrame =
    xq.select(col("vec_id"), col("xq"), col("xx"),
        md5(concat(lit("km|"), col("vec_id").cast("string"))).as("h"))
      .orderBy(col("h"), col("vec_id"))
      .limit(TrainCap)
      .drop("h")
      .repartition(col("vec_id"))
      .localCheckpoint()

  private def trainModel(
      embeddings: DataFrame, k: Int, iters: Int,
      dim: Int = Dim): Array[(Int, Array[Long])] = {
    val xq = corpus(embeddings, dim)
    val sample = trainingSample(xq)
    xq.unpersist() // one pass built the sample; iterations read its blocks
    var cents = seedCentroids(sample, k)
    for (_ <- 0 until iters)
      cents = updateCentroids(sample, assign(sample, cents), cents, dim)
    cents
  }

  /** Train and return the model relation: one row per (cluster_id, dim)
    * with the fixed-point centroid coordinate and the cluster's population
    * under the final assignment.
    */
  def kmeansCentroids(
      embeddings: DataFrame, k: Int = K, iters: Int = Iters): DataFrame = {
    val cents = trainedModel(embeddings, k, iters) // before corpus(): on a
    // cache miss trainModel unpersists its own corpus cache when done
    val xq = corpus(embeddings)
    // materialize the k-row size relation NOW (localCheckpoint is eager)
    // while the corpus cache is hot, so unpersisting xq below cannot force
    // a later evaluation to recompute the quantization pipeline
    val sizes = assign(xq, cents)
      .groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
      .withColumnRenamed("cluster", "cluster_id")
      .localCheckpoint()
    val spark = embeddings.sparkSession
    val centRows = cents.toSeq.flatMap { case (c, arr) =>
      arr.toSeq.zipWithIndex.map { case (v, d) => (c, d, v) }
    }
    val out = spark.createDataFrame(centRows)
      .toDF("cluster_id", "dim", "centroid_q")
      .join(sizes, Seq("cluster_id"), "left")
      .na.fill(0L, Seq("cluster_size"))
      .orderBy("cluster_id", "dim")
    xq.unpersist()
    out
  }

  /** The final assignment relation (vec_id → trained cluster) for library
    * users wiring the trained quantizer into IVF routing.
    */
  def kmeansAssignments(
      embeddings: DataFrame, k: Int = K, iters: Int = Iters): DataFrame = {
    val cents = trainedModel(embeddings, k, iters)
    val xq = corpus(embeddings)
    // eager-materialize the final (vec_id, cluster) relation, then release
    // the quantized-corpus cache: callers (q69's two-sided search join)
    // re-read checkpoint blocks instead of pinning the corpus in storage
    val out = assign(xq, cents).localCheckpoint()
    xq.unpersist()
    out.orderBy("vec_id")
  }

  /** Train and return the raw model: k fixed-point centroids, driver-side
    * (k×Dim longs — tiny by definition). The broadcastable artifact the
    * serving paths below route by. Memoized per (corpus plan, k, iters) —
    * see [[modelCache]].
    */
  def trainedModel(
      embeddings: DataFrame, k: Int = K, iters: Int = Iters,
      dim: Int = Dim): Array[(Int, Array[Long])] = {
    val key = (embeddings.queryExecution.analyzed.canonicalized, k, iters, dim)
    modelCache.computeIfAbsent(key, _ => trainModel(embeddings, k, iters, dim))
  }

  /** Nearest-trained-centroid assignment as a PER-ROW expression: the k
    * candidate distances unroll into a `least(struct(dist, cluster)...)`
    * over array-literal centroids — no aggregation, no shuffle, codegen
    * throughout. Exactly the batch argmin's semantics (smallest distance,
    * ties to the smallest cluster id), but legal inside an append-mode
    * streaming plan, which is what lets the trained quantizer route
    * streams. Malformed vectors are filtered, mirroring training.
    */
  /** Above this model size [[assignTrainedCells]] switches from the
    * unrolled `least(struct…)` expression (codegen-friendly at the k ≤ 16
    * the fixed-k operators and streams use — their plans stay exactly as
    * pinned) to the compiled argmin kernel: a 256-wide unrolled expression
    * tree (the PQ codebook default) blows past JIT method limits and pays
    * per-candidate Catalyst overhead for identical integer results.
    */
  val ExprAssignMaxK = 16

  def assignTrainedCells(
      vectors: DataFrame, model: Array[(Int, Array[Long])],
      embCol: String = "embedding", withDist: Boolean = false,
      dim: Int = Dim): DataFrame = {
    if (model.length > ExprAssignMaxK)
      return assignTrainedCellsKernel(vectors, model, embCol, withDist, dim)
    val candidates = model.map { case (c, cq) =>
      val cc = cq.map(v => v * v).sum // ≤ Dim·(1e6)² ≪ 2^63
      struct(
        (col("__xx") - lit(2L) * dotLong(col("__xq"), typedLit(cq.toSeq)) + lit(cc)).as("d"),
        lit(c).as("c"))
    }
    // Spark's least() rejects a single argument — a k=1 model routes
    // everything to its only cell
    val best =
      if (candidates.length == 1) candidates(0) else least(candidates: _*)
    // materialize the argmin struct ONCE behind a projection boundary —
    // CollapseProject keeps a multiply-referenced non-cheap alias, so the
    // k-wide least(...) is not duplicated when both fields are read
    val assigned = vectors
      .filter(col(embCol).isNotNull && size(col(embCol)) === dim)
      .withColumn("__xq", quantize(col(embCol)))
      .withColumn("__xx", dotLong(col("__xq"), col("__xq")))
      .withColumn("__best", best)
      .withColumn("cell", col("__best").getField("c"))
    // cent_dist = |x−c|² in exact fixed-point longs — the "distance to
    // prototype" the SemDeDup / prototype-pruning curation ops rank by
    val withD =
      if (withDist) assigned.withColumn("cent_dist", col("__best").getField("d"))
      else assigned
    withD.drop("__xq", "__xx", "__best")
  }

  /** [[assignTrainedCells]]'s large-k twin: the same filter, the same
    * fixed-point quantization (`floor(x·1e6)` per element — identical
    * IEEE double ops to the [[quantize]] Column), the same
    * smallest-(dist, cell) argmin, as a per-partition compiled loop that
    * preserves every input column and appends `cell` (+`cent_dist`).
    * Deterministic and narrow, so it is exactly as streaming-append-legal
    * as the expression form.
    */
  private[ops] def assignTrainedCellsKernel(
      vectors: DataFrame, model: Array[(Int, Array[Long])],
      embCol: String, withDist: Boolean, dim: Int): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{Encoders, Row}
    val filtered = vectors.filter(col(embCol).isNotNull && size(col(embCol)) === dim)
    val base = filtered.schema
    val schema =
      if (withDist)
        base.add("cell", IntegerType, nullable = false)
          .add("cent_dist", LongType, nullable = false)
      else base.add("cell", IntegerType, nullable = false)
    val embIdx = base.fieldIndex(embCol)
    val elemIsFloat = base(embIdx).dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case t => throw new IllegalArgumentException(
        s"assignTrainedCellsKernel: $embCol has unsupported type $t")
    }
    val ordered = model.sortBy(_._1)
    val ids = ordered.map(_._1)
    val flat = ordered.flatMap(_._2)
    val cc = ordered.map { case (_, cq) => cq.map(v => v * v).sum }
    val k = ids.length
    filtered.mapPartitions { it =>
      val x = new Array[Long](dim)
      it.map { row =>
        val seq = row.getSeq[Any](embIdx)
        var xx = 0L
        var d = 0
        while (d < dim) {
          val v =
            if (elemIsFloat) seq(d).asInstanceOf[Float].toDouble
            else seq(d).asInstanceOf[Double]
          val q = math.floor(v * 1e6).toLong
          x(d) = q; xx += q * q; d += 1
        }
        var best = 0
        var bestD = Long.MaxValue
        var c = 0
        while (c < k) {
          var dot = 0L
          val off = c * dim
          var i = 0
          while (i < dim) { dot += x(i) * flat(off + i); i += 1 }
          val dist = xx - 2L * dot + cc(c)
          if (dist < bestD) { bestD = dist; best = ids(c) }
          c += 1
        }
        // Seq[Any] — plain Seq(best, bestD) would numeric-widen the Int
        // cell to Long and break the row encoder's INT field
        Row.fromSeq(row.toSeq ++
          (if (withDist) Seq[Any](best, bestD) else Seq[Any](best)))
      }
    }(Encoders.row(schema))
  }

  /** Per-vector trained cell as a query surface: train on the corpus, then
    * assign every vector through the expression path — which pins
    * expression-assign ≡ batch groupBy-argmin ≡ the oracle's unrolled
    * window-argmin, the equivalence streaming serving relies on.
    */
  def trainedCells(
      embeddings: DataFrame, k: Int = K, iters: Int = Iters): DataFrame =
    assignTrainedCells(
      embeddings.select(col("vec_id"), col("embedding")),
      trainedModel(embeddings, k, iters))
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id")

  def trainedCellsSql(k: Int = K, iters: Int = Iters, dim: Int = Dim): String =
    s"""WITH ${kmeansCtesSql(k, iters, dim)}
       |SELECT vec_id, cluster AS cell FROM afinal ORDER BY vec_id""".stripMargin

  /** Ranked trained-cell assignment — (vec_id, cell, cell_rank ≤
    * maxRank): the probe order over TRAINED centroids by exact
    * fixed-point distance (ties to the smaller cell id; rank 1 is the
    * [[assignTrainedCells]] home cell by construction — same argmin,
    * same tie-break). This is [[Similarity.ivfCellsRanked]]'s contract
    * with the learned router instead of the label one, which is what
    * lets the nprobe tune grid and the probed search below run
    * unchanged over trained cells (r18, VERDICT r17 #3).
    *
    * Per row: k struct(d, c) candidates → sort_array → slice(1, maxRank)
    * → posexplode. All exact integer arithmetic; no shuffle (the model
    * is a driver-side array riding in as literals).
    */
  def trainedCellsRanked(
      embeddings: DataFrame, maxRank: Int, k: Int = K,
      iters: Int = Iters, dim: Int = Dim): DataFrame = {
    val model = trainedModel(embeddings, k, iters, dim)
    val candidates = model.map { case (c, cq) =>
      val cc = cq.map(v => v * v).sum
      struct(
        (col("__xx") - lit(2L) * dotLong(col("__xq"), typedLit(cq.toSeq)) + lit(cc)).as("d"),
        lit(c).as("c"))
    }
    embeddings
      .filter(col("embedding").isNotNull && size(col("embedding")) === dim)
      .repartition(col("vec_id")) // single-split parquet → spread the n·k dots
      .withColumn("__xq", quantize(col("embedding")))
      .withColumn("__xx", dotLong(col("__xq"), col("__xq")))
      .select(col("vec_id"),
        posexplode(slice(sort_array(array(candidates: _*)), 1, maxRank)))
      .select(col("vec_id"), col("col.c").as("cell"),
        (col("pos") + 1).cast("int").as("cell_rank"))
  }

  /** The nprobe tune grid measured over TRAINED cells — same sample,
    * same exact-truth joins, same integer bar as the label-cell
    * derivation ([[Similarity.tuneGridFromRanked]]); k defaults to the
    * corpus-adaptive centroid count. Memoized like the label grid.
    */
  private val trainedTuneCache = graft.util.BoundedLru[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int, Int),
    Seq[(Int, Long)]]()

  def trainedTuneGridRows(
      embeddings: DataFrame, k: Int = 0, iters: Int = Iters): Seq[(Int, Long)] = {
    val kk = if (k > 0) k else adaptiveK(embeddings.count())
    val key = (embeddings.queryExecution.analyzed, kk, iters)
    trainedTuneCache.computeIfAbsent(key, _ =>
      Similarity.tuneGridFromRanked(embeddings,
        trainedCellsRanked(embeddings, Similarity.MaxDerivedNprobe, kk, iters)))
  }

  /** Smallest nprobe whose TRAINED-cell tune-sample recall meets the
    * [[Similarity.TuneHitBar]]; −1 when even the full sweep misses it.
    */
  def derivedNprobeTrained(
      embeddings: DataFrame, k: Int = 0, iters: Int = Iters): Int =
    trainedTuneGridRows(embeddings, k, iters)
      .find(_._2 >= Similarity.TuneHitBar).map(_._1).getOrElse(-1)

  /** nprobe-probed trained-IVF top-k: each query probes its `nprobe`
    * nearest TRAINED cells; corpus vectors live in their single home
    * cell. [[Similarity.ivfTopK]]'s equi-join plan with the learned
    * router — candidates ≈ nprobe·n/k per query side, against
    * [[ivfTopKTrained]]'s home-cell-only kernel (nprobe = 1).
    */
  def ivfTopKTrainedProbed(
      embeddings: DataFrame, topK: Int = 3, nprobe: Int = 1,
      k: Int = K, iters: Int = Iters): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = trainedCellsRanked(embeddings, nprobe, k, iters).cache()
    val emb = embeddings.select(col("vec_id"), col("embedding"))
    val a = emb.join(ranked, "vec_id")
      .toDF("query_id", "query_emb", "cell_a", "cell_rank")
    val b = emb.join(ranked.filter(col("cell_rank") === 1), "vec_id")
      .toDF("neighbor_id", "emb_b", "cell_b", "crb")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    // ranked-assignment cache freed after the caller's action (r19 §5)
    graft.util.CacheScope.freeAfterUse(
      a.join(b, col("cell_a") === col("cell_b") && col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          Similarity.dot(col("query_emb"), col("emb_b")).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= topK)
        .orderBy("query_id", "rank"),
      Seq(ranked))
  }

  /** Semantic deduplication over the trained cells — the SemDeDup recipe
    * (Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication", arXiv:2303.09540, public literature): cluster
    * the embedding corpus with k-means, then WITHIN each cell drop every
    * vector that has a semantic duplicate (quantized cosine ≥ tau) of
    * higher keep-priority, where priority is distance-to-centroid
    * descending (the paper's diversity rule: among duplicates, keep the
    * example FARTHEST from its prototype), ties to the lowest vec_id.
    *
    * Scale shape: the similarity join is an EQUI-join on the learned cell —
    * Σ cell² compute instead of the corpus-global O(n²) (the whole point of
    * clustering first), with the model riding along as a broadcast k×Dim
    * relation. Exactness within the cell partition is what the paper
    * computes; every quantity (cell, cent_dist, cosine) is fixed-point
    * exact, so the keep-list is engine-reproducible bit-for-bit.
    */
  def semanticDedup(
      embeddings: DataFrame, k: Int = K, iters: Int = Iters,
      tau: Double = Similarity.CosineThreshold): DataFrame = {
    val model = trainedModel(embeddings, k, iters)
    // eager-materialize (id, emb, cell, dist): three consumers below (two
    // join sides + the surviving anti-join) read blocks, not the pipeline
    val cells = assignTrainedCells(
        embeddings.select(col("vec_id"), col("embedding")), model,
        withDist = true)
      .select(col("vec_id"), col("embedding"), col("cell"), col("cent_dist"))
      .localCheckpoint()
    val a = cells.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      col("cell"), col("cent_dist").as("dist_a"))
    val b = cells.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
      col("cell"), col("cent_dist").as("dist_b"))
    val dominated = a.join(b, Seq("cell"))
      .filter(col("id_a") =!= col("id_b") &&
        Similarity.dot(col("emb_a"), col("emb_b")) >= tau &&
        (col("dist_b") > col("dist_a") ||
          (col("dist_b") === col("dist_a") && col("id_b") < col("id_a"))))
      .select(col("id_a")).distinct()
    // checkpointed cell relation freed after the caller's action (r19 §5)
    graft.util.CacheScope.freeAfterUse(
      cells.join(dominated, col("vec_id") === col("id_a"), "left_anti")
        .select(col("vec_id"), col("cell"), col("cent_dist"))
        .orderBy("vec_id"),
      Seq(cells))
  }

  def semanticDedupSql(
      k: Int = K, iters: Int = Iters, dim: Int = Dim,
      tau: Double = Similarity.CosineThreshold): String =
    s"""WITH ${kmeansCtesSql(k, iters, dim)},
       |ad AS (
       |  SELECT a.vec_id, a.cluster AS cell,
       |    CAST(list_sum(list_transform(generate_series(1, $dim),
       |      i -> (x.xq[i]-c.cq[i])*(x.xq[i]-c.cq[i]))) AS BIGINT) AS cent_dist
       |  FROM afinal a JOIN xq x USING (vec_id)
       |  JOIN c$iters c ON a.cluster = c.cluster)
       |SELECT d.vec_id, d.cell, d.cent_dist FROM ad d
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM ad o
       |  JOIN embeddings ea ON ea.vec_id = d.vec_id
       |  JOIN embeddings eb ON eb.vec_id = o.vec_id
       |  WHERE o.cell = d.cell AND o.vec_id <> d.vec_id
       |    AND ${Similarity.dotSql("ea.embedding", "eb.embedding")} >= $tau
       |    AND (o.cent_dist > d.cent_dist OR
       |         (o.cent_dist = d.cent_dist AND o.vec_id < d.vec_id)))
       |ORDER BY vec_id""".stripMargin

  /** Prototype-distance data pruning: per trained cell, keep the
    * `perCell` vectors FARTHEST from their centroid (hard/diverse
    * examples), rank ties to the lowest vec_id. The "SSL prototypes"
    * pruning metric of Sorscher et al., "Beyond neural scaling laws"
    * (NeurIPS 2022, public literature), as a relational op.
    *
    * Plan shape: one hash-partition on cell, rank via row_number — the
    * rank ≤ perCell filter lowers to WindowGroupLimit, so each partition
    * keeps a bounded heap instead of a full sort at scale.
    */
  def prototypePrune(
      embeddings: DataFrame, k: Int = K, iters: Int = Iters,
      perCell: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = assignTrainedCells(
      embeddings.select(col("vec_id"), col("embedding")),
      trainedModel(embeddings, k, iters), withDist = true)
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("cent_dist").desc, col("vec_id"))
    cells.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perCell)
      .select(col("vec_id"), col("cell"), col("cent_dist"), col("rank"))
      .orderBy("cell", "rank")
  }

  def prototypePruneSql(
      k: Int = K, iters: Int = Iters, dim: Int = Dim,
      perCell: Int = 50): String =
    s"""WITH ${kmeansCtesSql(k, iters, dim)},
       |ad AS (
       |  SELECT a.vec_id, a.cluster AS cell,
       |    CAST(list_sum(list_transform(generate_series(1, $dim),
       |      i -> (x.xq[i]-c.cq[i])*(x.xq[i]-c.cq[i]))) AS BIGINT) AS cent_dist
       |  FROM afinal a JOIN xq x USING (vec_id)
       |  JOIN c$iters c ON a.cluster = c.cluster)
       |SELECT vec_id, cell, cent_dist, CAST(rn AS INTEGER) AS rank FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY cell ORDER BY cent_dist DESC, vec_id) AS rn
       |  FROM ad)
       |WHERE rn <= $perCell ORDER BY cell, rank""".stripMargin

  /** Streaming ANN serving routed by the TRAINED quantizer: train offline
    * on the static corpus, cell-index the corpus once, then assign each
    * incoming probe its nearest trained cell per-row and stream-static
    * equi-join on the cell — the full train → index → serve loop (q69's
    * batch search shape, with the probe side unbounded). Append-safe: the
    * only stateful op is the join against a static side.
    */
  def streamingTrainedServe(
      probes: DataFrame, corpusDf: DataFrame,
      k: Int = K, iters: Int = Iters): DataFrame = {
    val model = trainedModel(corpusDf, k, iters)
    val indexed = assignTrainedCells(
      corpusDf.select(col("vec_id").as("neighbor_id"), col("embedding").as("emb_n")),
      model, embCol = "emb_n")
    assignTrainedCells(
      probes.select(col("vec_id").as("probe_id"), col("embedding").as("emb_p")),
      model, embCol = "emb_p")
      .join(indexed, "cell")
      .select(col("probe_id"), col("neighbor_id"),
        Similarity.dot(col("emb_p"), col("emb_n")).as("cosine"))
  }

  /** The shared unrolled-Lloyd's DuckDB CTE chain (xq → xs → c0 → a1/c1 →
    * … → afinal): one chain feeds the model dump (q68), the trained-IVF
    * search (q69), the serving assignment (q76), the curation ops
    * (q86/q87) and — instantiated per subspace — the PQ oracles, so none
    * of those oracles can drift from each other. `prefix` namespaces every
    * CTE (a PQ oracle instantiates one chain per subspace in a single
    * WITH), `embExpr` is the trained vector expression (e.g. a slice
    * `embedding[17:32]` for a PQ subspace) and `validDim` the length the
    * FULL stored vector must have to participate (malformed-vector
    * filtering is decided on the whole embedding, so every subspace
    * includes exactly the same vectors). Training iterations run over the
    * `xs` md5-prefix sample (first [[TrainCap]] vectors in seed-hash
    * order, the engine's [[trainingSample]]); `afinal` assigns the FULL
    * corpus through the trained centroids.
    */
  def kmeansCtesSql(
      k: Int = K, iters: Int = Iters, dim: Int = Dim,
      prefix: String = "", embExpr: String = "embedding",
      validDim: Int = -1, cap: Int = TrainCap, kExpr: String = null): String = {
    val p = prefix
    val vd = if (validDim < 0) dim else validDim
    val kSql = Option(kExpr).getOrElse(k.toString)
    def assignSql(cents: String, src: String) =
      s"""SELECT vec_id, cluster FROM (
         |  SELECT x.vec_id, c.cluster,
         |    row_number() OVER (PARTITION BY x.vec_id ORDER BY
         |      list_sum(list_transform(generate_series(1, $dim),
         |        i -> (x.xq[i]-c.cq[i])*(x.xq[i]-c.cq[i]))), c.cluster) AS rn
         |  FROM $src x CROSS JOIN $cents c) WHERE rn = 1""".stripMargin
    def updateSql(assigned: String, prev: String) =
      s"""SELECT p.cluster, COALESCE(u.cq, p.cq) AS cq FROM $prev p LEFT JOIN (
         |  SELECT cluster, list(cq ORDER BY dim) AS cq FROM (
         |    SELECT cluster, dim,
         |      CAST(floor(CAST(SUM(v) AS DOUBLE)/COUNT(*)) AS BIGINT) AS cq
         |    FROM (SELECT a.cluster, unnest(x.xq) AS v,
         |            unnest(generate_series(1, len(x.xq))) AS dim
         |          FROM $assigned a JOIN xs$p x USING (vec_id))
         |    GROUP BY cluster, dim)
         |  GROUP BY cluster) u ON p.cluster = u.cluster""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      val prev = if (i == 1) s"c0$p" else s"c${i - 1}$p"
      s"""a$i$p AS (${assignSql(prev, s"xs$p")}),
         |c$i$p AS (${updateSql(s"a$i$p", prev)})""".stripMargin
    }.mkString(",\n")
    s"""xq$p AS (
       |  SELECT vec_id, list_transform($embExpr,
       |    x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS xq
       |  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = $vd),
       |xs$p AS (
       |  SELECT vec_id, xq FROM xq$p
       |  ORDER BY md5('km|' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $cap),
       |c0$p AS (
       |  SELECT cluster, cq FROM (
       |    SELECT CAST(row_number() OVER (
       |        ORDER BY md5('km|' || CAST(vec_id AS VARCHAR)), vec_id) AS INTEGER) - 1
       |      AS cluster, xq AS cq
       |    FROM xs$p) WHERE cluster < $kSql),
       |$iterCtes,
       |afinal$p AS (${assignSql(s"c$iters$p", s"xq$p")})""".stripMargin
  }

  def kmeansCentroidsSql(k: Int = K, iters: Int = Iters, dim: Int = Dim): String =
    s"""WITH ${kmeansCtesSql(k, iters, dim)}
       |SELECT c.cluster AS cluster_id, CAST(d.dim - 1 AS INTEGER) AS dim,
       |  c.cq[d.dim] AS centroid_q, COALESCE(s.n, 0) AS cluster_size
       |FROM c$iters c
       |CROSS JOIN (SELECT unnest(generate_series(1, $dim)) AS dim) d
       |LEFT JOIN (SELECT cluster, COUNT(*) AS n FROM afinal GROUP BY cluster) s
       |  ON c.cluster = s.cluster
       |ORDER BY cluster_id, dim""".stripMargin

  /** IVF top-k search routed by the TRAINED quantizer — the full
    * train → index → search loop ([[Similarity.ivfTopK]] with learned
    * cells instead of the testdata's pre-assigned `label`).
    *
    * Execution (r11): ONE shuffle of the n quantized vectors keyed on
    * their trained cell, then a per-cell compiled top-k kernel
    * (`groupByKey(cell).flatMapGroups`) that scans each cell's members
    * in a tight integer loop and emits only n·topK result rows. The
    * r1–r10 plan joined the corpus with itself on the cell and ranked
    * with a window — semantically identical, but it MATERIALIZED the
    * Σ cell² candidate relation (625 M rows at the 200× probe) through a
    * join + window exchange, which cost ~110 s where the underlying
    * arithmetic is ~2 s of fused multiply-adds. The kernel keeps the
    * candidate volume as COMPUTE (Σ cell² quantized dots, the n^1.5
    * contract under [[adaptiveK]]) without ever shuffling it as rows.
    * Exactness is bitwise: floor(x·1e6) quantization, dot/1e12 cosine
    * (the [[graft.functions.QuantizedDot]] convention), ties to the
    * smaller neighbor_id — the q69 oracle hash is unchanged.
    *
    * Memory: one cell's members are held per group (n_c·Dim longs); the
    * [[adaptiveK]] sizing keeps n_c ≈ √(K·n) — ~50 MB at a 10⁹-vector
    * corpus — and a pathologically skewed cell indicates the quantizer,
    * not the search, needs retraining.
    */
  def ivfTopKTrained(
      embeddings: DataFrame, topK: Int = 3, k: Int = K, iters: Int = Iters): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = trainedModel(embeddings, k, iters)
    val ordered = cents.sortBy(_._1)
    val ids = ordered.map(_._1)
    val dim = Dim
    val flat = ordered.flatMap(_._2)
    val cc = ordered.map { case (_, cq) => cq.map(v => v * v).sum }
    val nk = ids.length
    val assigned = embeddings
      .filter(col("embedding").isNotNull && size(col("embedding")) === dim)
      .repartition(col("vec_id"))
      .select(col("vec_id"), quantize(col("embedding")).as("xq"))
      .as[(Long, scala.collection.Seq[Long])]
      .map { case (id, xqSeq) =>
        val x = xqSeq.toArray
        // argmin of (cc − 2·dot): xx is constant per row, so dropping it
        // changes no comparison — same cell, same ties, as [[assign]]
        var best = 0
        var bestD = Long.MaxValue
        var c = 0
        while (c < nk) {
          var dot = 0L
          val off = c * dim
          var d = 0
          while (d < dim) { dot += x(d) * flat(off + d); d += 1 }
          val score = cc(c) - 2L * dot
          if (score < bestD) { bestD = score; best = ids(c) }
          c += 1
        }
        (best, id, xqSeq)
      }
    assigned.groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val members = it.toArray
        val n = members.length
        val mids = members.map(_._2)
        val xs = members.map(_._3.toArray)
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Int)]()
        var i = 0
        while (i < n) {
          // bounded top-k insertion by (dot desc, neighbor_id asc)
          val bd = new Array[Long](topK)
          val bid = new Array[Long](topK)
          var filled = 0
          var j = 0
          while (j < n) {
            if (j != i) {
              var dot = 0L
              val xi = xs(i)
              val xj = xs(j)
              var d = 0
              while (d < dim) { dot += xi(d) * xj(d); d += 1 }
              val id = mids(j)
              // insert if better than the current worst
              if (filled < topK || dot > bd(filled - 1) ||
                  (dot == bd(filled - 1) && id < bid(filled - 1))) {
                var p = if (filled < topK) filled else topK - 1
                while (p > 0 && (bd(p - 1) < dot ||
                    (bd(p - 1) == dot && bid(p - 1) > id))) {
                  bd(p) = bd(p - 1); bid(p) = bid(p - 1); p -= 1
                }
                bd(p) = dot
                bid(p) = id
                if (filled < topK) filled += 1
              }
            }
            j += 1
          }
          var r = 0
          while (r < filled) {
            out += ((mids(i), bid(r), bd(r).toDouble / 1e12, r + 1))
            r += 1
          }
          i += 1
        }
        out.iterator
      }
      .toDF("query_id", "neighbor_id", "cosine", "rank")
      .orderBy("query_id", "rank")
  }

  def ivfTopKTrainedSql(
      topK: Int = 3, k: Int = K, iters: Int = Iters, dim: Int = Dim): String =
    trainedSearchSql(kmeansCtesSql(k, iters, dim), topK)

  /** Adaptive centroid count for corpus-scaling trained-IVF search: the
    * smallest power-of-two k with K·k² ≥ n, i.e. k ≈ √(n/K) — so the
    * in-cell search join (n²/k candidate pairs) and the full-corpus
    * assignment (n·k distance evaluations) BOTH grow as n^1.5, the
    * balanced coarse-quantizer sizing (FAISS guidelines recommend
    * k ∝ √n). Integer-only search (no float log/sqrt edge), mirrored
    * verbatim in [[adaptiveKCteSql]]. At the verification volume
    * (n ≤ K·K² = 512) this returns K, so the trained model — and q68/q76,
    * which stay fixed-k as pinned-model fixtures — is unchanged there.
    */
  def adaptiveK(n: Long): Int =
    (3 to 16).map(1 << _).find(kk => K.toLong * kk * kk >= n).getOrElse(1 << 16)

  /** [[adaptiveK]] as a one-row DuckDB CTE (`kk`). */
  def adaptiveKCteSql: String =
    s"""kk AS (
       |  SELECT GREATEST($K, COALESCE(MIN(CAST(1 AS BIGINT) << t.j), 65536)) AS kk
       |  FROM generate_series(3, 16) t(j), (SELECT COUNT(*) AS n FROM embeddings) nr
       |  WHERE $K * (CAST(1 AS BIGINT) << t.j) * (CAST(1 AS BIGINT) << t.j) >= nr.n)""".stripMargin

  /** The registered trained-IVF entry point: [[ivfTopKTrained]] with the
    * centroid count derived from the corpus size ([[adaptiveK]]), so the
    * search join's per-cell population shrinks as the corpus grows
    * instead of the cell count being a fixed constant of the model.
    */
  def ivfTopKTrainedAdaptive(
      embeddings: DataFrame, topK: Int = 3, iters: Int = Iters): DataFrame =
    ivfTopKTrained(embeddings, topK, adaptiveK(embeddings.count()), iters)

  def ivfTopKTrainedAdaptiveSql(
      topK: Int = 3, iters: Int = Iters, dim: Int = Dim): String =
    trainedSearchSql(
      adaptiveKCteSql + ",\n" +
        kmeansCtesSql(K, iters, dim, kExpr = "(SELECT kk FROM kk)"),
      topK)

  /** Oracle for [[ivfTopKTrainedProbed]]: the ranked assignment is a
    * row_number over the SAME exact integer distances (Σ(x−c)² ≡
    * x·x − 2x·c + c·c, ties to the smaller cluster id — the
    * [[trainedCellsRanked]] sort_array order), probe rows rn ≤ nprobe,
    * home rows rn = 1, equi-join on the cell. A (query, neighbor) pair
    * meets at most once because the neighbor has ONE home cell.
    */
  def ivfTopKTrainedProbedSql(
      topK: Int = 3, nprobe: Int = 1, k: Int = K, iters: Int = Iters,
      dim: Int = Dim): String =
    s"""WITH ${kmeansCtesSql(k, iters, dim)},
       |atop AS (
       |  SELECT vec_id, cluster, rn FROM (
       |    SELECT x.vec_id, c.cluster,
       |      row_number() OVER (PARTITION BY x.vec_id ORDER BY
       |        list_sum(list_transform(generate_series(1, $dim),
       |          i -> (x.xq[i]-c.cq[i])*(x.xq[i]-c.cq[i]))), c.cluster) AS rn
       |    FROM xq x CROSS JOIN c$iters c) WHERE rn <= $nprobe),
       |psearch AS (
       |  SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id,
       |    ${Similarity.dotSql("ea.embedding", "eb.embedding")} AS cosine
       |  FROM atop qa JOIN atop qb
       |    ON qa.cluster = qb.cluster AND qb.rn = 1 AND qa.vec_id <> qb.vec_id
       |  JOIN embeddings ea ON ea.vec_id = qa.vec_id
       |  JOIN embeddings eb ON eb.vec_id = qb.vec_id)
       |SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rank FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM psearch)
       |WHERE rnk <= $topK ORDER BY query_id, rank""".stripMargin

  private def trainedSearchSql(ctes: String, topK: Int): String =
    s"""WITH $ctes,
       |search AS (
       |  SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id,
       |    ${Similarity.dotSql("ea.embedding", "eb.embedding")} AS cosine
       |  FROM afinal qa JOIN afinal qb
       |    ON qa.cluster = qb.cluster AND qa.vec_id <> qb.vec_id
       |  JOIN embeddings ea ON ea.vec_id = qa.vec_id
       |  JOIN embeddings eb ON eb.vec_id = qb.vec_id)
       |SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
       |  FROM search)
       |WHERE rn <= $topK ORDER BY query_id, rank""".stripMargin
}
