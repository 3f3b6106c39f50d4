package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Similarity search over embedding columns (`array<float>`).
 *
 * Two paths, same API:
 *  - `bruteForceTopK` — exact cosine top-k: broadcast the (small) query
 *    set against the corpus, one pass, no shuffle of the corpus. The
 *    correctness baseline.
 *  - `lshTopK` — sign-LSH bucketed approximate top-k: corpus and queries
 *    bucket on the sign pattern of their leading dimensions; candidates
 *    only form inside a bucket. At 100 TB the bucket join replaces the
 *    full cross product with a co-partitioned equi-join.
 *
 * Dot products are `aggregate(zip_with(...))` Column expressions —
 * codegen'd, no UDFs.
 */
object Similarity {

  /** Dot product of two array<float/double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-LSH bucket key: concatenated signs of `bits` dimensions. For
    * roughly isotropic embeddings this is random-hyperplane LSH with
    * axis-aligned planes — deterministic and engine-portable (no RNG
    * state to ship). `seed` selects which window of dimensions is used
    * (table t reads dims t*bits..t*bits+bits-1, wrapping at the vector
    * length), so distinct seeds give independent hash tables for
    * OR-amplified candidate generation; seed=0 is the historic leading-
    * dims bucket. */
  def signBucket(vec: Column, bits: Int, seed: Int = 0): Column =
    concat_ws("", (0 until bits).map { b =>
      val idx = (pmod(lit(seed * bits + b), size(vec)) + 1).cast(IntegerType)
      when(element_at(vec, idx) >= 0, "1").otherwise("0")
    }: _*)

  /**
   * Scale-safe top-k tail shared by all three search paths: a bounded-heap
   * aggregate keyed by the query id (BoundedTopKAgg) replaces the
   * `row_number().over(Window.partitionBy(queryId))` window. The window
   * serializes each query's ENTIRE candidate set through one task — for
   * brute force that is corpus x queries rows on however many tasks there
   * are queries. The aggregate keeps at most k rows per query per map
   * partial, so the shuffle carries O(k x queries x partitions) bounded
   * buffers and candidate-set size cannot produce a straggler. Ordering
   * (cosine desc, id asc, ties included) is identical to the window plan;
   * above the heap budget the window remains the spill-safe fallback.
   */
  private def topKPerQuery(scored: DataFrame, queryIdCol: String,
                           idCol: String, k: Int): DataFrame = {
    if (k <= graft.plans.BoundedTopKAgg.MaxHeapK) {
      val entry = struct(col("cosine").as("k"),
        struct(col(idCol), col("cosine")).as("r"))
      scored.groupBy(col(queryIdCol))
        .agg(graft.plans.BoundedTopKAgg.bounded_top_k(entry, k, reverse = true).as("__tk__"))
        .select(col(queryIdCol), explode(col("__tk__")).as("__e__"))
        .select(col(queryIdCol), col(s"__e__.r.$idCol").as(idCol),
          round(col("__e__.r.cosine"), 6).as("cosine"))
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(queryIdCol))
        .orderBy(col("cosine").desc, col(idCol).asc)
      scored.withColumn("__rn__", row_number().over(w))
        .filter(col("__rn__") <= k)
        .select(col(queryIdCol), col(idCol), round(col("cosine"), 6).as("cosine"))
    }
  }

  /**
   * Exact top-k nearest neighbors by cosine for each query vector.
   * `queries` must be small (it is broadcast); the corpus streams.
   * Output: (queryIdCol, idCol, cosine), k rows per query.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, queryIdCol: String,
                     k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(queryIdCol), col(vecCol).as("__qvec__")))
    val scored = corpus.select(col(idCol), col(vecCol).as("__cvec__"))
      .crossJoin(q)
      .withColumn("cosine", cosine(col("__cvec__"), col("__qvec__")))
    topKPerQuery(scored, queryIdCol, idCol, k)
  }

  /**
   * IVF (inverted-file) approximate top-k: a k-means coarse quantizer
   * partitions the corpus into `nClusters` cells; each query probes its
   * `nProbes` nearest cells only. The classic ANN index shape: corpus
   * shuffles once on cell id, queries broadcast with their probe lists,
   * candidates form per-cell. `nProbes == nClusters` degenerates to
   * exact search (verified in the spec). Training samples the corpus —
   * at 100 TB you fit the quantizer on a sample, never the full data.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, queryIdCol: String,
              k: Int, nClusters: Int = 16, nProbes: Int = 4,
              trainSample: Double = 1.0, seed: Long = 42): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val train = (if (trainSample < 1.0) corpus.sample(trainSample, seed) else corpus)
      .select(array_to_vector(col(vecCol)).as("features"))
    val model = new KMeans().setK(nClusters).setSeed(seed).setFeaturesCol("features")
      .fit(train)
    val centers = model.clusterCenters.map(_.toArray)
    import graft.plans.NearestCellsExpression.nearest_cells
    val c = corpus.select(col(idCol), col(vecCol).as("__cvec__"))
      .withColumn("__cell__", element_at(nearest_cells(col("__cvec__"), centers, 1), 1))
    val q = queries.select(col(queryIdCol), col(vecCol).as("__qvec__"))
      .withColumn("__cell__", explode(nearest_cells(col("__qvec__"), centers, nProbes)))
    val scored = c.join(q, "__cell__")
      .withColumn("cosine", cosine(col("__cvec__"), col("__qvec__")))
    topKPerQuery(scored, queryIdCol, idCol, k)
  }

  /**
   * Approximate top-k: candidates restricted to the query's sign-LSH
   * bucket. Recall grows as `bits` shrinks; bits=0 degenerates to exact.
   * The bucket equi-join shuffles each side once on the bucket key —
   * the 100 TB-viable plan.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, queryIdCol: String,
              k: Int, bits: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).as("__cvec__"))
      .withColumn("__bkt__", signBucket(col("__cvec__"), bits))
    val q = queries.select(col(queryIdCol), col(vecCol).as("__qvec__"))
      .withColumn("__bkt__", signBucket(col("__qvec__"), bits))
    val scored = c.join(q, "__bkt__")
      .withColumn("cosine", cosine(col("__cvec__"), col("__qvec__")))
    topKPerQuery(scored, queryIdCol, idCol, k)
  }
}
