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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") <= k)
      .select(col(queryIdCol), col(idCol), round(col("cosine"), 6).as("cosine"))
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
    val bCenters = corpus.sparkSession.sparkContext.broadcast(centers)
    val probeUdf = udf { (v: Seq[Double], n: Int) =>
      bCenters.value.zipWithIndex
        .map { case (c, i) =>
          var d = 0.0; var j = 0
          while (j < c.length) { val t = c(j) - v(j); d += t * t; j += 1 }
          (d, i)
        }.sortBy(_._1).take(n).map(_._2)
    }
    val c = corpus.select(col(idCol), col(vecCol).as("__cvec__"))
      .withColumn("__cell__", element_at(probeUdf(col("__cvec__"), lit(1)), 1))
    val q = queries.select(col(queryIdCol), col(vecCol).as("__qvec__"))
      .withColumn("__cell__", explode(probeUdf(col("__qvec__"), lit(nProbes))))
    val scored = c.join(q, "__cell__")
      .withColumn("cosine", cosine(col("__cvec__"), col("__qvec__")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") <= k)
      .select(col(queryIdCol), col(idCol), round(col("cosine"), 6).as("cosine"))
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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") <= k)
      .select(col(queryIdCol), col(idCol), round(col("cosine"), 6).as("cosine"))
  }
}
