package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata; decode / feature-extraction runs
 * as batched partition-local functions.
 *
 * The decode step itself is STUBBED (no codec libraries in this
 * environment): `fakeDecodeFeatures` derives a deterministic feature
 * vector from the bytes so the whole pipeline — schema, partitioning,
 * batch shape, downstream joins — is real and testable. Swapping in a
 * real decoder changes only the function body, not the plan.
 *
 * Scale notes: `mapPartitions` keeps per-batch library initialization
 * (a real decoder's expensive part) amortized across the partition;
 * binary payloads never pass through a shuffle unless the caller joins
 * on them (join on the id, not the bytes).
 */
object Multimodal {

  val FeatureDim = 8

  /** STUB decoder: deterministic pseudo-features from raw bytes — stands
    * in for image decode + embed. Replace the body with a real codec
    * (??? in production builds) without touching the pipeline shape. */
  def fakeDecodeFeatures(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % FeatureDim) += (bytes(i) & 0xff) / 255.0
      i += 1
    }
    out.map(v => math.round(v * 1e6) / 1e6)
  }

  /**
   * Feature extraction over a binary column. Input: (idCol: long,
   * binCol: binary). Output one row per media item with metadata +
   * feature vector. Partition-local, no shuffle.
   */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("byte_len", IntegerType),
      StructField("first_byte", IntegerType),
      StructField("content_md5", StringType),
      StructField("features", ArrayType(DoubleType)),
    ))
    val idIdx = df.columns.indexOf(idCol)
    val binIdx = df.columns.indexOf(binCol)
    require(idIdx >= 0 && binIdx >= 0, s"missing $idCol/$binCol")
    df.mapPartitions { it =>
      // per-partition init happens here in a real decoder
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null)
          // corrupt/missing payload: null feature fields, never an NPE
          // that kills the whole task (one bad media row is routine at
          // corpus scale)
          Row(id, null, null, null, null)
        else {
          val digest = md.digest(bytes).map("%02x".format(_)).mkString
          Row(id, bytes.length, bytes.headOption.map(_ & 0xff).getOrElse(0): Int,
            digest, fakeDecodeFeatures(bytes))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Resize/frame-sample stand-in: deterministic downsample of the fake
    * feature vector to `k` dims (mean pooling) — the plumbing for a real
    * thumbnail/frame-sample stage. */
  def poolFeatures(df: DataFrame, featuresCol: String, k: Int): DataFrame = {
    require(FeatureDim % k == 0, s"k must divide $FeatureDim")
    val group = FeatureDim / k
    df.withColumn(s"${featuresCol}_pooled",
      transform(sequence(lit(0), lit(k - 1)), i =>
        round(aggregate(slice(col(featuresCol), i * group + 1, lit(group)),
          lit(0.0d), (acc, v) => acc + v) / group, 6)))
  }
}
