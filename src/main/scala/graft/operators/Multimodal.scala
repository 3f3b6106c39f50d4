package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata; decode / feature-extraction runs
 * as batched partition-local functions.
 *
 * Image decode is REAL — JDK `javax.imageio` handles PNG/JPEG/GIF/BMP
 * with zero external dependencies; decoded images mean-pool into a
 * deterministic luminance-band feature vector. Payloads ImageIO cannot
 * decode (non-image modalities, or formats needing codec libs absent
 * from this environment — audio/video) fall back to
 * `fakeDecodeFeatures`, a byte-level stand-in that keeps the pipeline
 * shape identical so a real codec swap changes only the function body.
 *
 * Scale notes: `mapPartitions` keeps per-batch library initialization
 * (a real decoder's expensive part) amortized across the partition;
 * binary payloads never pass through a shuffle unless the caller joins
 * on them (join on the id, not the bytes).
 */
object Multimodal {

  val FeatureDim = 8

  /** Byte-level fallback features for payloads no installed codec can
    * decode: deterministic folded byte histogram. Same shape/rounding as
    * the real image features, so downstream plumbing is agnostic. */
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
   * REAL image decode via JDK ImageIO: returns (width, height, features)
   * where features = mean luminance ((r+g+b)/3/255) over `FeatureDim`
   * horizontal bands — a deterministic, codec-exact mean-pool (PNG is
   * lossless, so expected values are computable in closed form for
   * planted fixtures). Returns None when the bytes aren't a decodable
   * image.
   */
  def decodeImageFeatures(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    // ImageIO's default useCache=true spools every plain InputStream to a
    // DISK temp file before decoding — one create/write/delete per row,
    // which at corpus scale turns decode into small-file disk I/O and
    // makes wall time track scratch-disk state (measured: the sf1
    // 50k-payload gate jittered 5-27 s across passes on a busy disk, ~3 s
    // steady without it). Passing a MemoryCacheImageInputStream keeps the
    // cache in memory for THIS call only, without mutating the JVM-global
    // ImageIO.setUseCache flag that every other ImageIO caller in the JVM
    // observes. Decode output is identical (Round15Spec pins the
    // closed-form luminance AND that the global flag stays untouched).
    val img =
      try javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      if (w == 0 || h == 0) None
      else {
        val sums = new Array[Double](FeatureDim)
        val counts = new Array[Long](FeatureDim)
        var y = 0
        while (y < h) {
          val band = (y.toLong * FeatureDim / h).toInt
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sums(band) += (r + g + b) / (3.0 * 255.0)
            counts(band) += 1
            x += 1
          }
          y += 1
        }
        Some((w, h, Array.tabulate(FeatureDim)(i =>
          if (counts(i) == 0) 0.0
          else math.round(sums(i) / counts(i) * 1e6) / 1e6)))
      }
    }
  }

  /**
   * Feature extraction over a binary column. Input: (idCol: long,
   * binCol: binary). Output one row per media item with metadata +
   * feature vector; decodable images (PNG/JPEG/GIF/BMP via ImageIO)
   * additionally report width/height and REAL luminance-band features,
   * anything else takes the byte-level fallback with null dimensions.
   * Partition-local, no shuffle.
   */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("byte_len", IntegerType),
      StructField("first_byte", IntegerType),
      StructField("content_md5", StringType),
      StructField("features", ArrayType(DoubleType)),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
    ))
    val idIdx = df.columns.indexOf(idCol)
    val binIdx = df.columns.indexOf(binCol)
    require(idIdx >= 0 && binIdx >= 0, s"missing $idCol/$binCol")
    df.mapPartitions { it =>
      // per-partition init happens here in a real decoder (the disk-cache
      // avoidance lives inside decodeImageFeatures as a per-call
      // MemoryCacheImageInputStream — no JVM-global state is touched)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null)
          // corrupt/missing payload: null feature fields, never an NPE
          // that kills the whole task (one bad media row is routine at
          // corpus scale)
          Row(id, null, null, null, null, null, null)
        else {
          val digest = md.digest(bytes).map("%02x".format(_)).mkString
          val first = bytes.headOption.map(_ & 0xff).getOrElse(0): Int
          decodeImageFeatures(bytes) match {
            case Some((w, h, feats)) =>
              Row(id, bytes.length, first, digest, feats, w, h)
            case None =>
              Row(id, bytes.length, first, digest, fakeDecodeFeatures(bytes),
                null, null)
          }
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
