package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media payloads as opaque binary
  * columns with typed metadata, and run decode / feature-extract as
  * batch-shaped partition-local transforms.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic fake ([[fakeDecode]]); everything
  * around it — binary column handling, schema, the mapPartitions
  * batch shape (the Scala analogue of mapInPandas: one iterator per
  * partition, amortized per-batch setup), partition sizing — is real
  * and tested. Swapping [[fakeDecode]] for a real JNI/codec call is a
  * one-function change.
  */
object Multimodal {

  /** A typed media record: payload + metadata, the shape a real
    * image/audio table would have.
    */
  case class MediaRecord(media_id: Long, payload: Array[Byte],
                         media_type: String, n_bytes: Long)

  case class MediaFeature(media_id: Long, n_bytes: Long, width: Int,
                          height: Int, checksum: Long)

  /** Synthesize a binary media table from documents.text (UTF-8
    * bytes as the opaque payload) — deterministic stand-in for real
    * image bytes.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        (when(col("doc_id") % 2 === 0, "image/png")
          .otherwise("image/jpeg")).as("media_type"),
        length(col("text").cast("binary")).cast("long").as("n_bytes")
      )

  /** STUB — deterministic fake decoder. A real implementation would
    * decode the image header here (e.g. via javax.imageio or a JNI
    * codec); this fake derives "dimensions" and a checksum from the
    * bytes so the pipeline is end-to-end testable and reproducible.
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Long) = {
    var h = 1125899906842597L // deterministic FNV-ish fold
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    val width = 64 + math.floorMod(h, 512).toInt
    val height = 64 + math.floorMod(h >> 16, 512).toInt
    (width, height, h)
  }

  /** Repartition the media table so each partition carries at most
    * ~budgetBytes of payload — how a decode stage bounds its per-task
    * memory when payload sizes are wildly skewed (a byte budget, not a
    * row count).
    *
    * The cumulative byte sum is a two-pass distributed prefix sum on a
    * metadata-only projection (media_id + n_bytes — payloads are never
    * shuffled for the bookkeeping):
    *   1. range-partition the metadata by media_id and compute one
    *      byte total per partition (a tiny per-partition aggregate;
    *      collecting it is one row per partition, not per record);
    *   2. broadcast the per-partition prefix offsets back and finish
    *      the cumsum with a window PARTITIONED BY the physical
    *      partition id — every partition sums independently, unlike a
    *      global Window.orderBy which serializes the whole table
    *      through one task.
    * Bucket = (offset + within-partition cumsum − 1) / budget; the
    * payload table then shuffles ONCE on the bucket.
    */
  def partitionByByteBudget(df: DataFrame, budgetBytes: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val nMeta = math.max(1, spark.sparkContext.defaultParallelism)
    // metadata-only pass; cache pins the range placement so pass 1
    // (per-partition totals) and pass 2 (cumsum) see identical rows
    val meta = df.select(col("media_id"), col("n_bytes"))
      .repartitionByRange(nMeta, col("media_id"))
      .sortWithinPartitions(col("media_id"))
      .withColumn("_pid", spark_partition_id())
      .cache()
    val partTotals = meta.groupBy(col("_pid"))
      .agg(sum(col("n_bytes")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = partTotals.map { case (pid, t) =>
      val off = acc; acc += t; (pid, off)
    }
    val totalBytes = acc
    val nBuckets = math.max(1, ((totalBytes + budgetBytes - 1) / budgetBytes).toInt)
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("_pid", "_offset")
    val w = Window.partitionBy(col("_pid")).orderBy(col("media_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val buckets = meta
      .join(broadcast(offsetDf), "_pid")
      .withColumn("_bucket",
        floor((col("_offset") + sum(col("n_bytes")).over(w) - lit(1)) /
          budgetBytes).cast("int"))
      .select(col("media_id").as("_bid"), col("_bucket"))
    // one payload shuffle; range partitioning keeps buckets contiguous
    // and (with nBuckets partitions over nBuckets distinct values)
    // ~1:1 bucket→partition — a hash repartition could merge buckets
    df.join(buckets, col("media_id") === col("_bid"))
      .repartitionByRange(nBuckets, col("_bucket"))
      .drop("_bid", "_bucket")
  }

  /** Partition-local batch decode: the mapPartitions shape keeps any
    * per-batch native setup (codec contexts, model sessions) amortized
    * across the partition — the direct Scala analogue of mapInPandas
    * batch processing.
    */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[MediaFeature] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord]
      .mapPartitions { it =>
        // per-partition setup would happen here (once, not per row)
        it.map { r =>
          val (w, h, sum) = fakeDecode(r.payload)
          MediaFeature(r.media_id, r.n_bytes, w, h, sum)
        }
      }
  }

  /** STUB — "resize": deterministic fake producing target-dimension
    * features from the decoded record (a real impl would rescale
    * pixels; the pipeline shape — typed in/out, partition-local — is
    * the real part).
    */
  def resizeStub(f: MediaFeature, targetW: Int, targetH: Int): MediaFeature =
    f.copy(width = targetW, height = targetH,
      checksum = f.checksum * 31 + targetW * 65521 + targetH)

  /** Resize stage over the decoded features (mapPartitions batch
    * shape, like decodeFeatures).
    */
  def resized(spark: SparkSession, dir: String,
              targetW: Int = 224, targetH: Int = 224): Dataset[MediaFeature] = {
    import spark.implicits._
    decodeFeatures(spark, dir).mapPartitions(_.map(resizeStub(_, targetW, targetH)))
  }

  case class Frame(media_id: Long, frame_no: Int, offset: Long, n_bytes: Long)

  /** STUB — "frame sampling": treat the payload as a media container
    * and emit every strideBytes-th fixed-size frame (deterministic;
    * a real impl would demux). One row per sampled frame — the
    * 1→many explode shape of video pipelines, partition-local.
    */
  def sampleFrames(spark: SparkSession, dir: String,
                   frameBytes: Int = 32, stride: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord].flatMap { r =>
      val nFrames = r.payload.length / frameBytes
      (0 until nFrames by stride).iterator.map { i =>
        Frame(r.media_id, i, i.toLong * frameBytes,
          math.min(frameBytes, r.payload.length - i * frameBytes).toLong)
      }
    }
  }

  /** Oracle-checkable projection of the media pipeline: byte lengths
    * are real (not faked), so DuckDB can verify the binary-column
    * plumbing end-to-end.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("media_id"), col("media_type"), col("n_bytes"))
      .orderBy("media_id")

  /** Feature-extraction summary over the decoded (stub) features —
    * exercises the full typed pipeline; deterministic, verified by
    * unit test rather than SQL oracle (the fake decode is not SQL).
    */
  def featureSummary(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, dir).toDF()
      .groupBy((col("media_id") % 10).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("width")).as("min_w"),
        max(col("height")).as("max_h")
      )
      .orderBy("bucket")
}
