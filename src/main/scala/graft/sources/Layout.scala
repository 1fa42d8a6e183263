package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout — the two storage-side levers that matter
  * most at 100 TB, demonstrated end-to-end:
  *
  *  - '''Partitioned layout''' (`partitionBy` on write): a predicate
  *    on the partition column becomes directory pruning — the scan
  *    never lists, opens, or reads the excluded partitions. The plan
  *    shows it as `PartitionFilters` (vs data `PushedFilters`, which
  *    still read footers). For a corpus keyed by language/source/date
  *    this turns "scan 100 TB, filter to 2 TB" into "scan 2 TB".
  *
  *  - '''Bucketed layout''' (`bucketBy` on a managed table): both
  *    fact tables pre-hashed on the join key into the same bucket
  *    count join WITHOUT an Exchange on either side — the shuffle is
  *    paid once at write time and amortized over every downstream
  *    join/aggregation on that key. This is the Spark-native form of
  *    the reference's fixed `ihash(key) % nReduce` placement
  *    (internal/worker/worker.go:84-88): the bucket id IS the reduce
  *    bucket, persisted.
  */
object Layout {

  /** Write documents partitioned by language (hive-style dirs). */
  def writePartitionedDocs(spark: SparkSession, dir: String,
                           out: String): Unit =
    Tables.documents(spark, dir).write
      .mode(SaveMode.Overwrite)
      .partitionBy("lang")
      .parquet(out)

  /** Per-language slice of a partitioned corpus — the filter must
    * show up as a PartitionFilter (directory pruning), not a data
    * filter.
    */
  def langSlice(spark: SparkSession, out: String, lang: String): DataFrame =
    spark.read.parquet(out)
      .filter(col("lang") === lang)
      .select(col("doc_id"), col("source"), col("n_chars"))

  /** Persist orders + lineitem bucketed by the join key into the
    * session warehouse (managed tables, idempotent overwrite).
    */
  def writeBucketedOrderTables(spark: SparkSession, dir: String,
                               buckets: Int = 8): Unit = {
    // a previous JVM's table dir survives while the in-memory catalog
    // doesn't — drop both so Overwrite can't hit LOCATION_ALREADY_EXISTS
    Seq("graft_orders_bkt", "graft_lineitem_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:") + s"/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(loc)
      }
    }
    Tables.orders(spark, dir).write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "o_orderkey")
      .sortBy("o_orderkey")
      .saveAsTable("graft_orders_bkt")
    Tables.lineitem(spark, dir).write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "l_orderkey")
      .sortBy("l_orderkey")
      .saveAsTable("graft_lineitem_bkt")
  }

  /** Order totals via the bucketed tables: the join and the
    * aggregation both run on the persisted bucketing — zero Exchange
    * in the whole plan. The merge hint keeps the planner honest at
    * fixture scale (it would otherwise broadcast the tiny side and
    * discard the bucketing); at 100 TB a fact⋈fact join is
    * merge-joined regardless, and the hint is a no-op.
    */
  def bucketedOrderTotals(spark: SparkSession): DataFrame =
    spark.table("graft_lineitem_bkt")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .join(spark.table("graft_orders_bkt").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("sum_qty"))

  /** Morton/Z-order key: interleave the low `bits` bits of two
    * non-negative integer columns — bit j of x lands at position 2j,
    * bit j of y at 2j+1. Sorting by this key clusters rows so that
    * EVERY file/row-group covers a small rectangle in (x, y) space:
    * min/max stats then prune multi-dimensional predicates, where a
    * linear sort only ever prunes its leading column. The third
    * storage lever after partitioning and bucketing — what Delta's
    * OPTIMIZE ZORDER BY does, as a plain column expression.
    *
    * Pure bit math (32 shift-and-mask terms summed over disjoint bit
    * positions), codegen-friendly, zero shuffle to compute; the sort
    * that USES it is one range exchange at write time.
    */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).flatMap { j =>
      Seq(shiftleft(shiftrightunsigned(x, j).bitwiseAND(lit(1L)), 2 * j),
        shiftleft(shiftrightunsigned(y, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }.reduce(_ + _)

  /** Z-order key over orders on (customer, order-day): the classic
    * two-dimensional access pattern (per-customer history AND
    * per-period reporting against the same table).
    *
    * Dimensions are first normalized to a common 8-bit range by
    * global min/max — interleaving RAW values is the classic z-order
    * pitfall: here yday spans 14 significant bits vs custkey's 8, so
    * every high interleaved bit would come from yday alone and the
    * "z" curve would degenerate to a plain date sort at file
    * granularity (measured: the x query pruned 0 of 16 files). This
    * is what Delta's OPTIMIZE ZORDER BY solves with range-partitioned
    * ranks; min/max scaling keeps it a closed-form expression both
    * engines replay. The min/max lookup is a 1-row broadcast scalar
    * aggregate — one extra pass at write time, amortized over every
    * pruned read.
    *
    * LayoutSpec writes the table range-partitioned by zkey and shows
    * per-file bounding boxes prune BOTH single-dimension queries,
    * where a custkey-sorted layout reads every file for a date
    * predicate.
    */
  def zorderOrders(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        col("o_custkey").as("x"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .as("yday"))
    val stats = dims.agg(
      min(col("x")).as("xmn"), max(col("x")).as("xmx"),
      min(col("yday")).as("ymn"), max(col("yday")).as("ymx"))
    def bucket(c: Column, mn: Column, mx: Column): Column =
      floor(((c - mn) * lit(256)).cast("double") / (mx - mn + lit(1)))
        .cast("long")
    dims.crossJoin(broadcast(stats))
      .select(col("o_orderkey"), col("x"), col("yday"),
        zorderKey(bucket(col("x"), col("xmn"), col("xmx")),
          bucket(col("yday"), col("ymn"), col("ymx")), bits = 8)
          .cast("long").as("zkey"))
      .orderBy("o_orderkey")
  }

  /** Small-files compaction — the maintenance pass every long-running
    * ingest needs: rewrite a fragmented parquet directory into
    * ceil(bytes / targetBytes) files. Sizing reads FILE sizes only
    * (one driver listing, no data scan); the rewrite is one
    * distributed pass. repartition (round-robin shuffle) rather than
    * coalesce: coalesce(n) would fuse the read into n tasks and lose
    * scan parallelism, and skewed input files would produce skewed
    * output files. Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    // Hadoop FileSystem API, not java.io.File: works against any
    // supported filesystem (HDFS/S3A/local), and a missing or empty
    // directory yields an empty listing rather than an NPE.
    import org.apache.hadoop.fs.{FileStatus, Path}
    def parquetFiles(d: String): Array[FileStatus] = {
      val p = new Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Array.empty
      else fs.listStatus(p)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    }
    val before = parquetFiles(inDir)
    require(before.nonEmpty, s"compact: no parquet files under $inDir")
    val nOut = math.max(1,
      math.ceil(before.map(_.getLen).sum.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    (before.length, parquetFiles(outDir).length)
  }
}
