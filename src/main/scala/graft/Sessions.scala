package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session config so Verify, Bench, and tests
  * run identical settings.
  */
object Sessions {

  /** Apply graft's standard config to a session builder.
    *
    * @param cpus   local parallelism; shuffle partitions match it
    *               (local mode — on a real cluster this would be
    *               ~2-3× total executor cores).
    */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // native function registration at session build
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // events.ts is timestamp[ns]; Spark 4 otherwise refuses the scan
      // (see Tables.events for the long→timestamp rebuild)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed-table demos (saveAsTable) write here, never the repo
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")

  def local(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = configure(SparkSession.builder().appName(appName), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
