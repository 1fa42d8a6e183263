package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the reference engine's reduce-output format:
  * one text file per reduce task, `"key value"` lines, keys sorted
  * ascending within each file (internal/worker/worker.go:128-141,
  * files mr-out-{job}-{task}). This closes the sink→source loop on
  * the format `TextIO.writeKV` emits: the engine can read its own
  * (and the reference's) output as a first-class table.
  *
  * Spark-first surface, not a convenience parser:
  *  - one `InputPartition` per part-file — the natural parallelism of
  *    the format, since each file is an independent reduce output;
  *  - column pruning (`SupportsPushDownRequiredColumns`): a
  *    `select(key)` never parses the value long, a `select(value)`
  *    never materializes the key string;
  *  - filter pushdown (`SupportsPushDownFilters`) on `key`:
  *    equality/range/prefix predicates are evaluated on the raw line
  *    before any row is built, so a point lookup over a 10k-file
  *    output dir does no UTF8String/Long work for non-matching lines.
  *
  * Usage: `spark.read.format("graft.sources.KVDataSource").load(dir)`.
  * Schema is fixed `(key STRING, value BIGINT)` — the reference's
  * word/count contract; a malformed value fails loudly rather than
  * nulling (the reference never emits non-integer values).
  */
class KVDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KVDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KVTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft KV source requires a single path")))

  override def supportsExternalMetadata(): Boolean = false
}

object KVDataSource {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", LongType, nullable = false)))

  /** Key predicates this source evaluates on the raw line (before
    * building rows). Everything else stays a post-scan filter.
    */
  private[sources] def keyPredicate(f: Filter): Option[String => Boolean] = f match {
    case EqualTo("key", v: String)            => Some(_ == v)
    case GreaterThan("key", v: String)        => Some(_ > v)
    case GreaterThanOrEqual("key", v: String) => Some(_ >= v)
    case LessThan("key", v: String)           => Some(_ < v)
    case LessThanOrEqual("key", v: String)    => Some(_ <= v)
    case StringStartsWith("key", v: String)   => Some(_.startsWith(v))
    case IsNotNull("key") | IsNotNull("value") => Some(_ => true)
    case In("key", vs) if vs.forall(_.isInstanceOf[String]) =>
      val set = vs.map(_.asInstanceOf[String]).toSet; Some(set.contains)
    case _ => None
  }
}

private[sources] class KVTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_kv($path)"
  override def schema(): StructType = KVDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KVScanBuilder(path)
}

private[sources] class KVScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = KVDataSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) =
      filters.partition(f => KVDataSource.keyPredicate(f).isDefined)
    pushed = supported
    rest // Spark re-applies these post-scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = KVScan(path, required, pushed)
}

private[sources] case class KVScan(path: String, required: StructType,
                                   pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // surfaces in .explain() so plan guards can assert pruning/pushdown
  override def description(): String =
    s"graft_kv path=$path, ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  /** One partition per reduce-output file: listing is driver-side and
    * O(#files); the format has no splits within a file (the reference
    * writes one sorted run per task), so per-file is both the natural
    * and the maximal parallelism.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val files = fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    files.sortBy(_.getPath.getName)
      .map(st => KVInputPartition(st.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    KVReaderFactory(required, pushed)
}

private[sources] case class KVInputPartition(file: String) extends InputPartition

private[sources] case class KVReaderFactory(required: StructType,
                                            pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KVPartitionReader(partition.asInstanceOf[KVInputPartition].file,
      required, pushed)
}

private[sources] class KVPartitionReader(file: String, required: StructType,
                                         pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val keyTests = pushed.flatMap(KVDataSource.keyPredicate)
  private val fieldOrder = required.fieldNames

  private val reader = {
    val p = new Path(file)
    val fs = p.getFileSystem(new Configuration())
    new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), java.nio.charset.StandardCharsets.UTF_8))
  }
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      // key may contain spaces (writeKV stringifies arbitrary keys);
      // the value never does, so split on the LAST space
      val cut = line.lastIndexOf(' ')
      if (cut > 0) {
        val k = line.substring(0, cut)
        if (keyTests.forall(_(k))) {
          val vals = fieldOrder.map {
            case "key"   => UTF8String.fromString(k)
            case "value" => java.lang.Long.parseLong(line.substring(cut + 1))
          }
          row = InternalRow.fromSeq(vals.toIndexedSeq)
          return true
        }
      }
      line = reader.readLine()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
