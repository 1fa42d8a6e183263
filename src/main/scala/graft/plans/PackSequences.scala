package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Sequence packing — the LLM-pipeline step that bins documents into
  * fixed token-budget context windows. Greedy packing is a sequential
  * recurrence (the bin a document lands in depends on the running
  * total of every earlier document), which no composition of
  * DataFrame operators expresses: a window cumulative sum can't model
  * the reset-on-overflow state. This is the textbook case for the
  * brief's tier (c): a custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered through `SparkSessionExtensions`.
  *
  * Distributed semantics (the only kind that exists at 100 TB, where
  * a single global greedy pass is impossible): rows are
  * RANGE-partitioned and sorted by the key (the exec REQUIRES
  * `OrderedDistribution`, so Catalyst inserts exactly one range
  * exchange + sort), each partition packs its contiguous key range
  * greedily, and bin ids are made globally unique and dense by
  * offsetting each partition's local ids with the bin counts of the
  * partitions before it — the same count-pass-then-emit-pass scheme
  * as `RDD.zipWithIndex`, collecting one long per partition.
  * Partition boundaries may start a fresh bin where a global pass
  * would not; that slack is bounded by (#partitions − 1) bins total.
  */
case class PackSequences(budget: Long, tok: Attribute, key: Attribute,
                         binId: AttributeReference, child: LogicalPlan)
    extends UnaryNode {
  require(budget > 0, s"pack budget must be positive, got $budget")
  override def output: Seq[Attribute] = child.output :+ binId
  override def producedAttributes: AttributeSet = AttributeSet(binId)
  override protected def withNewChildInternal(newChild: LogicalPlan): PackSequences =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its exec. */
object PackSequencesStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: PackSequences =>
      PackSequencesExec(p.budget, p.tok, p.key, p.binId, planLater(p.child)) :: Nil
    case _ => Nil
  }
}

case class PackSequencesExec(budget: Long, tok: Attribute, key: Attribute,
                             binId: AttributeReference, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ binId

  // contiguous key ranges per partition + in-partition key order:
  // Catalyst plants one range Exchange and one Sort under this node
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(OrderedDistribution(Seq(SortOrder(key, Ascending))))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(key, Ascending)))

  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  private def tokenAt(idx: Int, dt: org.apache.spark.sql.types.DataType)
                     (row: InternalRow): Long = dt match {
    case LongType    => row.getLong(idx)
    case IntegerType => row.getInt(idx).toLong
    case other => throw new IllegalArgumentException(
      s"token column must be integral, got $other")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val childRdd = child.execute()
    val tokIdx = child.output.indexWhere(_.exprId == tok.exprId)
    require(tokIdx >= 0, s"token column $tok not found in ${child.output}")
    val dt = child.output(tokIdx).dataType
    val b = budget
    val getTok = tokenAt(tokIdx, dt) _

    // pass 1: bins per partition (one long each — same driver cost as
    // RDD.zipWithIndex; the shuffle feeding both passes runs once)
    val binsPerPart: Array[Long] = childRdd.mapPartitions { it =>
      var bins = 0L; var run = 0L
      it.foreach { r =>
        val t = getTok(r)
        if (bins == 0L || run + t > b) { bins += 1; run = t } else run += t
      }
      Iterator.single(bins)
    }.collect()
    val offsets = binsPerPart.scanLeft(0L)(_ + _)

    // pass 2: emit rows with globally dense bin ids
    val outAttrs = output
    val childAttrs = child.output
    childRdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(outAttrs, childAttrs :+ binId)
      val binRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      var bin = offsets(pid) - 1
      var run = 0L
      var first = true
      it.map { r =>
        val t = getTok(r)
        if (first || run + t > b) { bin += 1; run = t; first = false }
        else run += t
        binRow.setLong(0, bin)
        proj(joined(r, binRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PackSequencesExec =
    copy(child = newChild)
}
