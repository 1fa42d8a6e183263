package graft.jobs

import graft.sources.TextIO
import org.apache.spark.sql.SparkSession

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.{ExecutionContext, Future}

/** Thin job-registry veneer mirroring the reference's coordinator API
  * surface (internal/api/server.go): submit a word-count job over a
  * file list with an nReduce hint, query its status, health check.
  *
  * The scheduling machinery itself (task assignment, map barrier,
  * completion tracking — coordinator.go:112-267) IS Spark's
  * DAGScheduler; this class only adds the reference's *API shape* on
  * top: job ids, IN_PROGRESS/COMPLETED/FAILED states, and progress
  * counts sourced from SparkStatusTracker, matching the JSON fields
  * of GET /jobs/{id} (server.go:42-48).
  */
class JobRegistry(spark: SparkSession)(implicit ec: ExecutionContext) {

  /** Reference job states (internal/common/rpc.go + coordinator.go). */
  object State {
    val InProgress = "IN_PROGRESS"
    val Completed = "COMPLETED"
    val Failed = "FAILED"
  }

  case class JobStatus(id: Int, status: String, filesCount: Int,
                       mapTasksCompleted: Int, reduceTasksCompleted: Int)

  // status is written from the Future's executor thread and read from
  // caller threads polling status() — @volatile for JMM visibility
  private final class Rec(val files: Seq[String], val outPath: String,
                          @volatile var status: String)

  private val nextId = new AtomicInteger(0)
  private val jobs = new ConcurrentHashMap[Int, Rec]()

  /** POST /jobs equivalent: registers and launches a word-count job.
    * Validation mirrors server.go:62-65 (non-empty files, nReduce>0).
    * Returns the job id immediately; execution is async.
    */
  def submit(files: Seq[String], nReduce: Int, outPath: String): Int = {
    require(files.nonEmpty, "files must be non-empty")
    require(nReduce > 0, "nReduce must be positive")
    val id = nextId.incrementAndGet()
    val rec = new Rec(files, outPath, State.InProgress)
    jobs.put(id, rec)
    Future {
      try {
        spark.sparkContext.setJobGroup(s"graft-job-$id",
          s"word count over ${files.size} files", interruptOnCancel = true)
        TextIO.writeKV(
          TextIO.wordCountFromText(spark, files),
          "word", "cnt", outPath, nReduce)
        rec.status = State.Completed
      } catch {
        case _: Throwable => rec.status = State.Failed
      } finally spark.sparkContext.clearJobGroup()
    }
    id
  }

  /** GET /jobs/{id} equivalent. Task-progress counts come from
    * SparkStatusTracker over the job group — the engine-native
    * version of the coordinator's completed-task scan
    * (api/server.go:102-113).
    */
  def status(id: Int): Option[JobStatus] =
    Option(jobs.get(id)).map { rec =>
      val tracker = spark.sparkContext.statusTracker
      val stages = tracker.getJobIdsForGroup(s"graft-job-$id")
        .flatMap(tracker.getJobInfo(_))
        .flatMap(_.stageIds())
        .sorted
        .flatMap(sid => tracker.getStageInfo(sid))
      // map side = every stage before the final (write) stage; reduce
      // side = the final stage — the same split the reference reports
      val mapDone = stages.dropRight(1).map(_.numCompletedTasks()).sum
      val redDone = stages.takeRight(1).map(_.numCompletedTasks()).sum
      JobStatus(id, rec.status, rec.files.size, mapDone, redDone)
    }

  /** GET /health equivalent (server.go:129-135). */
  def health: String = if (spark.sparkContext.isStopped) "DOWN" else "OK"
}
