package graft.api

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Thin job-management façade — parity with the reference's JobManager REST
  * surface (reference: jobmanager/api.py: submit :169-253, status :256-278,
  * cancel :281-329, metrics :332-352, list :384-398), which fronts a
  * hand-built scheduler/resource-manager. Here jobs are streaming queries;
  * scheduling, deployment, failover and checkpointing are the platform's.
  * Unlike the reference's metrics endpoint (hard-coded mocks,
  * api.py:342-352), these numbers come from the engine's real progress
  * events.
  */
final class JobServer(spark: SparkSession) {

  /** Last progress snapshot per query id, fed by a listener — the live
    * equivalent of the reference's metrics plane
    * (taskmanager/metrics.py:10-120).
    */
  private val progress = TrieMap.empty[java.util.UUID, JobMetrics]

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      progress.put(p.id, JobMetrics(
        recordsPerSecond = p.processedRowsPerSecond,
        inputRowsPerSecond = p.inputRowsPerSecond,
        batchDurationMs = p.batchDuration,
        numInputRows = p.numInputRows,
        stateRows = Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal).sum))
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }
  spark.streams.addListener(listener)

  /** POST /jobs/submit (api.py:169-253): a job is a started query. */
  def submit(name: String, start: => StreamingQuery): JobHandle = {
    val q = start
    JobHandle(name, q)
  }

  /** GET /jobs (api.py:384-398). */
  def listJobs(): Seq[JobHandle] =
    spark.streams.active.toSeq.map(q => JobHandle(Option(q.name).getOrElse(q.id.toString), q))

  /** GET /jobs/{id}/status (api.py:256-278). */
  def status(q: StreamingQuery): String =
    if (q.isActive) "RUNNING"
    else if (q.exception.isDefined) "FAILED"
    else "FINISHED"

  /** GET /jobs/{id}/metrics (api.py:332-352) — real numbers, not mocks. */
  def metrics(q: StreamingQuery): Option[JobMetrics] = progress.get(q.id)

  /** POST /jobs/{id}/cancel (api.py:281-329). The with_savepoint variant is
    * implicit: a checkpointed query can always be resumed from its
    * checkpointLocation (the reference's recover endpoint, api.py:446-515).
    */
  def cancel(q: StreamingQuery): Unit = q.stop()

  def close(): Unit = spark.streams.removeListener(listener)
}

final case class JobHandle(name: String, query: StreamingQuery) {
  def id: java.util.UUID = query.id
  def isActive: Boolean = query.isActive
}

final case class JobMetrics(
    recordsPerSecond: Double,
    inputRowsPerSecond: Double,
    batchDurationMs: Long,
    numInputRows: Long,
    stateRows: Long)
