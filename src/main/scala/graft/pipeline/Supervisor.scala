package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Supervised pipeline lifecycle: automatic restart with exponential
  * backoff after a failure (reference `pkg/lifecycle/service.go:238`
  * and the recovery design doc
  * `docs/design-documents/20240812-recover-from-pipeline-errors.md`).
  *
  * The query restarts from its CHECKPOINT, so recovery is no-loss
  * (RecoverySpec proves the offsets contract); a run that stays
  * healthy for `healthyResetMs` resets the attempt counter (the
  * reference resets backoff after a healthy period), and when
  * `maxRetries` consecutive attempts fail the pipeline transitions to
  * DEGRADED and stops retrying (the operator intervenes via the
  * control plane).
  */
final class Supervisor(startQuery: () => StreamingQuery,
                       maxRetries: Int = 5,
                       backoffMinMs: Long = 100,
                       backoffMaxMs: Long = 10000,
                       backoffFactor: Double = 2.0,
                       healthyResetMs: Long = 60000) {

  object Status {
    val Running = "running"
    val Degraded = "degraded"
    val Stopped = "stopped"
  }

  @volatile private var _status: String = Status.Stopped
  @volatile private var _lastError: Option[Throwable] = None
  @volatile private var _restarts: Int = 0
  @volatile private var stopping = false
  @volatile private var current: Option[StreamingQuery] = None
  private var thread: Thread = _

  def status: String = _status
  def lastError: Option[Throwable] = _lastError
  def restarts: Int = _restarts
  def query: Option[StreamingQuery] = current

  def start(): Supervisor = synchronized {
    require(thread == null, "supervisor already started")
    stopping = false
    _status = Status.Running
    thread = new Thread(() => loop(), "pipeline-supervisor")
    thread.setDaemon(true)
    thread.start()
    this
  }

  private def loop(): Unit = {
    var attempt = 0
    while (!stopping) {
      val startedAt = System.nanoTime()
      try {
        val q = startQuery()
        current = Some(q)
        // a stop() that landed while startQuery() was in flight saw
        // current empty and had nothing to stop — without this check
        // the loop would block in awaitTermination on a query nobody
        // stops, leak it past join's timeout, and leave it RUNNING
        // after stop() returned (observed: a leaked generator query
        // polluting a later suite's sink)
        if (stopping) { q.stop(); _status = Status.Stopped; return }
        q.awaitTermination() // returns on graceful stop, throws on failure
        if (!stopping) {
          // query self-terminated without error (bounded source drained)
          _status = Status.Stopped
          return
        }
      } catch {
        case e: Throwable if !stopping =>
          _lastError = Some(e)
          val ranMs = (System.nanoTime() - startedAt) / 1000000L
          if (ranMs >= healthyResetMs) attempt = 0 // healthy period → reset
          if (attempt >= maxRetries) {
            _status = Status.Degraded
            return
          }
          val delay = math.min(backoffMaxMs.toDouble,
            backoffMinMs * math.pow(backoffFactor, attempt)).toLong
          attempt += 1
          _restarts += 1
          try Thread.sleep(delay) catch { case _: InterruptedException => return }
      }
    }
    _status = Status.Stopped
  }

  def stop(): Unit = synchronized {
    stopping = true
    current.foreach(q => if (q.isActive) q.stop())
    if (thread != null) {
      // the loop may still be inside startQuery(): keep re-issuing the
      // stop against whatever query materializes until the thread
      // exits (paired with the loop-side stopping check — between
      // them, a query started during stop() cannot survive it)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (thread.isAlive && System.nanoTime() < deadline) {
        current.foreach(q => if (q.isActive) q.stop())
        thread.join(200)
      }
      thread = null
    }
    _status = Status.Stopped
  }
}

object Supervisor {
  /** Supervise [[Runner.start]] for a pipeline — the reference's
    * `recovery.*` settings map onto the constructor knobs.
    */
  def apply(spark: SparkSession, pipeline: PipelineConfig, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second"),
            maxRetries: Int = 5, backoffMinMs: Long = 100,
            backoffMaxMs: Long = 10000, backoffFactor: Double = 2.0,
            healthyResetMs: Long = 60000): Supervisor =
    new Supervisor(() => Runner.start(spark, pipeline, checkpointDir, trigger),
      maxRetries, backoffMinMs, backoffMaxMs, backoffFactor, healthyResetMs)
}
