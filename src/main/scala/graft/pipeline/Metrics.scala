package graft.pipeline

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Pipeline observability (reference §2.4):
  *
  *  - MetricsNode (`pkg/lifecycle/stream/metrics.go:24` — per-pipeline
  *    record/byte throughput) → a `StreamingQueryListener` fed by
  *    Spark's own progress events: no extra pass over the data.
  *  - Inspector (`pkg/inspector/inspector.go:28,33,55` — live tap with
  *    a bounded ring buffer, dropping when full) → a driver-side ring
  *    fed from `foreachBatch` with a bounded `limit` collect per batch.
  */
object Metrics {

  final case class QuerySnapshot(batches: Long, inputRows: Long,
                                 lastRowsPerSecond: Double)

  private val counters = new ConcurrentHashMap[String, (AtomicLong, AtomicLong)]()
  @volatile private var lastRate = Map.empty[String, Double]

  private def of(name: String) =
    counters.computeIfAbsent(name, _ => (new AtomicLong, new AtomicLong))

  private val attached =
    java.util.Collections.newSetFromMap(
      new ConcurrentHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]())

  /** Attach the listener once per session (idempotent). */
  def attach(spark: org.apache.spark.sql.SparkSession): Unit =
    if (attached.add(spark)) spark.streams.addListener(listener)

  /** Attach once per SparkSession. */
  def listener: StreamingQueryListener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val name = Option(e.progress.name).getOrElse(e.progress.id.toString)
      val (batches, rows) = of(name)
      batches.incrementAndGet()
      rows.addAndGet(e.progress.numInputRows)
      lastRate += name -> e.progress.processedRowsPerSecond
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  def snapshot(pipelineId: String): QuerySnapshot = {
    val (batches, rows) = of(pipelineId)
    QuerySnapshot(batches.get(), rows.get(), lastRate.getOrElse(pipelineId, 0.0))
  }

  /** Inspector ring buffer: last `capacity` wire-JSON records per tap
    * session; excess records in a batch are dropped (reference
    * drop-on-full semantics, buffer default 1000).
    */
  final class Inspector(val id: String, capacity: Int = 1000,
                        maxSessions: Int = 64, idleTimeoutMs: Long = 60000L) {
    private val ring = new java.util.concurrent.ArrayBlockingQueue[String](capacity)
    private final class Session(cap: Int) {
      val q = new java.util.concurrent.ArrayBlockingQueue[String](cap)
      val lastDrain = new AtomicLong(System.currentTimeMillis())
    }
    private val sessions = new ConcurrentHashMap[String, Session]()
    private val sessionSeq = new AtomicLong()

    /** Drop sessions nobody has drained within the idle timeout: a
      * caller that died between openSession and its finally (or forgot
      * closeSession) must not pin a buffer that offer() fills on the
      * streaming hot path forever (the reference closes sessions on
      * context cancel — wall-clock idleness is the facade-agnostic
      * equivalent). */
    private def expireIdle(now: Long): Unit =
      sessions.forEach { (k, s) =>
        if (now - s.lastDrain.get() > idleTimeoutMs) sessions.remove(k)
      }

    private[pipeline] def offer(records: Seq[String]): Unit = {
      records.foreach { r => if (!ring.offer(r)) () } // drop when full
      if (!sessions.isEmpty) {
        expireIdle(System.currentTimeMillis())
        sessions.forEach { (_, s) =>
          records.foreach { r => if (!s.q.offer(r)) () }
        }
      }
    }
    def drain(): Seq[String] = {
      val out = new java.util.ArrayList[String]()
      ring.drainTo(out)
      scala.jdk.CollectionConverters.ListHasAsScala(out).asScala.toSeq
    }

    /** Open a private tap session (reference `inspector.go:33` — each
      * Inspect call gets its own bounded buffer, so concurrent
      * inspectors never steal each other's records). Close it when the
      * stream ends; abandoned sessions expire after `idleTimeoutMs`
      * without a drain, and concurrent sessions are capped. */
    def openSession(capacity: Int = 1000): String = {
      expireIdle(System.currentTimeMillis()) // dead callers don't pin the cap
      if (sessions.size >= maxSessions) throw new IllegalStateException(
        s"inspector $id: $maxSessions concurrent sessions already open")
      val key = s"$id-session-${sessionSeq.incrementAndGet()}"
      sessions.put(key, new Session(capacity))
      key
    }
    /** Drain a session's buffered records. Returns `None` for an
      * unknown or idle-expired key — distinct from `Some(Nil)` ("no
      * records yet") so a caller polling slower than `idleTimeoutMs`
      * sees its tap died and can reopen, instead of polling a dead
      * key forever. */
    def drainSession(key: String): Option[Seq[String]] =
      Option(sessions.get(key)).map { s =>
        s.lastDrain.set(System.currentTimeMillis())
        val out = new java.util.ArrayList[String]()
        s.q.drainTo(out)
        scala.jdk.CollectionConverters.ListHasAsScala(out).asScala.toSeq
      }
    def sessionExists(key: String): Boolean = sessions.containsKey(key)
    def closeSession(key: String): Unit = sessions.remove(key)
  }

  private val inspectors = new ConcurrentHashMap[String, Inspector]()
  def inspector(id: String, capacity: Int = 1000): Inspector =
    inspectors.computeIfAbsent(id, _ => new Inspector(id, capacity))
  def inspectorFor(id: String): Option[Inspector] = Option(inspectors.get(id))
}
