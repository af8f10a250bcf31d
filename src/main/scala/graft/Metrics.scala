package graft

import java.util.concurrent.atomic.LongAdder

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query engine observability (SURVEY §2 R23). The reference's one
  * operational virtue is structured per-batch logs (sql_to_line.py:30-36,
  * 113-131: rows touched, batch id, timings); this is the engine analog:
  * a SparkListener that attributes executor task metrics — shuffle bytes,
  * spill, peak execution memory, input records, CPU time — to the logical
  * query that ran them, keyed by a job-local property so concurrent
  * queries on one session don't cross-contaminate. Bench dumps the
  * snapshot into its JSON line (per-query shuffle/spill bytes).
  */
final class QueryStats {
  val tasks             = new LongAdder
  val inputRecords      = new LongAdder
  val shuffleReadBytes  = new LongAdder
  val shuffleWriteBytes = new LongAdder
  val memorySpilled     = new LongAdder
  val diskSpilled       = new LongAdder
  val cpuTimeNs         = new LongAdder
  @volatile var peakExecutionMemory = 0L

  private[graft] def bumpPeak(p: Long): Unit = synchronized {
    if (p > peakExecutionMemory) peakExecutionMemory = p
  }
}

/** Attributes task metrics to queries via [[Metrics.QueryKey]]: the job's
  * local properties carry the query name (set by [[Metrics.observe]]); job
  * start maps its stages to that name; task end folds the task's metrics
  * into the owning query's accumulators. Listener callbacks are
  * asynchronous — flush the bus (GraftSparkBridge.waitListenerBus) before
  * reading a snapshot.
  */
final class QueryMetricsListener extends SparkListener {
  private val stageToQuery = TrieMap.empty[Int, String]
  private val jobToStages  = TrieMap.empty[Int, Seq[Int]]
  private val stats        = TrieMap.empty[String, QueryStats]

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val q = Option(js.properties).map(_.getProperty(Metrics.QueryKey)).orNull
    if (q != null) {
      js.stageIds.foreach(sid => stageToQuery.put(sid, q))
      jobToStages.put(js.jobId, js.stageIds)
    }
  }

  // prune the stage→query index when its job finishes (task-end events for
  // a stage precede its job's end) — a long-lived session must not accrete
  // one entry per stage forever
  override def onJobEnd(je: SparkListenerJobEnd): Unit =
    jobToStages.remove(je.jobId).foreach(_.foreach(stageToQuery.remove))

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
    stageToQuery.get(te.stageId).foreach { q =>
      val m = te.taskMetrics
      if (m != null) {
        val s = stats.getOrElseUpdate(q, new QueryStats)
        s.tasks.increment()
        s.inputRecords.add(m.inputMetrics.recordsRead)
        s.shuffleReadBytes.add(m.shuffleReadMetrics.totalBytesRead)
        s.shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
        s.memorySpilled.add(m.memoryBytesSpilled)
        s.diskSpilled.add(m.diskBytesSpilled)
        s.cpuTimeNs.add(m.executorCpuTime)
        s.bumpPeak(m.peakExecutionMemory)
      }
    }

  /** Current per-query stats (live objects — read after a bus flush). */
  def snapshot: Map[String, QueryStats] = stats.readOnlySnapshot().toMap
}

object Metrics {
  /** Job-local property carrying the logical query name. */
  final val QueryKey = "graft.query.name"

  /** Run `f` with all jobs it spawns attributed to `name`. */
  def observe[T](spark: SparkSession, name: String)(f: => T): T = {
    spark.sparkContext.setLocalProperty(QueryKey, name)
    try f finally spark.sparkContext.setLocalProperty(QueryKey, null)
  }
}

/** Streaming twin of [[QueryMetricsListener]] (R23 for the streaming
  * plane): per-micro-batch input rows, processed-rows/sec, state-store
  * rows and watermark, keyed by query name — what an operator watches to
  * know a stream is keeping up (input rate vs processing rate) and that
  * state is bounded (rows stable once the watermark advances). Attach via
  * `spark.streams.addListener`.
  */
final class StreamMetricsListener
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._

  final case class BatchStats(batchId: Long, inputRows: Long,
      stateRows: Long, watermark: String)

  /** Newest batches kept per query — a 1 s-trigger stream produces ~86k
    * batches/day; unbounded history would be a slow leak.
    */
  final val MaxBatchesPerQuery = 1024

  private val batches = TrieMap.empty[String, List[BatchStats]]

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p  = e.progress
    val st = if (p.stateOperators == null) 0L
      else p.stateOperators.map(_.numRowsTotal).sum
    val wm = Option(p.eventTime).flatMap(m => Option(m.get("watermark"))).getOrElse("")
    val bs = BatchStats(p.batchId, p.numInputRows, st, wm)
    batches.updateWith(p.name match { case null => p.id.toString; case n => n }) {
      case Some(xs) => Some((bs :: xs).take(MaxBatchesPerQuery))
      case None     => Some(bs :: Nil)
    }
  }

  /** Newest-first batch stats per query name. */
  def snapshot: Map[String, List[BatchStats]] = batches.readOnlySnapshot().toMap
}
