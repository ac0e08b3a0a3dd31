package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Streaming conservation counters (reference A1: incoming_logs_total /
  * outgoing_logs_total / dropped_logs_total, METRICS.md:42) the Spark way:
  * `observe()` metrics evaluated inside the plan (no extra pass) and a
  * StreamingQueryListener that collects them per micro-batch, so the sink
  * can persist them with each commit (north rule: per-partition lineage +
  * metrics in the commit manifest — lineage comes from the manifest's
  * per-file rows, counters from here). */
object Metrics {

  val ObservationName = "graft_counters"

  /** Attach conservation counters to the event stream. */
  def observeEvents(events: DataFrame): DataFrame =
    events.observe(ObservationName,
      count(lit(1)).as("outgoing_events_total"),
      count_distinct(col("clip_id")).as("expanded_clips_total"),
      sum(round(col("risk_score") * 10).cast("bigint")).as("risk_x10_total"))

  /** Collects observed metrics per (queryName → batchId). */
  final class Listener extends StreamingQueryListener {
    val byBatch: TrieMap[Long, Map[String, Long]] = TrieMap.empty

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val om = e.progress.observedMetrics.asScala.get(ObservationName)
      om.foreach { row =>
        val m = row.schema.fieldNames.zipWithIndex.map { case (f, i) =>
          f -> (if (row.isNullAt(i)) 0L else row.getLong(i))
        }.toMap
        byBatch.put(e.progress.batchId, m)
      }
    }
  }
}
