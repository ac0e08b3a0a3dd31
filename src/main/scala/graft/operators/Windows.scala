package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** North-rule window aggregates (tumbling / sliding / session) keyed by the
  * clip_id-derived event key, over the transformed event stream.
  *
  * Numeric outputs avoid raw double sums: risk is summed as `x10` bigints so
  * the DuckDB oracle comparison is exact regardless of addition order.
  * Window bounds are emitted as epoch seconds (bigint) — partial/final agg
  * and the window bucketing all stay inside WholeStageCodegen; the only
  * shuffle is the groupBy exchange on (window, event_key).
  */
object Windows {

  private val riskX10 = round(col("risk_score") * 10).cast("bigint")

  /** Epoch seconds of a (possibly NTZ) timestamp column. The engine runs
    * with spark.sql.session.timeZone=UTC, so NTZ wall time == UTC instant
    * and this matches DuckDB's epoch_us(naive_ts)//1e6 exactly. */
  def epochS(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (unix_micros(c.cast("timestamp_ltz")) / lit(1000000L)).cast("long")

  /** Tumbling 10-minute windows (A-axis: `groupBy(window(...))`). */
  def tumbling(events: DataFrame): DataFrame =
    events.groupBy(window(col("event_time"), "10 minutes"), col("event_key"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("clip_id")).as("n_clips"),
        sum(riskX10).as("risk_x10"))
      .select(epochS(col("window.start")).as("window_start_s"),
        col("event_key"), col("n_events"), col("n_clips"), col("risk_x10"))

  /** Sliding windows: 10-minute length, 5-minute slide (2 windows/event). */
  def sliding(events: DataFrame): DataFrame =
    events.groupBy(window(col("event_time"), "10 minutes", "5 minutes"), col("event_key"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(riskX10).as("risk_x10"))
      .select(epochS(col("window.start")).as("window_start_s"),
        col("event_key"), col("n_events"), col("risk_x10"))

  /** Session windows with a 30-minute gap; window end = last event + gap. */
  def session(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("event_time"), "30 minutes"), col("event_key"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("clip_id")).as("n_clips"))
      .select(
        epochS(col("session_window.start")).as("session_start_s"),
        epochS(col("session_window.end")).as("session_end_s"),
        col("event_key"), col("n_events"), col("n_clips"))

  // ------------------------------------------------------------- oracles
  val tumblingSql: String = """
SELECT (epoch_us(event_time) // 1000000 // 600) * 600 AS window_start_s,
       event_key,
       COUNT(*) AS n_events,
       COUNT(DISTINCT clip_id) AS n_clips,
       CAST(SUM(CAST(round(risk_score * 10) AS BIGINT)) AS BIGINT) AS risk_x10
FROM ev GROUP BY 1, 2"""

  val slidingSql: String = """
SELECT ((epoch_us(event_time) // 1000000 // 300) * 300) - off AS window_start_s,
       event_key,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(risk_score * 10) AS BIGINT)) AS BIGINT) AS risk_x10
FROM ev CROSS JOIN (VALUES (0), (300)) AS offs(off)
GROUP BY 1, 2"""

  val sessionSql: String = """
SELECT session_start_s, session_end_s, event_key,
       COUNT(*) AS n_events, COUNT(DISTINCT clip_id) AS n_clips
FROM (
  SELECT event_key, clip_id,
         MIN(epoch_us(event_time) // 1000000) OVER sw AS session_start_s,
         (MAX(epoch_us(event_time)) OVER sw) // 1000000 + 1800 AS session_end_s
  FROM (
    SELECT event_key, clip_id, event_time,
           SUM(new_s) OVER (PARTITION BY event_key ORDER BY event_time
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM (
      SELECT event_key, clip_id, event_time,
             CASE WHEN lag(event_time) OVER (PARTITION BY event_key ORDER BY event_time) IS NULL
                    OR epoch_us(event_time) - epoch_us(lag(event_time) OVER (PARTITION BY event_key ORDER BY event_time)) >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM ev) t1) t2
  WINDOW sw AS (PARTITION BY event_key, sid)
) t3
GROUP BY 1, 2, 3"""
}
