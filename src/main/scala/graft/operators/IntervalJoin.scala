package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-interval join between the transformed clip-event stream and a
  * rolling rule-activation stream (north rule: "watermarked stream-stream
  * stateful joins between the clip stream and a rolling transcript-rule
  * stream"). This is the batch form used by the oracle-checked query; the
  * watermarked streaming form lives in graft.streaming.
  *
  * The activation side is derived deterministically from `events` (every
  * 97th event activates one of four rules), so the oracle can rebuild it.
  * Scale note: the activation stream is sparse (~1% of events); Spark picks
  * a broadcast hash join for it at bench scale, with the range predicate
  * applied post-join — exactly what we want, no sort-merge shuffle.
  */
object IntervalJoin {

  val WithinS = 3600L

  def activations(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/events.parquet").createOrReplaceTempView("events")
    spark.sql("""
      SELECT CASE event_id % 4 WHEN 0 THEN 'r-access-denied'
                               WHEN 1 THEN 'r-priv-esc'
                               WHEN 2 THEN 'r-login-ok'
                               ELSE 'r-skip' END AS rule_id,
             ts AS active_from,
             event_id AS act_id
      FROM events WHERE event_id % 97 = 0""")
  }

  /** events ⋈ activations on rule equality + |Δt| ≤ WithinS.
    *
    * rule_id alone is a terrible join key (4 distinct values), so a plain
    * equi-join materializes ~|events|×|acts|/4 pairs before the range
    * filter. The join key is therefore (rule_id, time_bucket) with buckets
    * of WithinS: the sparse activation side explodes to its bucket ±1
    * (any pair within WithinS shares one of those buckets; an event's
    * single bucket matches at most one of an activation's three, so no
    * dedup is needed) and the exact |Δt| predicate verifies. Candidates
    * drop from "all activations of the rule" to "activations within ±1
    * bucket" — the interval-join analog of LSH banding.
    *
    * The broadcast hint is SIZE-GATED, not hard-pinned: the activation side
    * is ~1% of events — kilobytes at bench scale but ~10^10 rows at 10^12
    * events, where a forced broadcast OOMs the driver. Below
    * `maxBroadcastBytes` (default: the session's
    * autoBroadcastJoinThreshold) we hint; above it the bucketed
    * (rule_id, _tb) equi-key makes the un-hinted shuffle hash join
    * scale-safe, and AQE can still pick a runtime broadcast. */
  def join(events: DataFrame, acts: DataFrame,
           maxBroadcastBytes: Option[Long] = None): DataFrame = {
    def us(c: String) = unix_micros(col(c).cast("timestamp_ltz"))
    val w = WithinS * 1000000L
    // integer DIV, not double '/': a double quotient 1 ulp under an integer
    // would bucket a boundary row wrong
    def bucket(c: String) =
      expr(s"unix_micros(CAST($c AS TIMESTAMP_LTZ)) DIV ${w}L")
    val e = events.withColumn("_tb", bucket("event_time"))
    val a = acts
      .withColumn("_ab", bucket("active_from"))
      .withColumn("_tb", explode(array(col("_ab") - 1, col("_ab"), col("_ab") + 1)))
      .drop("_ab")
    val threshold = maxBroadcastBytes.getOrElse(
      events.sparkSession.sessionState.conf.autoBroadcastJoinThreshold)
    // ×3 for the bucket explode of the activation side
    val estBytes = acts.queryExecution.optimizedPlan.stats.sizeInBytes * 3
    val aSide = if (threshold >= 0 && estBytes <= threshold) broadcast(a) else a
    e.join(aSide, Seq("rule_id", "_tb"))
      .filter(abs(us("event_time") - us("active_from")) <= w)
      .select(col("rule_id"), col("clip_id"), col("act_id"),
        us("event_time").as("ev_us"),
        us("active_from").as("act_us"))
  }

  val activationsSqlDuck: String = """
acts AS (
  SELECT CASE event_id % 4 WHEN 0 THEN 'r-access-denied'
                           WHEN 1 THEN 'r-priv-esc'
                           WHEN 2 THEN 'r-login-ok'
                           ELSE 'r-skip' END AS rule_id,
         ts AS active_from,
         event_id AS act_id
  FROM events WHERE event_id % 97 = 0
)"""

  val joinSqlDuck: String = s"""
SELECT e.rule_id, e.clip_id, a.act_id,
       epoch_us(e.event_time) AS ev_us,
       epoch_us(a.active_from) AS act_us
FROM ev e JOIN acts a ON e.rule_id = a.rule_id
WHERE abs(epoch_us(e.event_time) - epoch_us(a.active_from)) <= ${WithinS}000000"""
}
