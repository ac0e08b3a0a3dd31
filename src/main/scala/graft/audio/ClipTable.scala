package graft.audio

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's input table per BASELINE.json `input_hint`:
  * `(clip_id:string, bytes:binary, sr_hz:int, dur_ms:int, codec:string, transcript:string)`.
  *
  * For the driver's correctness gate, the clip table is DERIVED
  * deterministically from the driver-generated `events` parquet with a
  * single portable SQL text ([[CLIPS_SQL]]) executed verbatim by BOTH Spark
  * and the DuckDB oracle — value parity by construction. `bytes` is
  * synthesized separately (Spark-only; see [[graft.functions.PcmSynth]])
  * because audio bytes are never part of a SQL-expressible oracle.
  *
  * Skew is deliberate (FIXTURES.md §1): 70% of rows land on sr_hz=16000 and
  * 80% on codec=pcm_s16le, to exercise hot-partition salting at scale.
  */
object ClipTable {

  /** Portable SQL (valid Spark SQL AND DuckDB SQL) deriving the clip table
    * from the `events` table. Seeded entirely by (event_id, user_id, ts). */
  val CLIPS_SQL: String = """
SELECT
  'clip-t' || CAST(user_id % 8 AS STRING) || '-s' || CAST(event_id % 4 AS STRING)
    || '-' || LPAD(CAST(event_id AS STRING), 10, '0') AS clip_id,
  CAST(CASE WHEN event_id % 10 < 7 THEN 16000
            WHEN event_id % 10 = 7 THEN 8000
            WHEN event_id % 10 = 8 THEN 44100
            ELSE 48000 END AS INT) AS sr_hz,
  CAST(200 + (event_id % 10) * 100 AS INT) AS dur_ms,
  CASE WHEN event_id % 20 < 16 THEN 'pcm_s16le'
       WHEN event_id % 20 < 19 THEN 'wav'
       ELSE 'opus-stub' END AS codec,
  CASE WHEN event_id % 37 = 0 THEN CAST(NULL AS STRING)
       ELSE 'clip audio segment '
         || CASE WHEN event_id % 3 = 0 THEN 'access denied ' ELSE '' END
         || CASE WHEN event_id % 5 = 0 THEN 'privilege escalation ' ELSE '' END
         || CASE WHEN event_id % 7 = 0 THEN 'login ok ' ELSE '' END
         || CASE WHEN event_id % 11 = 0 THEN 'policy skipped ' ELSE '' END
         || 'user ' || CAST(user_id AS STRING)
  END AS transcript,
  ts AS event_time,
  user_id AS tenant_id,
  event_id
FROM events
"""

  /** DuckDB CTE prelude shared by every oracle query: clips + rules. */
  def oraclePrelude: String =
    s"WITH clips AS (${CLIPS_SQL.trim}),\nrules AS (${Rules.valuesSql})\n"

  /** Spark side of the same derivation: register `events` and run the
    * identical SQL text. Filter/column pruning still reaches the parquet
    * scan because the projection is a plain Project over the scan. */
  def clips(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/events.parquet").createOrReplaceTempView("events")
    spark.sql(CLIPS_SQL)
  }

  /** Owner-reference analog (reference E1, processor.go:519-587): an array
    * of JSON strings attached to some clips. First workload-kind ref wins;
    * Pod/Service refs are skipped. Deterministic from event_id/tenant_id.
    * (Built with DataFrame API — the oracle mirrors it with list_value.) */
  def withOwnerRefs(clipsDf: DataFrame): DataFrame = {
    val tenant = col("tenant_id")
    clipsDf.withColumn("owner_refs",
      when(col("event_id") % 4 === 0, array(
        lit("""{"kind":"Pod","name":"pod-ref","uid":"pu"}"""),
        concat(lit("""{"kind":"ReplicaSet","name":"rs-"""), tenant, lit("""","uid":"ru-"""), tenant, lit("\"}")),
        concat(lit("""{"kind":"Deployment","name":"dep-"""), tenant, lit("""","uid":"du-"""), tenant, lit("\"}"))
      )).when(col("event_id") % 4 === 1, array(
        concat(lit("""{"kind":"StatefulSet","name":"sts-"""), tenant, lit("""","uid":"su-"""), tenant, lit("\"}"))
      )).when(col("event_id") % 4 === 2, array(
        lit("""{"kind":"Service","name":"svc-ref","uid":"vu"}"""),
        lit("not-json-at-all")
      )).otherwise(array().cast("array<string>")))
  }

  /** Same owner_refs derivation as DuckDB SQL (column expression over a
    * clips row). Kept textually tiny so drift is reviewable at a glance. */
  val OWNER_REFS_DUCK: String = """
  CASE WHEN event_id % 4 = 0 THEN [
         '{"kind":"Pod","name":"pod-ref","uid":"pu"}',
         '{"kind":"ReplicaSet","name":"rs-' || CAST(tenant_id AS STRING) || '","uid":"ru-' || CAST(tenant_id AS STRING) || '"}',
         '{"kind":"Deployment","name":"dep-' || CAST(tenant_id AS STRING) || '","uid":"du-' || CAST(tenant_id AS STRING) || '"}']
       WHEN event_id % 4 = 1 THEN [
         '{"kind":"StatefulSet","name":"sts-' || CAST(tenant_id AS STRING) || '","uid":"su-' || CAST(tenant_id AS STRING) || '"}']
       WHEN event_id % 4 = 2 THEN ['{"kind":"Service","name":"svc-ref","uid":"vu"}', 'not-json-at-all']
       ELSE [] END
"""
}
