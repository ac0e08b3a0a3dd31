package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.audio.Rules

/** The reference's per-record normalize/classify/enrich pipeline
  * (reference: /root/reference/internal/openreports/processor.go:50-320 and
  * :345-460) re-expressed as pure Catalyst column algebra over the clip
  * table. Every lookup table / template / edge case is reproduced verbatim,
  * including the intentional-looking inconsistency where an unknown
  * severity maps to finding_severity=MEDIUM but risk_score=0.0
  * (processor.go:463-493; pinned by processor_test.go:398 vs :431).
  *
  * Scale notes: the rule side is a tiny dimension → always `broadcast()`;
  * the whole match+transform is a single WholeStageCodegen stage with no
  * shuffle (verified via explain) — it is embarrassingly parallel, which is
  * what makes the N→4N ≥0.8 scaling criterion reachable.
  */
object Pipeline {

  // ---------------------------------------------------------------- F1 gate
  /** Gate predicate (F1) — analog of kind=="Report" && apiVersion==...
    * (reference processor.go:280-296): clip is eligible iff its codec is
    * decodable and it has a transcript. Cheap, evaluated before any join. */
  val gate: Column =
    col("codec").isin("pcm_s16le", "wav") && col("transcript").isNotNull

  // ------------------------------------------------- X1+X3: match + decode
  /** True iff the payload is well-formed JSON. `from_json` alone cannot
    * express the reference's skip-on-parse-error semantics: in PERMISSIVE
    * mode it yields a struct of nulls for malformed input, not a null
    * struct. `try_parse_json` (variant) returns NULL exactly on malformed. */
  val decodeOk: Column = try_parse_json(col("payload_json")).isNotNull

  /** Rule-eval explode (X1) BEFORE the tolerant decode: one clip × N
    * matching rules via a broadcast theta-join on substring containment.
    * Exposed separately so the streaming path can `observe()` labeled
    * error counters on the pre-filter stream (the decode-skipped rows are
    * gone after [[matches]]). */
  def rawMatches(clips: DataFrame, spark: SparkSession): DataFrame =
    clips.filter(gate)
      .join(broadcast(Rules.df(spark)), expr("contains(transcript, pattern)"))

  /** Tolerant JSON decode (X3) over [[rawMatches]]: malformed payloads are
    * dropped, matching the reference's skip-that-element semantics
    * (processor.go:229-241). */
  def decodeFiltered(raw: DataFrame): DataFrame =
    raw.filter(decodeOk)
      .withColumn("r", from_json(col("payload_json"), Rules.payloadSchema))
      .filter(col("r").isNotNull)

  /** X1 + X3 in one call. */
  def matches(clips: DataFrame, spark: SparkSession): DataFrame =
    decodeFiltered(rawMatches(clips, spark))

  // ----------------------------------------------------- F2: status filter
  /** IN-list status filter (F2) — empty filter keeps all
    * (reference internal/openreports/processor.go:702-716). */
  def statusFilter(allowed: Seq[String]): Column =
    if (allowed.isEmpty) lit(true) else col("r.result").isin(allowed: _*)

  // ------------------------------------------------------- E2: event key
  /** clip_id-derived event key (E2 analog of pod-name workload inference,
    * reference processor.go:561-620): split on '-', drop the last two
    * segments, rejoin; needs ≥3 segments to produce anything. */
  def eventKey(clipId: Column): Column = {
    val parts = split(clipId, "-")
    when(size(parts) >= lit(3),
      array_join(slice(parts, lit(1), size(parts) - 2), "-"))
  }

  // ------------------------------------------------- M4/M5/M6 lookup maps
  /** mapSeverityToUppercase (M4): case-sensitive; anything unknown → MEDIUM.
    * Caller is responsible for the "empty severity ⇒ unset" rule. */
  def severityUpper(sev: Column): Column =
    when(sev === "critical", "CRITICAL")
      .when(sev === "high", "HIGH")
      .when(sev === "medium", "MEDIUM")
      .when(sev === "low", "LOW")
      .otherwise("MEDIUM")

  /** calculateRiskScoreFromSeverity (M5): computed from the RAW severity,
    * so unknown/empty → 0.0 even when finding_severity says MEDIUM. */
  def riskScore(sev: Column): Column =
    when(sev === "critical", 10.0)
      .when(sev === "high", 8.9)
      .when(sev === "medium", 6.9)
      .when(sev === "low", 3.9)
      .otherwise(0.0)

  /** mapResultToComplianceStatus (M6): pass → COMPLIANT, everything else →
    * NON_COMPLIANT. */
  def complianceStatus(result: Column): Column =
    when(result === "pass", "COMPLIANT").otherwise("NON_COMPLIANT")

  // --------------------------------------------------------- M3: template
  /** event.description template switched on result status (M3); empty rule
    * name renders as "unknown" (reference processor.go:359-378). */
  def eventDescription(result: Column, scopeName: Column, rule: Column): Column = {
    val r = when(rule.isNull || rule === "", lit("unknown")).otherwise(rule)
    val tail = concat(scopeName, lit(" for rule "), r)
    when(result === "fail", concat(lit("Policy violation on "), tail))
      .when(result === "pass", concat(lit("Policy check passed on "), tail))
      .when(result === "error", concat(lit("Policy check error on "), tail))
      .when(result === "skip", concat(lit("Policy check skipped on "), tail))
      .otherwise(concat(lit("Policy evaluation on "), tail))
  }

  // ------------------------------------------------------- E1: owner refs
  /** Workload extraction from owner references (E1): first ref whose kind is
    * a workload kind wins; Pod/Service skipped; tolerant JSON decode.
    * Pure higher-order array functions — no UDF, stays in codegen. */
  val workloadKinds: Seq[String] =
    Seq("Deployment", "StatefulSet", "DaemonSet", "Job", "CronJob", "ReplicaSet")

  def firstWorkloadRef(ownerRefs: Column): Column = {
    val refSchema = "struct<kind:string,name:string,uid:string>"
    val decoded = transform(ownerRefs, s => from_json(s, org.apache.spark.sql.types.DataType.fromDDL(refSchema).asInstanceOf[org.apache.spark.sql.types.StructType]))
    val wl = filter(decoded, r => r.isNotNull && r.getField("kind").isin(workloadKinds: _*))
    try_element_at(wl, lit(1))
  }

  // ----------------------------------------------- full transform (M1-M11)
  /** The complete field mapping (reference transformToSecurityEvent,
    * processor.go:345-460 + MAPPING.md). Input: the matches() frame with
    * struct column `r`. Event ids are content-derived (sha256) instead of
    * UUIDv4 — replay-stable exactly-once output requires deterministic ids
    * (SURVEY §7.6.2); documented divergence from reference M2. */
  def transformed(m: DataFrame): DataFrame = {
    val sev = col("r.severity")
    val res = col("r.result")
    val pol = col("r.policy")
    val rul = col("r.rule")
    val cat = col("r.category")
    val off = col("r.ts_offset_s")
    val rewritten = when(off > 0,
        col("event_time") + make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(0), off.cast("double")))
      .otherwise(col("event_time"))
    m.select(
      col("clip_id"), col("sr_hz"), col("dur_ms"), col("codec"),
      col("tenant_id"), col("event_id").as("src_event_id"),
      col("rule_id"),
      sha2(concat_ws("|", col("clip_id"), col("rule_id")), 256).as("event_uid"),
      lit("1.309").as("event_version"),
      lit("COMPLIANCE").as("event_category"),
      lit("Compliance finding event").as("event_name"),
      lit("COMPLIANCE_FINDING").as("event_type"),
      eventDescription(res, col("clip_id"), rul).as("event_description"),
      lit("").as("product_name"),
      lit("").as("product_vendor"),
      when(col("codec") === "wav", "AUDIO_CLIP").as("smartscape_type"),
      riskScore(sev).as("risk_score"),
      concat(lit("uid-"), md5(col("clip_id"))).as("object_id"),
      col("codec").as("object_type"),
      col("r.message").as("finding_description"),
      sha2(concat_ws("|", col("clip_id"), col("rule_id"), lit("finding")), 256).as("finding_id"),
      when(sev.isNotNull && sev =!= "", severityUpper(sev)).as("finding_severity"),
      when(off > 0, date_format(rewritten, "yyyy-MM-dd'T'HH:mm:ss'Z'")).as("finding_time_created"),
      // title: printf("%s - %s") even when policy is empty (" - rule")
      when(rul =!= "", concat(pol, lit(" - "), rul)).otherwise(pol).as("finding_title"),
      when(pol =!= "", pol).as("finding_type"),
      lit("").as("finding_url"),
      when(rul =!= "", rul).as("compliance_control"),
      when(pol =!= "", pol).as("compliance_requirements"),
      when(cat =!= "", cat).as("compliance_standards"),
      complianceStatus(res).as("compliance_status"),
      col("r.message").as("body"),
      eventKey(col("clip_id")).as("event_key"),
      rewritten.as("event_time"),
      res.as("match_status"))
  }

  /** matches → filter → transform, one call. */
  def events(spark: SparkSession, clips: DataFrame, allowed: Seq[String] = Nil): DataFrame = {
    Rules.validateStatusFilter(allowed).left.foreach(e => throw new IllegalArgumentException(e))
    transformed(matches(clips, spark).filter(statusFilter(allowed)))
  }

  // --------------------------------------------- R2: identity pass-through
  /** Full pipeline with pass-through union (R2): clips that fail the gate,
    * match no rule, or whose matches were ALL status-filtered out pass
    * through unchanged (reference processor.go:190-209 — the easy-to-miss
    * semantic). Implemented as a broadcast LEFT JOIN + flag instead of a
    * left-anti against the transformed output, so the clip stream is
    * scanned once and never shuffled. */
  def fullPipeline(spark: SparkSession, clips: DataFrame, allowed: Seq[String] = Nil): DataFrame = {
    val ev = events(spark, clips, allowed)
    val passthrough = clips
      .join(ev.select(col("clip_id").as("matched_clip_id")).distinct(),
        col("clip_id") === col("matched_clip_id"), "left_anti")
      .select(
        col("clip_id"), col("sr_hz"), col("dur_ms"), col("codec"),
        col("tenant_id"), col("event_id").as("src_event_id"),
        col("event_time"))
    ev.drop("match_status").unionByName(passthrough, allowMissingColumns = true)
  }

  /** Processor `enabled` flag (reference internal/openreports/config.go:8-25,
    * processor.go:56-63): disabled ⇒ the whole stream passes through as an
    * identity — no gate, no match, no transform. */
  def process(spark: SparkSession, clips: DataFrame, enabled: Boolean,
              allowed: Seq[String] = Nil): DataFrame =
    if (enabled) fullPipeline(spark, clips, allowed) else clips

  // ------------------------------------------------------- A1: counters
  /** Conservation-law counters (A1, reference METRICS.md:42): incoming =
    * passthrough + expanded-parents; outgoing = events + passthrough. */
  def counters(spark: SparkSession, clips: DataFrame, allowed: Seq[String] = Nil): DataFrame = {
    val ev = events(spark, clips, allowed)
    val perClip = ev.groupBy(col("clip_id")).agg(count(lit(1)).as("n"))
    clips.join(perClip, Seq("clip_id"), "left")
      .agg(
        count(lit(1)).as("incoming_logs_total"),
        sum(coalesce(col("n"), lit(0L))).as("expanded_events_total"),
        sum(when(col("n").isNull, 1L).otherwise(0L)).as("passthrough_total"),
        (sum(coalesce(col("n"), lit(0L))) + sum(when(col("n").isNull, 1L).otherwise(0L))).as("outgoing_logs_total"),
        lit(0L).as("dropped_logs_total"))
  }
}
