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
  /** The event column set as (name → expression) pairs, shared verbatim by
    * [[transformed]] (the join-side frame from [[matches]]) and the
    * single-scan [[fullPipeline]] (which wraps the non-carry columns in a
    * pass-through guard). Expects columns `clip_id sr_hz dur_ms codec
    * tenant_id event_id event_time rule_id` plus the decoded payload
    * struct `r`. */
  def eventFields: Seq[(String, Column)] = {
    val sev = col("r.severity")
    val res = col("r.result")
    val pol = col("r.policy")
    val rul = col("r.rule")
    val cat = col("r.category")
    val off = col("r.ts_offset_s")
    val rewritten = when(off > 0,
        col("event_time") + make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(0), off.cast("double")))
      .otherwise(col("event_time"))
    Seq(
      "clip_id" -> col("clip_id"),
      "sr_hz" -> col("sr_hz"),
      "dur_ms" -> col("dur_ms"),
      "codec" -> col("codec"),
      "tenant_id" -> col("tenant_id"),
      "src_event_id" -> col("event_id"),
      "rule_id" -> col("rule_id"),
      "event_uid" -> sha2(concat_ws("|", col("clip_id"), col("rule_id")), 256),
      "event_version" -> lit("1.309"),
      "event_category" -> lit("COMPLIANCE"),
      "event_name" -> lit("Compliance finding event"),
      "event_type" -> lit("COMPLIANCE_FINDING"),
      "event_description" -> eventDescription(res, col("clip_id"), rul),
      "product_name" -> lit(""),
      "product_vendor" -> lit(""),
      "smartscape_type" -> when(col("codec") === "wav", "AUDIO_CLIP"),
      "risk_score" -> riskScore(sev),
      "object_id" -> concat(lit("uid-"), md5(col("clip_id"))),
      "object_type" -> col("codec"),
      "finding_description" -> col("r.message"),
      "finding_id" -> sha2(concat_ws("|", col("clip_id"), col("rule_id"), lit("finding")), 256),
      "finding_severity" -> when(sev.isNotNull && sev =!= "", severityUpper(sev)),
      "finding_time_created" -> when(off > 0, date_format(rewritten, "yyyy-MM-dd'T'HH:mm:ss'Z'")),
      // title: printf("%s - %s") even when policy is empty (" - rule")
      "finding_title" -> when(rul =!= "", concat(pol, lit(" - "), rul)).otherwise(pol),
      "finding_type" -> when(pol =!= "", pol),
      "finding_url" -> lit(""),
      "compliance_control" -> when(rul =!= "", rul),
      "compliance_requirements" -> when(pol =!= "", pol),
      "compliance_standards" -> when(cat =!= "", cat),
      "compliance_status" -> complianceStatus(res),
      "body" -> col("r.message"),
      "event_key" -> eventKey(col("clip_id")),
      "event_time" -> rewritten,
      "match_status" -> res)
  }

  /** Columns the R2 pass-through branch carries through unchanged; every
    * other event column is null on a pass-through row. `event_time` is in
    * the carry set because its event expression (the ts_offset rewrite)
    * already degrades to the raw event_time when the payload struct is
    * null. */
  private val carryCols: Set[String] =
    Set("clip_id", "sr_hz", "dur_ms", "codec", "tenant_id", "src_event_id", "event_time")

  def transformed(m: DataFrame): DataFrame =
    m.select(eventFields.map { case (n, c) => c.as(n) }: _*)

  /** matches → filter → transform, one call. */
  def events(spark: SparkSession, clips: DataFrame, allowed: Seq[String] = Nil): DataFrame = {
    Rules.validateStatusFilter(allowed).left.foreach(e => throw new IllegalArgumentException(e))
    transformed(matches(clips, spark).filter(statusFilter(allowed)))
  }

  // --------------------------------------------- R2: identity pass-through
  /** Per-rule surviving-match predicate over ONE element of
    * [[Rules.arrayLit]]: substring match (X1) + tolerant decode (X3) +
    * status filter (F2), folded into a single expression so "which rules
    * survive for this clip" needs no join. Decode validity and status come
    * from the literal's pre-folded `decode_ok`/`result` fields — the hot
    * row loop does ZERO JSON parsing (payloads are static; parsing them
    * per row per rule was ~half the single-scan plan's cost). */
  private def ruleSurvives(allowed: Seq[String])(rr: Column): Column = {
    val statusOk =
      if (allowed.isEmpty) lit(true)
      else rr.getField("result").isin(allowed: _*)
    contains(col("transcript"), rr.getField("pattern")) &&
      rr.getField("decode_ok") && statusOk
  }

  /** Surviving-rule array per clip (null when the gate fails, empty when no
    * rule survives — either way the clip passes through). A pure expression
    * over the literal rule set: the scale-critical property is that the
    * matched/pass-through decision never leaves the row. */
  def matchedRules(allowed: Seq[String]): Column =
    when(gate, filter(Rules.arrayLit, rr => ruleSurvives(allowed)(rr)))

  /** Full pipeline with pass-through union (R2): clips that fail the gate,
    * match no rule, or whose matches were ALL status-filtered out pass
    * through unchanged (reference processor.go:190-209 — the easy-to-miss
    * semantic).
    *
    * Single-scan, map-only: each clip computes its surviving-rule array as
    * a pure expression over the literal rule set, then one conditional
    * explode emits either the transformed events or a single pass-through
    * marker row — no second scan, no distinct, no anti-join, no broadcast
    * of matched ids (the round-2 plan broadcast ALL matched clip_ids,
    * which cannot broadcast at 10^12 clips). The executed plan is one
    * parquet scan with zero joins and zero exchanges (PlanSpec-pinned). */
  def fullPipeline(spark: SparkSession, clips: DataFrame, allowed: Seq[String] = Nil): DataFrame = {
    Rules.validateStatusFilter(allowed).left.foreach(e => throw new IllegalArgumentException(e))
    val mr = matchedRules(allowed)
    val nullRule = lit(null).cast(Rules.ruleStructDdl)
    val exploded = clips
      .withColumn("mrule", explode(when(size(mr) > 0, mr).otherwise(array(nullRule))))
      .withColumn("rule_id", col("mrule.rule_id"))
      .withColumn("r", from_json(col("mrule.payload_json"), Rules.payloadSchema))
    val isEvent = col("mrule").isNotNull
    exploded.select(eventFields.filterNot(_._1 == "match_status").map { case (n, c) =>
      (if (carryCols(n)) c else when(isEvent, c)).as(n)
    }: _*)
  }

  /** Processor `enabled` flag (reference internal/openreports/config.go:8-25,
    * processor.go:56-63): disabled ⇒ the whole stream passes through as an
    * identity — no gate, no match, no transform. */
  def process(spark: SparkSession, clips: DataFrame, enabled: Boolean,
              allowed: Seq[String] = Nil): DataFrame =
    if (enabled) fullPipeline(spark, clips, allowed) else clips

  // ------------------------------------------------------- A1: counters
  /** Conservation-law counters (A1, reference METRICS.md:42): incoming =
    * passthrough + expanded-parents; outgoing = events + passthrough.
    *
    * Single-scan: the per-clip surviving-event count is
    * `size(matchedRules)` — a pure expression — so the whole query is one
    * scan + a partial/final aggregate; no join-back against the event
    * output (the round-2 shape re-scanned the source and shuffled a
    * per-clip count table). */
  def counters(spark: SparkSession, clips: DataFrame, allowed: Seq[String] = Nil): DataFrame = {
    Rules.validateStatusFilter(allowed).left.foreach(e => throw new IllegalArgumentException(e))
    // coalesce BEFORE size: with ANSI off, legacy size(null) = -1 would
    // slip through a post-size coalesce and silently corrupt the counters
    val n = size(coalesce(matchedRules(allowed),
      array().cast(s"array<${Rules.ruleStructDdl}>")))
    clips.select(n.as("n"))
      .agg(
        count(lit(1)).as("incoming_logs_total"),
        sum(col("n")).as("expanded_events_total"),
        sum(when(col("n") === 0, 1L).otherwise(0L)).as("passthrough_total"),
        (sum(col("n")) + sum(when(col("n") === 0, 1L).otherwise(0L))).as("outgoing_logs_total"),
        lit(0L).as("dropped_logs_total"))
  }
}
