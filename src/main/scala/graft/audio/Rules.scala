package graft.audio

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array, lit, struct}
import org.apache.spark.sql.types._

/** A transcript rule — the graft analog of the reference's `results[]`
  * payload (an array of JSON strings, each decoded into a typed Result;
  * reference: /root/reference/internal/openreports/processor.go:322-340).
  *
  * `pattern` is matched against the clip transcript (substring match);
  * `payloadJson` carries the Result-shaped payload and is decoded with
  * tolerant semantics (malformed JSON ⇒ that match is skipped, the rest of
  * the clip's matches survive — processor.go:229-241).
  *
  * `result` is the payload's pre-decoded result field (None ⇔ the payload
  * is malformed). It MUST mirror payloadJson — [[Rules.mkRule]] is the
  * single constructor that keeps the two in sync — and exists so the
  * pipeline's per-row match predicate can use literal booleans/strings
  * instead of re-parsing the static payload JSON on every row. */
final case class RuleDef(ruleId: String, pattern: String, payloadJson: String,
                         result: Option[String])

object Rules {

  /** Single constructor keeping payloadJson and the pre-decoded result in
    * sync (see [[RuleDef.result]]). */
  private def mkRule(ruleId: String, pattern: String, message: String,
                     policy: String, rule: String, severity: String,
                     category: String, result: String, tsOffsetS: Long): RuleDef =
    RuleDef(ruleId, pattern,
      s"""{"message":"$message","policy":"$policy","rule":"$rule","severity":"$severity","category":"$category","result":"$result","ts_offset_s":$tsOffsetS}""",
      Some(result))

  /** Static rule set. Edge cases mirror the reference test matrix
    * (processor_test.go:387-441): empty severity (⇒ finding_severity unset,
    * risk 0.0), unknown severity (⇒ MEDIUM but risk 0.0), case-sensitive
    * "Critical" (⇒ MEDIUM, 0.0), empty rule name (⇒ description "unknown",
    * title without " - "), empty policy/category (⇒ fields unset), and one
    * malformed payload (tolerant-decode skip). */
  val all: Seq[RuleDef] = Seq(
    mkRule("r-access-denied", "access denied",
      "Access denied detected", "access-policy", "deny-rule", "critical", "RBAC", "fail", 60L),
    mkRule("r-priv-esc", "privilege escalation",
      "Privilege escalation attempt", "escalation-policy", "priv-rule", "high", "PRIVESC", "fail", 120L),
    mkRule("r-login-ok", "login ok",
      "Login check passed", "login-policy", "login-rule", "low", "AUTH", "pass", 0L),
    mkRule("r-skip", "policy skipped",
      "Policy evaluation skipped", "skip-policy", "", "medium", "AUDIT", "skip", 30L),
    mkRule("r-err-empty", "user 1",
      "Evaluation error", "", "err-rule", "", "", "error", 45L),
    mkRule("r-junk-sev", "user 2",
      "Junk severity finding", "junk-policy", "junk-rule", "SuperBad", "JUNK", "fail", 15L),
    mkRule("r-case-sev", "user 3",
      "Case sensitive severity", "case-policy", "case-rule", "Critical", "CASE", "pass", 0L),
    // Malformed on purpose: pins the tolerant-decode skip semantics.
    RuleDef("r-malformed", "user 4", """{"message": malformed-json""", None),
  )

  /** Schema of the decoded payload (analog of the reference Result struct). */
  val payloadSchema: StructType = StructType(Seq(
    StructField("message", StringType),
    StructField("policy", StringType),
    StructField("rule", StringType),
    StructField("severity", StringType),
    StructField("category", StringType),
    StructField("result", StringType),
    StructField("ts_offset_s", LongType),
  ))

  /** DDL of one rule element in [[arrayLit]]. */
  val ruleStructDdl: String =
    "struct<rule_id:string,pattern:string,payload_json:string,decode_ok:boolean,result:string>"

  /** The rule set as a LITERAL Catalyst array of structs. This is what lets
    * the full pipeline evaluate per-clip matching as a pure expression —
    * `filter(Rules.arrayLit, clip-predicate)` — with no join at all, which
    * in turn keeps [[graft.operators.Pipeline.fullPipeline]] single-scan
    * and map-only (the R2 pass-through needs "did ANY rule survive", and
    * deriving that from the transformed output forces a re-scan +
    * anti-join that cannot broadcast at 10^12 clips).
    *
    * `decode_ok` and `result` are FOLDED AT PLAN BUILD: payload validity
    * and status are properties of the static rule set, not of the data,
    * so the hot per-row match predicate does zero JSON parsing — the
    * payload struct is decoded only for matched rows after the explode. */
  def arrayLit: Column = array(all.map(r => struct(
    lit(r.ruleId).as("rule_id"),
    lit(r.pattern).as("pattern"),
    lit(r.payloadJson).as("payload_json"),
    lit(r.result.isDefined).as("decode_ok"),
    r.result.map(lit(_)).getOrElse(lit(null).cast("string")).as("result"))): _*)

  /** Small dimension → always broadcast-joined against the clip stream. */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    all.map(r => (r.ruleId, r.pattern, r.payloadJson))
      .toDF("rule_id", "pattern", "payload_json")
  }

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The same rule set as a DuckDB-compatible VALUES CTE body, generated
    * from the single source of truth above so the oracle can never drift. */
  def valuesSql: String =
    all.map(r => s"(${sq(r.ruleId)}, ${sq(r.pattern)}, ${sq(r.payloadJson)})")
      .mkString("SELECT * FROM (VALUES\n  ", ",\n  ", "\n) AS t(rule_id, pattern, payload_json)")

  /** Valid status-filter values (reference config.go: pass/fail/error/skip,
    * case-sensitive; internal/openreports/config.go:18-34). */
  val validStatuses: Set[String] = Set("pass", "fail", "error", "skip")

  /** C1 config validation: statuses outside the valid set are rejected,
    * case-sensitively. Empty filter ⇒ keep all. */
  def validateStatusFilter(filter: Seq[String]): Either[String, Seq[String]] = {
    val bad = filter.filterNot(validStatuses.contains)
    if (bad.nonEmpty) Left(s"invalid status_filter values: ${bad.mkString(",")} (valid: ${validStatuses.mkString(",")})")
    else Right(filter)
  }
}
