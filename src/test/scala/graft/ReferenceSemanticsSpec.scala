package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pipeline
import graft.audio.Rules

/** Ports of the reference unit tests (FIXTURES.md §3, reference
  * internal/openreports/processor_test.go) onto the graft schema. Each test
  * pins one golden behavior of the original Go processor. */
class ReferenceSemanticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def pipeline(rows: Seq[(String, String, String)], filter: Seq[String] = Nil) =
    Pipeline.fullPipeline(spark, TestSpark.clipsDf(rows), filter)

  // processor_test.go:15-30 — non-matching gate → pass-through
  test("gate rejection passes record through unchanged") {
    val out = pipeline(Seq(
      ("clip-t0-s0-0000000001", "opus-stub", "access denied"), // bad codec
      ("clip-t0-s0-0000000002", "wav", null),                  // no transcript
    )).collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getAs[String]("event_uid") == null))
    assert(out.map(_.getAs[String]("clip_id")).toSet ==
      Set("clip-t0-s0-0000000001", "clip-t0-s0-0000000002"))
  }

  // processor_test.go:32-68 — no results → pass-through
  test("zero rule matches pass through") {
    val out = pipeline(Seq(("clip-t0-s0-0000000001", "wav", "nothing matches here"))).collect()
    assert(out.length == 1 && out(0).getAs[String]("event_uid") == null)
  }

  // processor_test.go:116-185 — 1→3 expansion with per-status compliance
  test("1-to-3 expansion: pass/fail statuses map to compliance") {
    val out = pipeline(Seq(("clip-t0-s0-0000000001", "wav",
      "clip access denied privilege escalation login ok"))).collect()
    assert(out.length == 3)
    val byRule = out.map(r => r.getAs[String]("rule_id") -> r).toMap
    assert(byRule("r-access-denied").getAs[String]("compliance_status") == "NON_COMPLIANT")
    assert(byRule("r-priv-esc").getAs[String]("compliance_status") == "NON_COMPLIANT")
    assert(byRule("r-login-ok").getAs[String]("compliance_status") == "COMPLIANT")
  }

  // processor_test.go:187-321 — status filtering incl. empty-filter-keeps-all
  test("status filter keeps only allowed statuses; empty keeps all") {
    val rows = Seq(("clip-t0-s0-0000000001", "wav",
      "access denied privilege escalation login ok policy skipped"))
    assert(Pipeline.events(spark, TestSpark.clipsDf(rows), Seq("fail")).count() == 2)
    assert(Pipeline.events(spark, TestSpark.clipsDf(rows), Seq("fail", "skip")).count() == 3)
    assert(Pipeline.events(spark, TestSpark.clipsDf(rows), Nil).count() == 4)
  }

  // config_test.go:96-110 — C1 validation, case-sensitive
  test("invalid status_filter values are rejected, case-sensitively") {
    val rows = Seq(("clip-t0-s0-0000000001", "wav", "login ok"))
    intercept[IllegalArgumentException] {
      Pipeline.events(spark, TestSpark.clipsDf(rows), Seq("Pass"))
    }
    intercept[IllegalArgumentException] {
      Pipeline.events(spark, TestSpark.clipsDf(rows), Seq("bogus"))
    }
  }

  // processor.go:190-209 — ALL results filtered out ⇒ parent passes through
  test("all matches filtered out: original clip passes through unchanged") {
    val out = pipeline(Seq(("clip-t0-s0-0000000001", "wav", "login ok")), Seq("fail")).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("event_uid") == null)
    assert(out(0).getAs[String]("clip_id") == "clip-t0-s0-0000000001")
  }

  // processor_test.go:323-385 — full field-mapping golden assertions
  test("golden field mapping for a medium-severity skip match") {
    val out = pipeline(Seq(("clip-t9-s1-0000000042", "wav", "policy skipped"))).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("event_version") == "1.309")
    assert(r.getAs[String]("event_category") == "COMPLIANCE")
    assert(r.getAs[String]("event_name") == "Compliance finding event")
    assert(r.getAs[String]("event_type") == "COMPLIANCE_FINDING")
    // empty rule name renders as "unknown" (processor.go:359-378)
    assert(r.getAs[String]("event_description") ==
      "Policy check skipped on clip-t9-s1-0000000042 for rule unknown")
    assert(r.getAs[String]("finding_severity") == "MEDIUM")
    assert(r.getAs[Double]("risk_score") == 6.9)
    // empty rule ⇒ title is just the policy (no " - ")
    assert(r.getAs[String]("finding_title") == "skip-policy")
    assert(r.getAs[String]("compliance_control") == null)   // empty rule unset
    assert(r.getAs[String]("compliance_requirements") == "skip-policy")
    assert(r.getAs[String]("compliance_standards") == "AUDIT")
    assert(r.getAs[String]("compliance_status") == "NON_COMPLIANT")
    assert(r.getAs[String]("smartscape_type") == "AUDIO_CLIP") // wav analog of Pod
    assert(r.getAs[String]("product_name") == "")
    assert(r.getAs[String]("finding_url") == "")
    assert(r.getAs[String]("body") == "Policy evaluation skipped")
    assert(r.getAs[String]("event_key") == "clip-t9")
  }

  // processor_test.go:387-441 — severity lookup tables, incl. the
  // MEDIUM-vs-0.0 inconsistency and case sensitivity
  test("severity tables: unknown → MEDIUM but risk 0.0; empty → unset, 0.0; case-sensitive") {
    val out = pipeline(Seq(
      ("clip-t0-s0-0000000001", "wav", "user 1"),   // severity ""      → unset, 0.0
      ("clip-t0-s0-0000000002", "wav", "user 2"),   // severity SuperBad → MEDIUM, 0.0
      ("clip-t0-s0-0000000003", "wav", "user 3"),   // severity Critical → MEDIUM, 0.0
    )).collect().map(r => r.getAs[String]("rule_id") -> r).toMap
    val err = out("r-err-empty")
    assert(err.getAs[String]("finding_severity") == null)
    assert(err.getAs[Double]("risk_score") == 0.0)
    val junk = out("r-junk-sev")
    assert(junk.getAs[String]("finding_severity") == "MEDIUM")
    assert(junk.getAs[Double]("risk_score") == 0.0)
    val cased = out("r-case-sev")
    assert(cased.getAs[String]("finding_severity") == "MEDIUM")
    assert(cased.getAs[Double]("risk_score") == 0.0)
  }

  test("severity happy path: critical/high/low map with matching scores") {
    val out = pipeline(Seq(("clip-t0-s0-0000000001", "wav",
      "access denied privilege escalation login ok"))).collect()
      .map(r => r.getAs[String]("rule_id") -> r).toMap
    assert(out("r-access-denied").getAs[String]("finding_severity") == "CRITICAL")
    assert(out("r-access-denied").getAs[Double]("risk_score") == 10.0)
    assert(out("r-priv-esc").getAs[String]("finding_severity") == "HIGH")
    assert(out("r-priv-esc").getAs[Double]("risk_score") == 8.9)
    assert(out("r-login-ok").getAs[String]("finding_severity") == "LOW")
    assert(out("r-login-ok").getAs[Double]("risk_score") == 3.9)
  }

  // processor_test.go:551-581 — invalid JSON among valid: only valid processed
  test("malformed rule payload skipped; valid matches on same clip survive") {
    val out = pipeline(Seq(("clip-t0-s0-0000000001", "wav", "user 4 access denied"))).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("rule_id") == "r-access-denied")
  }

  test("clip whose ONLY match is malformed passes through") {
    val out = pipeline(Seq(("clip-t0-s0-0000000001", "wav", "user 4 only"))).collect()
    assert(out.length == 1 && out(0).getAs[String]("event_uid") == null)
  }

  // processor_test.go:624-668 — timestamp rewrite from payload
  test("event-time rewrite: positive payload offset rewrites; zero keeps original") {
    val out = pipeline(Seq(("clip-t0-s0-0000000001", "wav", "access denied login ok")))
      .collect().map(r => r.getAs[String]("rule_id") -> r).toMap
    val rewritten = out("r-access-denied")
    assert(rewritten.getAs[java.sql.Timestamp]("event_time") ==
      java.sql.Timestamp.valueOf("2025-09-19 07:32:02")) // +60s
    assert(rewritten.getAs[String]("finding_time_created") == "2025-09-19T07:32:02Z")
    val kept = out("r-login-ok")
    assert(kept.getAs[java.sql.Timestamp]("event_time") == TestSpark.T0)
    assert(kept.getAs[String]("finding_time_created") == null)
  }

  // processor_test.go:532-549 — pod-name style key derivation
  test("event key derivation: drop last two segments; <3 segments → none") {
    val s = spark
    import s.implicits._
    val df = Seq("cert-manager-cainjector-89fd4b8f9-t9xlf", "simple-pod", "a-b-c")
      .toDF("clip_id")
      .select(col("clip_id"), Pipeline.eventKey(col("clip_id")).as("k"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("cert-manager-cainjector-89fd4b8f9-t9xlf") == "cert-manager-cainjector")
    assert(m("simple-pod") == null)
    assert(m("a-b-c") == "a")
  }

  // processor_test.go:464-506 — owner-reference workload extraction
  test("owner refs: first workload kind wins, Pod/Service and bad JSON skipped") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", Seq("""{"kind":"Pod","name":"p","uid":"u0"}""",
                """{"kind":"ReplicaSet","name":"rs-1","uid":"u1"}""",
                """{"kind":"Deployment","name":"dep-1","uid":"u2"}""")),
      ("b", Seq("""{"kind":"Service","name":"svc","uid":"u3"}""", "not-json")),
      ("c", Seq.empty[String]),
      ("d", Seq("""{"kind":"StatefulSet","name":"sts-1","uid":"u4"}""")),
    ).toDF("id", "owner_refs")
    val wl = Pipeline.firstWorkloadRef(col("owner_refs"))
    val m = df.select(col("id"), wl.getField("kind").as("k"), wl.getField("name").as("n"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(m("a") == ("ReplicaSet", "rs-1")) // first workload, Pod skipped
    assert(m("b") == (null, null))
    assert(m("c") == (null, null))
    assert(m("d") == ("StatefulSet", "sts-1"))
  }

  // METRICS.md:42 — conservation law
  test("conservation: incoming = expanded parents + passthrough; outgoing = events + passthrough") {
    val rows = Seq(
      ("clip-t0-s0-0000000001", "wav", "access denied login ok"), // 2 events
      ("clip-t0-s0-0000000002", "wav", "no matches"),             // passthrough
      ("clip-t0-s0-0000000003", "opus-stub", "access denied"),    // gate passthrough
    )
    val c = Pipeline.counters(spark, TestSpark.clipsDf(rows)).collect()(0)
    assert(c.getAs[Long]("incoming_logs_total") == 3)
    assert(c.getAs[Long]("expanded_events_total") == 2)
    assert(c.getAs[Long]("passthrough_total") == 2)
    assert(c.getAs[Long]("outgoing_logs_total") == 4)
  }
}
