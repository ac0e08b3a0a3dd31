package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.audio.{ClipTable, Oracles, Rules}
import graft.operators.{Cep, Dedup, IntervalJoin, Pipeline, Similarity, TextOps, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query operates over the clip table derived deterministically from
  * the driver's `events` parquet (ClipTable.CLIPS_SQL, executed verbatim by
  * both Spark and the DuckDB oracle) or over the driver's documents /
  * embeddings tables.
  */
object SparkEntry {

  /** Spread a narrow scan across the session's parallelism (guide §2.5
    * "input skew: one huge unsplittable file ... repartition immediately
    * after the read"): the driver's SF inputs are single-row-group parquet
    * files, so every scan plans exactly ONE task and all downstream
    * per-row compute — synth/decode/Goertzel byte walks, per-token md5s —
    * serializes on one core regardless of session width (measured: the
    * whole mm_* audio tier ran single-task at local[32]).
    *
    * The exchange moves only the small metadata rows (audio bytes are
    * synthesized AFTER it — the guide §8 "shuffle keys and metadata
    * instead of payloads" shape), keyed on the unique row id
    * (deterministic, skew-free; never rand()). Scale-adaptive, not a
    * local[32] constant: the target is defaultParallelism (the local[N]
    * width locally, total executor cores on a cluster) and the probe makes
    * it a NO-OP whenever the input already carries at least that many
    * DATA-BEARING units — a 100 TB input with real splits adds no
    * exchange. The explicit partition count keeps AQE from coalescing the
    * small-byte exchange back to one partition.
    *
    * The probe counts files, and only when files are few, ROW GROUPS from
    * their footers — never planned byte-range splits: Spark plans splits
    * by bytes and assigns a row group to the split containing its
    * midpoint, so a large single-row-group file can "plan" `want` splits
    * of which all but one are EMPTY (getNumPartitions would claim
    * parallelism that does not exist and silently disable the fix — the
    * r6 review catch). Footer reads are bounded: none at all when the
    * file count already reaches the target, and early-exit once enough
    * row groups are seen. */
  private def spread(df: DataFrame, key: String): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    val files = df.inputFiles
    val enough =
      if (files.length >= want) true
      else {
        // few files: the splittable unit is the row group — count them
        // from footers (≤ files.length reads, early exit at `want`)
        val conf = df.sparkSession.sessionState.newHadoopConf()
        var units = 0
        val it = files.iterator
        while (units < want && it.hasNext) {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(it.next()), conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try units += reader.getRowGroups.size()
          finally reader.close()
        }
        units >= want
      }
    if (enough) df else df.repartition(want, col(key))
  }

  private def clips(s: SparkSession, dir: String): DataFrame =
    spread(ClipTable.clips(s, dir), "clip_id")

  private def docs(s: SparkSession, dir: String): DataFrame =
    spread(TextOps.docs(s, dir), "doc_id")

  private def embeddings(s: SparkSession, dir: String): DataFrame =
    spread(Similarity.embeddings(s, dir), "vec_id")

  // Queries with NO per-row compute above their first exchange — pure
  // gate filters (f1_gate, p_disabled_identity), a trivial one-hash map
  // (td_train_split), or operators whose first act is their OWN shuffle
  // on a different key (dedup_exact's content-hash groupBy,
  // td_pack_sequences' shard exchange) — take the raw scan: spread would
  // buy them nothing at any scale (at 100 TB the probe no-ops anyway)
  // and measurably costs the small-input exchange locally.
  private def clipsRaw(s: SparkSession, dir: String): DataFrame =
    ClipTable.clips(s, dir)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.fullPipeline(spark, clips(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 gate filter (reference processor.go:280-296)
    "f1_gate" -> ((s, dir) => clipsRaw(s, dir).filter(Pipeline.gate)),
    // X1 explode + X3 tolerant JSON decode + F2 + M1-M11 + E2 + R2 union
    "full_pipeline" -> ((s, dir) => Pipeline.fullPipeline(s, clips(s, dir))),
    // F2 status filter (fail+error) over the transformed events
    "f2_status_filter" -> ((s, dir) =>
      Pipeline.events(s, clips(s, dir), Seq("fail", "error"))),
    // R2: all-matches-filtered clips pass through (filter = pass only)
    "r2_passthrough" -> ((s, dir) =>
      Pipeline.fullPipeline(s, clips(s, dir), Seq("pass"))),
    // X3 tolerant-decode accounting (malformed payloads skipped, not fatal)
    "x3_tolerant_decode" -> ((s, dir) => {
      val m = clips(s, dir).filter(Pipeline.gate)
        .join(broadcast(Rules.df(s)), expr("contains(transcript, pattern)"))
      m.groupBy("rule_id").agg(
        count(lit(1)).as("matched_total"),
        sum(when(Pipeline.decodeOk, 1L).otherwise(0L)).as("decoded_total"),
        sum(when(Pipeline.decodeOk, 0L).otherwise(1L)).as("skipped_total"))
    }),
    // A1 conservation-law counters
    "a1_counters" -> ((s, dir) => Pipeline.counters(s, clips(s, dir))),
    // E2 clip_id-derived event key
    "e2_event_key" -> ((s, dir) =>
      clips(s, dir).select(col("clip_id"),
        Pipeline.eventKey(col("clip_id")).as("event_key")).distinct()),
    // Custom Catalyst expressions: pcm_synth + pcm_decode round-trip; the
    // decoded sample count is oracle-checkable arithmetically from
    // (sr_hz, dur_ms, codec). SNR invariant is pinned in PcmSpec.
    "pcm_decode_meta" -> ((s, dir) => {
      graft.functions.AudioFunctions.register(s)
      import graft.functions.AudioFunctions._
      clips(s, dir)
        .withColumn("bytes", pcm_synth(clipFreq(col("event_id")), col("sr_hz"), col("dur_ms"), col("codec")))
        .withColumn("pcm", pcm_decode(col("bytes"), col("codec")))
        .select(col("clip_id"), col("codec"),
          octet_length(col("bytes")).cast("bigint").as("bytes_len"),
          size(col("pcm")).cast("bigint").as("n_samples"))
    }),
    // E3 prefix-projected attribute copy (reference copyK8sFields,
    // processor.go:625-671): clip metadata as a MapType attribute bag;
    // keep only the 'clip.'-prefixed keys (map_filter), overlay derived
    // attributes (map_concat), emit as exploded rows.
    "e3_attr_prefix_copy" -> ((s, dir) => {
      val attrs = map(
        lit("clip.codec"), col("codec"),
        lit("clip.sr_hz"), col("sr_hz").cast("string"),
        lit("clip.tenant"), col("tenant_id").cast("string"),
        lit("meta.origin"), lit("synthetic"),
        lit("meta.junk"), lit("x"))
      val kept = map_filter(attrs, (k, _) => k.startsWith("clip."))
      val derived = map(lit("clip.key"), coalesce(Pipeline.eventKey(col("clip_id")), lit("")))
      clips(s, dir)
        .select(col("clip_id"), explode(map_concat(kept, derived)).as(Seq("attr_key", "attr_value")))
    }),
    // X2 polymorphic payload coercion: JSON-array string / plain string /
    // ill-typed (skipped) — the reference's 3-way runtime branch
    "x2_poly_coerce" -> ((s, dir) => graft.operators.Coerce.polymorphic(clips(s, dir))),
    // C1/P: processor enabled=false ⇒ whole-stream identity pass-through
    "p_disabled_identity" -> ((s, dir) =>
      Pipeline.process(s, clipsRaw(s, dir), enabled = false)),
    // E3 fidelity: 6-type attribute-value copy (reference copyValue,
    // processor.go:674-691 — Str|Int|Double|Bool|Slice|Map preserved).
    // The attr bag is an array of typed structs; the copy is a prefix
    // filter that carries each value in its native type (slice/map emitted
    // as canonical JSON for the oracle compare).
    "e3_typed_attrs" -> ((s, dir) => {
      val nulS = lit(null).cast("string"); val nulL = lit(null).cast("long")
      val nulD = lit(null).cast("double"); val nulB = lit(null).cast("boolean")
      def tattr(key: String, vtype: String, vStr: org.apache.spark.sql.Column,
                vLong: org.apache.spark.sql.Column, vDbl: org.apache.spark.sql.Column,
                vBool: org.apache.spark.sql.Column, vArr: org.apache.spark.sql.Column,
                vMap: org.apache.spark.sql.Column) =
        struct(lit(key).as("attr_key"), lit(vtype).as("vtype"), vStr.as("v_str"),
          vLong.as("v_long"), vDbl.as("v_dbl"), vBool.as("v_bool"),
          vArr.as("v_arr_json"), vMap.as("v_map_json"))
      val attrs = array(
        tattr("clip.codec", "str", col("codec"), nulL, nulD, nulB, nulS, nulS),
        tattr("clip.sr_hz", "int", nulS, col("sr_hz").cast("long"), nulD, nulB, nulS, nulS),
        tattr("clip.dur_s", "double", nulS, nulL, col("dur_ms") / 1000.0, nulB, nulS, nulS),
        tattr("clip.is_wav", "bool", nulS, nulL, nulD, col("codec") === "wav", nulS, nulS),
        tattr("clip.tags", "slice", nulS, nulL, nulD, nulB,
          to_json(array(lit("audio"), col("codec"))), nulS),
        tattr("clip.props", "map", nulS, nulL, nulD, nulB, nulS,
          to_json(map(lit("tenant"), col("tenant_id").cast("string")))),
        tattr("meta.skip", "str", lit("x"), nulL, nulD, nulB, nulS, nulS))
      val kept = filter(attrs, a => a.getField("attr_key").startsWith("clip."))
      clips(s, dir).select(col("clip_id"), explode(kept).as("a")).select(col("clip_id"), col("a.*"))
    }),
    // M10 nanosecond fidelity (SURVEY §7.6.1): the event-time rewrite
    // carried as an epoch-nanos long column — the RFC3339Nano parity path
    // (offsets are integer seconds, so ns arithmetic is exact bigint math).
    "m10_time_ns" -> ((s, dir) => {
      val m = Pipeline.matches(clips(s, dir), s)
      m.select(col("clip_id"), col("rule_id"),
        (unix_micros(col("event_time").cast("timestamp_ltz")) * 1000L +
          when(col("r.ts_offset_s") > 0, col("r.ts_offset_s") * 1000000000L)
            .otherwise(0L)).as("event_time_ns"))
    }),
    // Multimodal "resize": linear-interpolation resample to a 16 kHz
    // target (the audio analog of image resize). Deterministic-integer
    // contract: output length is exact arithmetic; signal content pinned
    // by the same sine bands as mm_audio_features (the resampled sine
    // keeps amplitude 0.5 → rms ~354, peak ~500) plus an SNR test.
    "mm_resample_meta" -> ((s, dir) => {
      graft.functions.AudioFunctions.register(s)
      graft.functions.VecFunctions.register(s)
      import graft.functions.AudioFunctions._
      clips(s, dir).filter(Pipeline.gate)
        .withColumn("bytes", pcm_synth(clipFreq(col("event_id")), col("sr_hz"), col("dur_ms"), col("codec")))
        .withColumn("pcm", pcm_decode(col("bytes"), col("codec")))
        .withColumn("pcm16k", pcm_resample(col("pcm"), col("sr_hz"), lit(16000)))
        // codegen'd Σx² (norm2_f), NOT the rmsX1000 interpreted-lambda
        // reference: identical left-fold doubles (PcmSpec-pinned), ~100×
        // cheaper per array — the honest-timing fix showed the lambda
        // dominating this query's cost
        .withColumn("rms_x1000", rmsX1000FromEnergy(
          graft.functions.VecFunctions.norm2_f(col("pcm16k")), size(col("pcm16k"))))
        .select(col("clip_id"), col("sr_hz"),
          size(col("pcm")).cast("bigint").as("n_src"),
          size(col("pcm16k")).cast("bigint").as("n_16k"),
          // linear interp attenuates between-sample points by cos(w/2)
          // (worst case f=1045 @ sr=8000 upsampled: rms ≈ 354·0.959 ≈ 340)
          when(col("rms_x1000").between(335L, 360L), 1L).otherwise(0L).as("rms_ok"))
    }),
    // E1 owner-reference workload extraction (higher-order array functions)
    "e1_owner_refs" -> ((s, dir) => {
      val withRefs = ClipTable.withOwnerRefs(clips(s, dir))
      val wl = Pipeline.firstWorkloadRef(col("owner_refs"))
      withRefs.select(col("clip_id"), col("tenant_id"),
        wl.getField("kind").as("workload_kind"),
        wl.getField("name").as("workload_name"))
    }),
    // North-rule window aggregates keyed by the clip_id-derived event key
    "w_tumbling" -> ((s, dir) =>
      Windows.tumbling(Pipeline.events(s, clips(s, dir)))),
    "w_sliding" -> ((s, dir) =>
      Windows.sliding(Pipeline.events(s, clips(s, dir)))),
    "w_session" -> ((s, dir) =>
      Windows.session(Pipeline.events(s, clips(s, dir)))),
    // Salted two-phase window aggregate: identical results to w_tumbling
    // (same oracle) with the wide exchange spread over 16 sub-keys — the
    // skew answer for hot event keys (70% of rows share one sr_hz).
    "w_tumbling_salted" -> ((s, dir) =>
      graft.operators.Salting.tumblingSalted(Pipeline.events(s, clips(s, dir)))),
    // The 10^12-scale variant: mergeable HLL sketches in the salted partial
    // instead of clip_id sets. Exact n_clips + bounded-error flag for the
    // estimate keep it hash-checkable (constant-1 oracle column).
    "w_tumbling_salted_hll" -> ((s, dir) =>
      graft.operators.Salting.tumblingSaltedHllChecked(Pipeline.events(s, clips(s, dir)))),
    // A-then-B-within-T sequence detection (batch form of the CEP machine)
    "cep_sequence" -> ((s, dir) =>
      Cep.detectBatch(Pipeline.events(s, clips(s, dir)))),
    // Stream-stream interval join, batch form (events ⋈ rule activations)
    "j_interval" -> ((s, dir) =>
      IntervalJoin.join(Pipeline.events(s, clips(s, dir)),
        IntervalJoin.activations(s, dir))),
    // Sketch aggregate: HLL approx-distinct per event key next to the
    // exact count. The sketch value itself is engine-specific, so the
    // oracle-checked contract is (exact count, bounded-error flag): the
    // approx must land within max(1, 10%) of exact — hash-checked against a
    // constant-1 oracle column, so sketch drift fails the gate. At 10^12
    // scale this sketch (or the salted collect_set swap, see Salting)
    // replaces exact distinct.
    "agg_approx_distinct" -> ((s, dir) =>
      // pre-distinct the (key, clip_id) pairs, THEN aggregate: mixing
      // countDistinct with a non-distinct aggregate plans the Expand
      // rewrite, whose first partial groups by (key, clip_id, gid) and
      // carries the rsd-0.01 HLL buffer (~16 KB) PER DISTINCT PAIR
      // through the exchange — ~3 GB of sketch buffers at sf0.1 for 8
      // output rows (guide §2.3 "aggregate before you shuffle", measured
      // 9.4 s → the distinct-first form shuffles bare pairs once).
      // Value-identical: count(clip_id) over distinct pairs IS
      // countDistinct(clip_id), and HLL register updates are idempotent
      // so the estimate over the deduped pairs equals the original
      // (oracle hash unchanged).
      Pipeline.events(s, clips(s, dir))
        .select(col("event_key"), col("clip_id")).distinct()
        .groupBy(col("event_key"))
        .agg(count(col("clip_id")).as("exact_clips"),
          // rsd 0.01 + a 10% acceptance bound = ~10 sigma of headroom:
          // at sf0.1 a 0.02-rsd sketch drifted past a 5% bound on a
          // ~10k-cardinality key — bound-vs-precision must not sit at 2-3
          // sigma or the gate flakes with scale
          approx_count_distinct(col("clip_id"), 0.01).as("approx"))
        .select(col("event_key"), col("exact_clips"),
          when(abs(col("approx") - col("exact_clips")) <=
            greatest(lit(1L), (col("exact_clips") * 10L) / 100L), 1L)
            .otherwise(0L).as("approx_ok_10pct"))),
    // Sorts / limits / top-k: global top-20 events by risk with a
    // deterministic tiebreak (TakeOrderedAndProject physical op — no full
    // sort, per-partition heaps + driver merge).
    "q_topk_risk" -> ((s, dir) =>
      Pipeline.events(s, clips(s, dir))
        .select(col("event_uid"), col("clip_id"), col("rule_id"), col("risk_score"))
        .orderBy(col("risk_score").desc, col("event_uid").asc)
        .limit(20)),
    // ---- training-data pipeline ops over documents/embeddings ----
    "txt_quality" -> ((s, dir) => TextOps.quality(docs(s, dir))),
    "txt_langid" -> ((s, dir) => TextOps.langId(docs(s, dir))),
    "txt_tokens" -> ((s, dir) => TextOps.tokenCounts(docs(s, dir))),
    "txt_fingerprint" -> ((s, dir) => TextOps.fingerprint(docs(s, dir))),
    // Deterministic hash split + per-shard block sequence packing — the
    // reproducibility-critical training-data ops (never rand())
    "td_train_split" -> ((s, dir) => TextOps.trainSplit(TextOps.docs(s, dir))),
    "td_pack_sequences" -> ((s, dir) => TextOps.packSequences(TextOps.docs(s, dir))),
    "dedup_exact" -> ((s, dir) => Dedup.exact(TextOps.docs(s, dir))),
    "dedup_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccard(docs(s, dir))),
    "dedup_minhash_lsh" -> ((s, dir) => Dedup.minhashLsh(docs(s, dir))),
    "dedup_simhash" -> ((s, dir) => Dedup.simhash(docs(s, dir))),
    "dedup_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(docs(s, dir))),
    "dedup_embed_cosine" -> ((s, dir) => Similarity.cosineNearDup(embeddings(s, dir))),
    "sim_bruteforce_topk" -> ((s, dir) => Similarity.bruteForceTopK(embeddings(s, dir))),
    "sim_ivf_bucket" -> ((s, dir) => Similarity.ivfTopNeighbor(embeddings(s, dir))),
    "sim_ivf_multiprobe" -> ((s, dir) => Similarity.ivfMultiprobeTopK(embeddings(s, dir))),
    // Multimodal plumbing: opaque binary + typed metadata → decode →
    // feature extraction (RMS/peak/frame sampling) via the registered
    // Catalyst decode expression. The audio bytes never exist in DuckDB,
    // so the oracle contract is the synth formula's deterministic
    // integers: n_samples/n_frames arithmetic from (sr_hz, dur_ms), plus
    // signal-content bands derived from the amplitude-0.5 sine (FIXTURES
    // §1): RMS → 0.5/√2 within the partial-cycle bound 1/(2N·sin w)
    // (N ≥ 3200 ⇒ rms_x1000 ∈ [350,358]) and peak → ~0.5 (the phase grid
    // covers the full f/gcd residue cycle ⇒ peak_x1000 ∈ [495,501]). A
    // decode defect (byte order, scale, container offset) lands far
    // outside either band. Exact float values are pinned in PcmSpec (SNR).
    "mm_audio_features" -> ((s, dir) => {
      graft.functions.AudioFunctions.register(s)
      graft.functions.VecFunctions.register(s)
      import graft.functions.AudioFunctions._
      clips(s, dir).filter(Pipeline.gate)
        .withColumn("bytes", pcm_synth(clipFreq(col("event_id")), col("sr_hz"), col("dur_ms"), col("codec")))
        .withColumn("pcm", pcm_decode(col("bytes"), col("codec")))
        // codegen'd kernels over the DECODED array (this query's point is
        // exercising pcm_decode end-to-end): norm2_f/peak_f compute the
        // identical left-fold / order-insensitive doubles as the
        // interpreted rmsX1000 / array_max(transform(abs)) lambdas they
        // replace — which the honest-timing fix measured at ~100× the
        // cost (200s of suite time in THIS query alone)
        .withColumn("rms_x1000", rmsX1000FromEnergy(
          graft.functions.VecFunctions.norm2_f(col("pcm")), size(col("pcm"))))
        .withColumn("peak_x1000",
          round(lit(1000) * graft.functions.VecFunctions.peak_f(col("pcm"))).cast("bigint"))
        .select(col("clip_id"), col("sr_hz"), col("dur_ms"),
          size(col("pcm")).cast("bigint").as("n_samples"),
          // frame sampling: one 20ms frame every 100ms → frame count
          expr("CAST(size(pcm) div (sr_hz div 10) AS BIGINT)").as("n_frames_100ms"),
          inBand(col("rms_x1000"), RmsX1000Band).as("rms_ok"),
          inBand(col("peak_x1000"), PeakX1000Band).as("peak_ok"))
    }),
    // fused one-pass clip-quality stats (pcm_features: n/energy/peak/zcr/dc)
    // — the training-data quality filter (silence, clipping, noisiness, DC
    // offset) earning its flags against closed forms of the synth'd sine:
    // zcr ≈ 2·f·n/sr, rms ≈ 0.3536 (A=0.5), peak ≈ 0.5, dc ≈ 0
    "mm_clip_quality" -> ((s, dir) => {
      graft.functions.AudioFunctions.register(s)
      import graft.functions.AudioFunctions._
      clips(s, dir).filter(Pipeline.gate)
        .withColumn("bytes", pcm_synth(clipFreq(col("event_id")), col("sr_hz"), col("dur_ms"), col("codec")))
        .withColumn("ft", pcm_features(col("bytes"), col("codec")))
        .select(col("clip_id"), col("sr_hz"), col("dur_ms"),
          expr("CAST(element_at(ft, 1) AS BIGINT)").as("n_samples"),
          when(abs(element_at(col("ft"), 4) -
              lit(2.0) * clipFreq(col("event_id")) * element_at(col("ft"), 1) / col("sr_hz")) <= 2.0,
            1L).otherwise(0L).as("zcr_ok"),
          inBand(rmsX1000FromEnergy(element_at(col("ft"), 2), element_at(col("ft"), 1)),
            RmsX1000Band).as("rms_ok"),
          inBand(round(lit(1000) * element_at(col("ft"), 3)).cast("bigint"),
            PeakX1000Band).as("peak_ok"),
          when(abs(element_at(col("ft"), 5)) <= 0.1, 1L).otherwise(0L).as("dc_ok"))
    }),
    // VAD-lite segmentation (pcm_segments: 20ms frames, rms threshold 0.1)
    // — silence-trim/split-at-pause. The sine fixture is active end to
    // end, so every clip is exactly ONE segment from 0; the final frame
    // may be a sub-20ms remainder landing near a zero crossing (below
    // threshold), so the end is asserted within one frame of the clip's
    // integer-ms length ((n·1000) div sr) rather than exactly
    "mm_segments" -> ((s, dir) => {
      graft.functions.AudioFunctions.register(s)
      import graft.functions.AudioFunctions._
      clips(s, dir).filter(Pipeline.gate)
        .withColumn("bytes", pcm_synth(clipFreq(col("event_id")), col("sr_hz"), col("dur_ms"), col("codec")))
        .withColumn("segs", pcm_segments(col("bytes"), col("codec"), col("sr_hz"), lit(20), lit(100)))
        .select(col("clip_id"), col("sr_hz"), col("dur_ms"),
          expr("size(segs) div 2").as("n_segments"),
          element_at(col("segs"), 1).as("seg_start_ms"),
          when(element_at(col("segs"), 2).between(
              expr("CAST(sr_hz AS BIGINT) * dur_ms div 1000 * 1000 div sr_hz - 20"),
              expr("CAST(sr_hz AS BIGINT) * dur_ms div 1000 * 1000 div sr_hz")),
            1L).otherwise(0L).as("seg_end_ok"))
    }),
    // Dominant-frequency detection (pcm_dominant_freq: one-pass Goertzel
    // scan over the 16 fixture candidates 220 + k·55 Hz) — the detected
    // tone must equal the synth frequency EXACTLY, making this the one
    // audio query whose oracle is a closed form over event_id rather
    // than an acceptance band.
    "mm_dominant_freq" -> ((s, dir) => {
      graft.functions.AudioFunctions.register(s)
      import graft.functions.AudioFunctions._
      clips(s, dir).filter(Pipeline.gate)
        .withColumn("bytes", pcm_synth(clipFreq(col("event_id")), col("sr_hz"), col("dur_ms"), col("codec")))
        // 250ms analysis window FUSED into the Goertzel pass (7-arg form,
        // window length from the one shared analysisWindowSamples
        // definition): bit-identical to the r5 analysisWindow builder
        // chain (PcmSpec-pinned) minus its per-row window byte[] copy —
        // and for container codecs minus a full-clip identity-gain
        // decode+rewrite whose output existed only to be sliced.
        .select(col("clip_id"), col("sr_hz"),
          round(pcm_dominant_freq(col("bytes"), col("codec"), col("sr_hz"),
            lit(220.0), lit(55.0), lit(16),
            analysisWindowSamples(col("sr_hz")))).cast("bigint").as("freq_hz"))
    }),
    // Loudness normalization (pcm_gain to a 0.25 target RMS): per-clip
    // gain derived from the fused energy, applied with s16 saturation,
    // then RE-measured from the normalized bytes — the round trip must
    // land in [248, 252]·10⁻³ and emit exactly 2 bytes/sample.
    "mm_loudnorm" -> ((s, dir) => {
      graft.functions.AudioFunctions.register(s)
      import graft.functions.AudioFunctions._
      clips(s, dir).filter(Pipeline.gate)
        .withColumn("bytes", pcm_synth(clipFreq(col("event_id")), col("sr_hz"), col("dur_ms"), col("codec")))
        .withColumn("n", expr("CAST(sr_hz AS BIGINT) * dur_ms div 1000"))
        // shared normalization definition (AudioFunctions.normalizedPcm):
        // the streaming audioprep job uses the SAME builder, so the 0.25
        // target and the silent-clip null edge cannot drift between the
        // oracle-checked batch form and the production ingest
        .withColumn("normed", normalizedPcm(col("bytes"), col("codec"), col("n")))
        .select(col("clip_id"), col("sr_hz"), col("dur_ms"),
          inBand(rmsX1000FromEnergy(pcm_energy(col("normed"), lit("pcm_s16le")), col("n")),
            (248L, 252L)).as("norm_rms_ok"),
          when(length(col("normed")) === col("n") * 2, 1L).otherwise(0L).as("len_ok"))
    }),
    // Clipping detection (pcm_clip_ratio): the pristine amplitude-0.5
    // fixture has ZERO samples at/above 0.999 (exact integer oracle);
    // overdriven 3× through pcm_gain it saturates, and the clipped
    // fraction must match the sine closed form 1 − (2/π)·asin(0.666) ≈
    // 0.537 within the acceptance band (PcmSpec sweeps the whole
    // fixture grid to prove the band holds everywhere).
    "mm_clip_detect" -> ((s, dir) => {
      graft.functions.AudioFunctions.register(s)
      import graft.functions.AudioFunctions._
      clips(s, dir).filter(Pipeline.gate)
        .withColumn("bytes", pcm_synth(clipFreq(col("event_id")), col("sr_hz"), col("dur_ms"), col("codec")))
        .select(col("clip_id"),
          round(pcm_clip_ratio(col("bytes"), col("codec"), lit(999)) * 1000000)
            .cast("bigint").as("orig_clip_ppm"),
          // fused overdrive screen: gain applied INSIDE the one clip-ratio
          // pass (bit-identical to the pcm_gain(…, 3000) two-step form,
          // PcmSpec-pinned) — the gained byte[] this query used to
          // materialize per row existed only to be re-walked and counted
          when(pcm_clip_ratio(col("bytes"), col("codec"), lit(999), lit(3000))
              .between(0.50, 0.575), 1L)
            .otherwise(0L).as("hot_clip_flag"))
    }),
    // AUDIO near-dup: cluster clips by a GAIN-INVARIANT spectral
    // fingerprint (dominant tone via Goertzel × sample rate × duration) —
    // the audio analog of content dedup. Each clip is first re-levelled
    // with a per-clip gain (750…2250, keyed off event_id) so byte-level
    // identity is destroyed; the fingerprint must still recover the
    // closed-form clustering (exact dedup over these bytes would find
    // NOTHING — PcmSpec pins that the gained bytes differ). ONE
    // map-side-combinable shuffle on an 80-value key; output size is
    // scale-independent.
    "dedup_audio_fp" -> ((s, dir) => {
      graft.functions.AudioFunctions.register(s)
      import graft.functions.AudioFunctions._
      clips(s, dir).filter(Pipeline.gate)
        .withColumn("bytes", pcm_synth(clipFreq(col("event_id")), col("sr_hz"), col("dur_ms"), col("codec")))
        // re-levelled 250ms ANALYSIS WINDOW, both now FUSED into the
        // Goertzel pass (8-arg pcm_dominant_freq; window length from the
        // one shared analysisWindowSamples definition, gain math
        // bit-identical to pcm_gain — PcmSpec sweeps fused-vs-builder
        // over the full grid): tone identity does not improve past a
        // window whose 4 Hz bin resolution is already 14× finer than the
        // 55 Hz candidate spacing, and the r5 builder chain re-wrote a
        // gained window byte[] per row (for wav rows, the WHOLE clip)
        // only for this scan to re-read it. Clips shorter than the
        // window use the whole clip.
        .withColumn("fp_hz",
          round(pcm_dominant_freq(col("bytes"), col("codec"), col("sr_hz"),
            lit(220.0), lit(55.0), lit(16), analysisWindowSamples(col("sr_hz")),
            (lit(750) + (col("event_id") % 7) * 250).cast("int"))).cast("bigint"))
        .groupBy(col("fp_hz"), col("sr_hz"), col("dur_ms"))
        // canonical representative = min EVENT id, not min clip_id: a
        // string min forces SortAggregate (string agg buffers are not
        // hash-aggregable), paying a per-partition sort of every input
        // row; the numeric min keeps the whole partial/final pipeline in
        // HashAggregate (PlanSpec-pinned)
        .agg(count(lit(1)).as("n_clips"), min(col("event_id")).as("canonical_event_id"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "f1_gate" -> Oracles.gateSql,
    "full_pipeline" -> Oracles.fullPipelineSql(Nil),
    "f2_status_filter" -> Oracles.eventsSql(Seq("fail", "error")),
    "r2_passthrough" -> Oracles.fullPipelineSql(Seq("pass")),
    "x3_tolerant_decode" -> Oracles.tolerantDecodeSql,
    "a1_counters" -> Oracles.countersSql,
    "e2_event_key" -> Oracles.eventKeySql,
    "e1_owner_refs" -> Oracles.ownerRefsSql,
    "e3_attr_prefix_copy" -> (ClipTable.oraclePrelude + """
SELECT clip_id, 'clip.codec' AS attr_key, codec AS attr_value FROM clips
UNION ALL SELECT clip_id, 'clip.sr_hz', CAST(sr_hz AS STRING) FROM clips
UNION ALL SELECT clip_id, 'clip.tenant', CAST(tenant_id AS STRING) FROM clips
UNION ALL SELECT clip_id, 'clip.key',
  COALESCE(CASE WHEN len(string_split(clip_id,'-')) >= 3 THEN
    array_to_string(list_slice(string_split(clip_id,'-'), 1, len(string_split(clip_id,'-')) - 2), '-')
  END, '') FROM clips"""),
    "pcm_decode_meta" -> (ClipTable.oraclePrelude + """
SELECT clip_id, codec,
  CASE WHEN codec = 'pcm_s16le' THEN 2 * ((CAST(sr_hz AS BIGINT) * dur_ms) // 1000)
       WHEN codec = 'wav' THEN 44 + 2 * ((CAST(sr_hz AS BIGINT) * dur_ms) // 1000)
  END AS bytes_len,
  CASE WHEN codec IN ('pcm_s16le','wav') THEN (CAST(sr_hz AS BIGINT) * dur_ms) // 1000
  END AS n_samples
FROM clips"""),
    "w_tumbling" -> Oracles.withEvents(Windows.tumblingSql),
    "w_tumbling_salted" -> Oracles.withEvents(Windows.tumblingSql),
    "w_tumbling_salted_hll" -> Oracles.withEvents(
      Windows.tumblingSql.replace("FROM ev GROUP BY 1, 2",
        ",\n       CAST(1 AS BIGINT) AS hll_ok_10pct\nFROM ev GROUP BY 1, 2")),
    "w_sliding" -> Oracles.withEvents(Windows.slidingSql),
    "w_session" -> Oracles.withEvents(Windows.sessionSql),
    "cep_sequence" -> Oracles.withEvents(Cep.detectSql()),
    "q_topk_risk" -> Oracles.withEvents("""
SELECT event_uid, clip_id, rule_id, risk_score FROM ev
ORDER BY risk_score DESC, event_uid ASC LIMIT 20"""),
    "txt_quality" -> TextOps.qualitySql,
    "txt_langid" -> TextOps.langIdSql,
    "txt_tokens" -> TextOps.tokenCountsSql,
    "txt_fingerprint" -> TextOps.fingerprintSql,
    "td_train_split" -> TextOps.trainSplitSql,
    "td_pack_sequences" -> TextOps.packSequencesSql(),
    "dedup_exact" -> Dedup.exactSql,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql(),
    "dedup_minhash_lsh" -> Dedup.minhashLshSql(),
    "dedup_simhash" -> Dedup.simhashSql,
    "dedup_simhash_pairs" -> Dedup.simhashPairsSql(),
    "dedup_embed_cosine" -> Similarity.cosineNearDupSql(),
    "sim_bruteforce_topk" -> Similarity.bruteForceTopKSql(),
    "sim_ivf_bucket" -> Similarity.ivfTopNeighborSql,
    "sim_ivf_multiprobe" -> Similarity.ivfMultiprobeTopKSql(),
    "j_interval" -> (Oracles.prelude +
      s", ev AS (${Oracles.eventsSelect(Nil)}),\n${IntervalJoin.activationsSqlDuck.trim}\n${IntervalJoin.joinSqlDuck}"),
    "x2_poly_coerce" -> (ClipTable.oraclePrelude + graft.operators.Coerce.polymorphicSql),
    "m10_time_ns" -> (Oracles.prelude + """
SELECT clip_id, rule_id,
       CAST(epoch_ns(event_time)
            + CASE WHEN p_off > 0 THEN p_off * 1000000000 ELSE 0 END AS BIGINT) AS event_time_ns
FROM decoded"""),
    "p_disabled_identity" -> (ClipTable.oraclePrelude + "SELECT * FROM clips"),
    "e3_typed_attrs" -> (ClipTable.oraclePrelude + """
SELECT clip_id, 'clip.codec' AS attr_key, 'str' AS vtype, codec AS v_str,
       CAST(NULL AS BIGINT) AS v_long, CAST(NULL AS DOUBLE) AS v_dbl,
       CAST(NULL AS BOOLEAN) AS v_bool, CAST(NULL AS STRING) AS v_arr_json,
       CAST(NULL AS STRING) AS v_map_json
FROM clips
UNION ALL SELECT clip_id, 'clip.sr_hz', 'int', NULL, CAST(sr_hz AS BIGINT), NULL, NULL, NULL, NULL FROM clips
UNION ALL SELECT clip_id, 'clip.dur_s', 'double', NULL, NULL, dur_ms / 1000.0, NULL, NULL, NULL FROM clips
UNION ALL SELECT clip_id, 'clip.is_wav', 'bool', NULL, NULL, NULL, codec = 'wav', NULL, NULL FROM clips
UNION ALL SELECT clip_id, 'clip.tags', 'slice', NULL, NULL, NULL, NULL, to_json(['audio', codec]), NULL FROM clips
UNION ALL SELECT clip_id, 'clip.props', 'map', NULL, NULL, NULL, NULL, NULL, to_json(MAP {'tenant': CAST(tenant_id AS STRING)}) FROM clips"""),
    "mm_resample_meta" -> (ClipTable.oraclePrelude + """
SELECT clip_id, sr_hz,
  (CAST(sr_hz AS BIGINT) * dur_ms) // 1000 AS n_src,
  (((CAST(sr_hz AS BIGINT) * dur_ms) // 1000) * 16000) // sr_hz AS n_16k,
  CAST(1 AS BIGINT) AS rms_ok
FROM clips
WHERE codec IN ('pcm_s16le','wav') AND transcript IS NOT NULL"""),
    "agg_approx_distinct" -> Oracles.withEvents("""
SELECT event_key, COUNT(DISTINCT clip_id) AS exact_clips,
       CAST(1 AS BIGINT) AS approx_ok_10pct
FROM ev GROUP BY event_key"""),
    "mm_audio_features" -> (ClipTable.oraclePrelude + """
SELECT clip_id, sr_hz, dur_ms,
  (CAST(sr_hz AS BIGINT) * dur_ms) // 1000 AS n_samples,
  ((CAST(sr_hz AS BIGINT) * dur_ms) // 1000) // (sr_hz // 10) AS n_frames_100ms,
  CAST(1 AS BIGINT) AS rms_ok,
  CAST(1 AS BIGINT) AS peak_ok
FROM clips
WHERE codec IN ('pcm_s16le','wav') AND transcript IS NOT NULL"""),
    "mm_clip_quality" -> (ClipTable.oraclePrelude + """
SELECT clip_id, sr_hz, dur_ms,
  (CAST(sr_hz AS BIGINT) * dur_ms) // 1000 AS n_samples,
  CAST(1 AS BIGINT) AS zcr_ok,
  CAST(1 AS BIGINT) AS rms_ok,
  CAST(1 AS BIGINT) AS peak_ok,
  CAST(1 AS BIGINT) AS dc_ok
FROM clips
WHERE codec IN ('pcm_s16le','wav') AND transcript IS NOT NULL"""),
    "mm_segments" -> (ClipTable.oraclePrelude + """
SELECT clip_id, sr_hz, dur_ms,
  CAST(1 AS BIGINT) AS n_segments,
  CAST(0 AS BIGINT) AS seg_start_ms,
  CAST(1 AS BIGINT) AS seg_end_ok
FROM clips
WHERE codec IN ('pcm_s16le','wav') AND transcript IS NOT NULL"""),
    "mm_dominant_freq" -> (ClipTable.oraclePrelude + """
SELECT clip_id, sr_hz,
  CAST(220 + (event_id % 16) * 55 AS BIGINT) AS freq_hz
FROM clips
WHERE codec IN ('pcm_s16le','wav') AND transcript IS NOT NULL"""),
    "mm_loudnorm" -> (ClipTable.oraclePrelude + """
SELECT clip_id, sr_hz, dur_ms,
  CAST(1 AS BIGINT) AS norm_rms_ok,
  CAST(1 AS BIGINT) AS len_ok
FROM clips
WHERE codec IN ('pcm_s16le','wav') AND transcript IS NOT NULL"""),
    "mm_clip_detect" -> (ClipTable.oraclePrelude + """
SELECT clip_id,
  CAST(0 AS BIGINT) AS orig_clip_ppm,
  CAST(1 AS BIGINT) AS hot_clip_flag
FROM clips
WHERE codec IN ('pcm_s16le','wav') AND transcript IS NOT NULL"""),
    "dedup_audio_fp" -> (ClipTable.oraclePrelude + """
SELECT CAST(220 + (event_id % 16) * 55 AS BIGINT) AS fp_hz,
  sr_hz, dur_ms,
  COUNT(*) AS n_clips, MIN(event_id) AS canonical_event_id
FROM clips
WHERE codec IN ('pcm_s16le','wav') AND transcript IS NOT NULL
GROUP BY 1, 2, 3"""),
  )
}
