package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{AudioFunctions, PcmCodec}

/** The per-row invariant from BASELINE.json input_hint: decoded PCM must be
  * allclose to the reference float signal at SNR ≥ 30 dB, for every codec
  * the engine supports, through the registered Catalyst expression. */
class PcmSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    AudioFunctions.register(s)
    s
  }

  test("pcm_s16le round-trip SNR >= 30 dB (plain JVM)") {
    val ref = PcmCodec.sine(440.0, 16000, 500)
    val got = PcmCodec.decode(PcmCodec.synth(440.0, 16000, 500, "pcm_s16le"), "pcm_s16le")
    assert(got.length == ref.length)
    assert(PcmCodec.snrDb(ref, got) >= 30.0)
  }

  test("wav round-trip SNR >= 30 dB and container is well-formed") {
    val ref = PcmCodec.sine(330.0, 44100, 700)
    val bytes = PcmCodec.synth(330.0, 44100, 700, "wav")
    assert(new String(bytes, 0, 4, "ASCII") == "RIFF")
    assert(bytes.length == 44 + ref.length * 2)
    val got = PcmCodec.decode(bytes, "wav")
    assert(PcmCodec.snrDb(ref, got) >= 30.0)
  }

  test("unsupported codec decodes to null (gate pass-through path)") {
    assert(PcmCodec.synth(220.0, 8000, 200, "opus-stub") == null)
    assert(PcmCodec.decode(Array[Byte](1, 2, 3), "opus-stub") == null)
    assert(PcmCodec.decode(Array[Byte](1, 2, 3), "wav") == null) // malformed RIFF
  }

  test("Catalyst expressions: synth + decode through a DataFrame plan") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 16000, 200, "pcm_s16le"), (1L, 8000, 300, "wav"),
        (2L, 48000, 400, "opus-stub"))
      .toDF("event_id", "sr_hz", "dur_ms", "codec")
      .withColumn("bytes", AudioFunctions.pcm_synth(
        AudioFunctions.clipFreq(col("event_id")), col("sr_hz"), col("dur_ms"), col("codec")))
      .withColumn("pcm", AudioFunctions.pcm_decode(col("bytes"), col("codec")))
      .select(col("event_id"), col("sr_hz"), col("dur_ms"), size(col("pcm")).as("n"))
    val rows = df.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    assert(rows(0L).contains(16000 * 200 / 1000))
    assert(rows(1L).contains(8000 * 300 / 1000))
    assert(rows(2L).isEmpty) // unsupported codec → null bytes → null size
  }

  test("SQL-registered functions work in spark.sql") {
    AudioFunctions.register(spark)
    val n = spark.sql(
      "SELECT size(pcm_decode(pcm_synth(220.0, 16000, 250, 'pcm_s16le'), 'pcm_s16le')) AS n")
      .collect()(0).getInt(0)
    assert(n == 4000)
  }

  test("distributed SNR check over many synthesized clips") {
    val s = spark
    import s.implicits._
    val df = s.range(0, 64).select(
      col("id").as("event_id"),
      (lit(8000) + (col("id") % 4).cast("int") * 8000).as("sr_hz"),
      (lit(200) + (col("id") % 10).cast("int") * 100).as("dur_ms"),
      when(col("id") % 2 === 0, "pcm_s16le").otherwise("wav").as("codec"))
    val withPcm = df
      .withColumn("bytes", AudioFunctions.pcm_synth(
        AudioFunctions.clipFreq(col("event_id")), col("sr_hz"), col("dur_ms"), col("codec")))
      .withColumn("pcm", AudioFunctions.pcm_decode(col("bytes"), col("codec")))
    val rows = withPcm.select("event_id", "sr_hz", "dur_ms", "pcm").as[(Long, Int, Int, Array[Float])].collect()
    assert(rows.length == 64)
    rows.foreach { case (id, sr, dur, pcm) =>
      val ref = PcmCodec.sine(220.0 + (id % 16) * 55.0, sr, dur)
      assert(PcmCodec.snrDb(ref, pcm) >= 30.0, s"clip $id SNR below 30dB")
    }
  }
}
