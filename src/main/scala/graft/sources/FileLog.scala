package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S3 analog: a filelog-style source (reference: the OTel collector's
  * filelog receiver tailing JSON-lines log files). Spark-first form:
  * Structured Streaming's text file source + tolerant per-line JSON decode
  * into the clip schema — malformed lines are DROPPED and counted (the
  * same skip-not-fail contract as the X3 payload decode), never fatal.
  *
  * Scale: the text source is the same admission-controlled file stream as
  * parquet (maxFilesPerTrigger), the decode is pure column algebra inside
  * codegen, and downstream is the ordinary event pipeline.
  */
object FileLog {

  /** Clip record schema as it appears in JSON-lines files. */
  val clipJsonSchema: StructType = StructType(Seq(
    StructField("clip_id", StringType),
    StructField("sr_hz", IntegerType),
    StructField("dur_ms", IntegerType),
    StructField("codec", StringType),
    StructField("transcript", StringType),
    StructField("event_time", TimestampType),
    StructField("tenant_id", LongType),
    StructField("event_id", LongType),
  ))

  /** Streaming clip records from a directory of JSON-lines files. */
  def readClips(spark: SparkSession, dir: String,
                maxFilesPerTrigger: Int = 32): DataFrame =
    decodeLines(
      spark.readStream
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .text(dir))

  /** Batch form over the same files (backfill / testing). */
  def readClipsBatch(spark: SparkSession, dir: String): DataFrame =
    decodeLines(spark.read.text(dir))

  /** Tolerant JSON-lines decode: a line must be well-formed JSON AND carry
    * a clip_id; everything else is skipped. `from_json` PERMISSIVE yields a
    * struct-of-nulls on malformed input, so validity needs the
    * `try_parse_json` guard (same pitfall as X3). */
  def decodeLines(lines: DataFrame): DataFrame =
    lines
      .filter(try_parse_json(col("value")).isNotNull)
      .select(from_json(col("value"), clipJsonSchema).as("c"))
      .filter(col("c").isNotNull && col("c.clip_id").isNotNull)
      .select(col("c.*"))
}
