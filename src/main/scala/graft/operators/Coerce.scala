package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** X2: polymorphic payload coercion (reference
  * internal/openreports/processor.go:126-155). The reference accepts the
  * `results` payload as (a) a slice of strings, (b) a single string holding
  * a JSON array, or (c) a plain string, and SKIPS ill-typed records instead
  * of failing. In a columnar engine case (a) is a typed `array<string>`
  * column; this operator implements the string-column branch — the 3-way
  * runtime coercion — as pure column algebra:
  *
  *   - valid JSON array  → its elements (null / ill-typed elements skipped)
  *   - not JSON at all   → the plain string as a single-element result
  *   - valid JSON non-array (object/number/scalar) → ill-typed ⇒ skipped
  *     (empty result, the record contributes no rows)
  */
object Coerce {

  def coerceResults(c: Column): Column = {
    val asArray = from_json(c, ArrayType(StringType))
    // NULL input first: it is "no payload", not a plain string — without
    // this branch `try_parse_json(NULL).isNull` routes it to array(NULL)
    // and explode emits a phantom null-result row the oracle never has
    when(c.isNull, array().cast("array<string>"))
      .when(asArray.isNotNull, filter(asArray, x => x.isNotNull))
      .when(try_parse_json(c).isNull, array(c))
      .otherwise(array().cast("array<string>"))
  }

  /** Deterministic polymorphic fixture + coercion over the clip table:
    * one third JSON-array strings (with a null element to skip), one third
    * plain strings, one third ill-typed JSON objects (skipped records).
    * Output: (clip_id, pos, result) with 1-based element position. */
  def polymorphic(clips: DataFrame): DataFrame = {
    val raw = when(col("event_id") % 3 === 0, lit("""["fail", null, "pass"]"""))
      .when(col("event_id") % 3 === 1, lit("plain-result"))
      .otherwise(lit("""{"not": "an array"}"""))
    clips.select(col("clip_id"), raw.as("results_raw"))
      .select(col("clip_id"), posexplode(coerceResults(col("results_raw"))).as(Seq("p", "result")))
      .select(col("clip_id"), (col("p") + 1).cast("bigint").as("pos"), col("result"))
  }

  val polymorphicSql: String = """
SELECT clip_id, CAST(pos AS BIGINT) AS pos, result
FROM (
  SELECT clip_id,
         unnest(coerced) AS result,
         generate_subscripts(coerced, 1) AS pos
  FROM (
    SELECT clip_id,
      CASE WHEN json_valid(raw) AND json_type(raw) = 'ARRAY'
             THEN list_filter(json_transform(raw, '["VARCHAR"]'), x -> x IS NOT NULL)
           WHEN NOT json_valid(raw) THEN [raw]
           ELSE [] END AS coerced
    FROM (
      SELECT clip_id,
        CASE WHEN event_id % 3 = 0 THEN '["fail", null, "pass"]'
             WHEN event_id % 3 = 1 THEN 'plain-result'
             ELSE '{"not": "an array"}' END AS raw
      FROM clips) r0) r1) r2"""
}
