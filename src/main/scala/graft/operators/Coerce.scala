package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** X2: polymorphic payload coercion (reference
  * internal/openreports/processor.go:126-155). The reference accepts the
  * `results` payload as (a) a slice of strings, (b) a single string, and
  * SKIPS ill-typed records. In a columnar engine case (a) is a typed
  * `array<string>` column; this operator implements the string-column
  * branch exactly as the reference's `json.Unmarshal([]byte(s), &[]string)`
  * + fallback does:
  *
  *   - a string that strictly parses as a JSON array whose elements are all
  *     strings or nulls → its elements, with null elements decoded as ""
  *     (Go: unmarshaling JSON null into a string slot is a no-op on the
  *     zero value);
  *   - ANY other string — plain text, invalid JSON, valid JSON
  *     object/number, or an array with non-string elements (all of which
  *     fail Unmarshal into []string) → the whole string as a
  *     single-element result;
  *   - NULL (no payload) → empty (the record contributes no rows, the
  *     reference's len==0 skip at processor.go:160-165).
  *
  * The strict element-type check is `schema_of_variant`: a JSON array of
  * strings/nulls merges to ARRAY<STRING> (or ARRAY<VOID> when all-null /
  * empty), while any non-string element yields ARRAY<BIGINT> /
  * ARRAY<VARIANT> / ARRAY<ARRAY<...>> — mirroring Go's per-element
  * strictness without a UDF.
  */
object Coerce {

  def coerceResults(c: Column): Column = {
    val sv = schema_of_variant(try_parse_json(c))
    val asArray = from_json(c, ArrayType(StringType))
    when(c.isNull, array().cast("array<string>"))
      .when(sv === "ARRAY<STRING>" || sv === "ARRAY<VOID>",
        transform(asArray, x => coalesce(x, lit(""))))
      // the JSON literal "null": Unmarshal succeeds leaving a nil slice —
      // len 0 ⇒ record skipped, NOT a plain-string fallback
      .when(sv === "VOID", array().cast("array<string>"))
      .otherwise(array(c))
  }

  /** Deterministic polymorphic fixture + coercion over the clip table,
    * covering every runtime branch: a JSON array with a null element
    * (decoded as ""), a plain string, a JSON object, a non-string-element
    * array and a bare number (all three Unmarshal failures → single
    * plain-string result), the JSON literal `null` (nil slice → record
    * skipped), and an empty array (record skipped).
    * Output: (clip_id, pos, result) with 1-based element position. */
  def polymorphic(clips: DataFrame): DataFrame = {
    val raw = when(col("event_id") % 7 === 0, lit("""["fail", null, "pass"]"""))
      .when(col("event_id") % 7 === 1, lit("plain-result"))
      .when(col("event_id") % 7 === 2, lit("""{"not": "an array"}"""))
      .when(col("event_id") % 7 === 3, lit("""[1, 2]"""))
      .when(col("event_id") % 7 === 4, lit("123"))
      .when(col("event_id") % 7 === 5, lit("null"))
      .otherwise(lit("[]"))
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
      -- json_valid guards via a dedicated CASE ARM, not an AND conjunct:
      -- DuckDB adaptively REORDERS conjunctions at larger row counts, so
      -- "json_valid(raw) AND json_type(raw) = ..." can evaluate
      -- json_type first and throw on non-JSON input (observed at sf0.1;
      -- CASE arms are strictly ordered). The json_* calls in the second
      -- arm only ever see valid JSON.
      CASE WHEN NOT json_valid(raw) THEN [raw]
           WHEN json_type(raw) = 'ARRAY'
                AND len(list_filter(json_transform(raw, '["JSON"]'),
                      x -> json_type(x) NOT IN ('VARCHAR'))) = 0
             THEN list_transform(json_transform(raw, '["VARCHAR"]'), x -> COALESCE(x, ''))
           WHEN json_type(raw) = 'NULL' THEN []
           ELSE [raw] END AS coerced
    FROM (
      SELECT clip_id,
        CASE WHEN event_id % 7 = 0 THEN '["fail", null, "pass"]'
             WHEN event_id % 7 = 1 THEN 'plain-result'
             WHEN event_id % 7 = 2 THEN '{"not": "an array"}'
             WHEN event_id % 7 = 3 THEN '[1, 2]'
             WHEN event_id % 7 = 4 THEN '123'
             WHEN event_id % 7 = 5 THEN 'null'
             ELSE '[]' END AS raw
      FROM clips) r0) r1) r2"""
}
