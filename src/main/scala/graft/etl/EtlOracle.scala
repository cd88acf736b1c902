package graft.etl

import graft.functions.LangId

/** Self-contained DuckDB oracle SQL for the flagship ETL queries: the whole
  * flatten → derive → validate → dedup → report lineage (SURVEY.md §3 E2/E3,
  * reference transform_raw_data.py:192-235 + generate_report.py:20-56)
  * re-implemented over the INLINED fixture document with DuckDB JSON
  * functions. The reference semantics are therefore double-implemented —
  * once as the Spark pipeline, once as SQL — and the driver hash-compares
  * the two, which is a far stronger check than the goldens alone.
  *
  * Semantics pinned on both sides (SURVEY §7): positional ordinals from the
  * JSON array indices (range+unnest zip here, posexplode in Spark), the
  * running-max contribution boundary, Python truthiness on card URLs and the
  * 0-epoch date-order skip, NaN-equal null-key dedup collapse (SQL window
  * PARTITION BY groups NULLs), frozen now=1720000000, and half-even rounding
  * (round_even ↔ bround).
  */
object EtlOracle {

  private val minEpoch = AdSchema.minEpoch
  private val maxEpoch = AdSchema.maxEpoch

  /** Shared CTE chain: raw JSON document → curated rows + quarantine rows. */
  private def ctes: String = s"""
    WITH raw AS (
      SELECT json_transform('${AdFixture.json}'::JSON, '[["JSON"]]') AS gs
    ), g AS (
      SELECT unnest(range(len(gs))) AS group_idx, unnest(gs) AS grp FROM raw
    ), a AS (
      SELECT group_idx, unnest(range(len(grp))) AS pos, unnest(grp) AS ad FROM g
    ), p AS (
      SELECT 'fixture' AS doc_id, group_idx, pos,
             json_extract_string(ad, '$$.ad_archive_id') AS ad_id,
             TRY_CAST(json_extract_string(ad, '$$.is_active') AS BOOLEAN) AS is_active,
             TRY_CAST(json_extract_string(ad, '$$.start_date') AS BIGINT) AS start_date_ts,
             TRY_CAST(json_extract_string(ad, '$$.end_date') AS BIGINT) AS end_date_ts,
             TRY_CAST(json_extract_string(ad, '$$.total_active_time') AS BIGINT)
               AS total_active_time_sec,
             json_extract_string(ad, '$$.collation_id') AS ad_group_id,
             TRY_CAST(json_extract_string(ad, '$$.collation_count') AS BIGINT)
               AS collation_count,
             json_extract_string(ad, '$$.snapshot.display_format') AS display_format,
             json_transform(json_extract(ad, '$$.snapshot.cards'), '["JSON"]') AS cards,
             json_extract_string(ad, '$$.snapshot.body.text') AS body_text
      FROM a
    ), derived0 AS (
      SELECT *,
        CASE WHEN display_format = 'VIDEO' THEN TRUE
             WHEN display_format IN ('DCO', 'CAROUSEL') THEN COALESCE(
               len(list_filter(cards, c ->
                 json_extract_string(c, '$$.video_hd_url') IS NOT NULL
                 AND json_extract_string(c, '$$.video_hd_url') <> '')) > 0, FALSE)
             ELSE FALSE END AS hv,
        CASE WHEN display_format = 'IMAGE' THEN TRUE
             WHEN display_format IN ('DCO', 'CAROUSEL') THEN COALESCE(
               len(list_filter(cards, c ->
                 json_extract_string(c, '$$.original_image_url') IS NOT NULL
                 AND json_extract_string(c, '$$.original_image_url') <> '')) > 0, FALSE)
             ELSE FALSE END AS hi,
        COALESCE(CASE WHEN display_format IN ('DCO', 'CAROUSEL')
                      THEN json_extract_string(cards[1], '$$.body')
                      ELSE body_text END, '') AS ad_text
      FROM p
    ), derived AS (
      SELECT doc_id, group_idx, pos, ad_id, is_active, start_date_ts, end_date_ts,
             total_active_time_sec, ad_group_id,
             CAST(COALESCE(MAX(CASE WHEN ad_id IS NOT NULL AND is_active IS NOT NULL
                                     AND start_date_ts IS NOT NULL
                                    THEN COALESCE(collation_count, 0) END)
                  OVER (PARTITION BY doc_id, group_idx ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT)
               AS grouped_ads_count,
             display_format,
             CASE WHEN hv AND hi THEN 'both'
                  WHEN hv THEN 'video-only'
                  WHEN hi THEN 'image-only'
                  ELSE 'none' END AS media_mix,
             ad_text,
             ${LangId.duckDbSql("ad_text")} AS ad_lang_code
      FROM derived0
    ), flagged AS (
      SELECT *,
        CASE WHEN ad_id IS NULL THEN 'missing:ad_id'
             WHEN is_active IS NULL THEN 'missing:is_active'
             WHEN start_date_ts IS NULL THEN 'missing:start_date_ts'
             WHEN start_date_ts < $minEpoch OR start_date_ts > $maxEpoch
               THEN 'invalid_epoch:start_date_ts'
             WHEN end_date_ts IS NOT NULL
                  AND (end_date_ts < $minEpoch OR end_date_ts > $maxEpoch)
               THEN 'invalid_epoch:end_date_ts'
             WHEN display_format IS NULL
                  OR display_format NOT IN ('VIDEO', 'IMAGE', 'DCO', 'CAROUSEL')
               THEN 'invalid_enum:display_format'
             WHEN start_date_ts <> 0 AND end_date_ts IS NOT NULL AND end_date_ts <> 0
                  AND end_date_ts < start_date_ts
               THEN 'end_before_start'
             END AS validation_error
      FROM derived
    ), valid AS (
      SELECT * EXCLUDE (validation_error) FROM flagged WHERE validation_error IS NULL
    ), dd1 AS (
      SELECT * EXCLUDE (rn) FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY ad_id
                    ORDER BY doc_id, group_idx, pos) AS rn FROM valid)
      WHERE rn = 1
    ), dd2 AS (
      SELECT * EXCLUDE (rn) FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY ad_group_id
                    ORDER BY doc_id, group_idx, pos) AS rn FROM dd1)
      WHERE rn = 1
    ), dd3 AS (
      SELECT * EXCLUDE (rn) FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY ad_text
                    ORDER BY doc_id, group_idx, pos) AS rn FROM dd2)
      WHERE rn = 1
    ), curated AS (
      SELECT ad_id, is_active, start_date_ts, end_date_ts, total_active_time_sec,
             ad_group_id, grouped_ads_count, display_format, media_mix, ad_text,
             ad_lang_code
      FROM dd3
    )"""

  val curatedSql: String = s"""$ctes
    SELECT * FROM curated ORDER BY ad_id"""

  val quarantineSql: String = s"""$ctes
    SELECT doc_id, group_idx, pos, ad_id, is_active, start_date_ts, end_date_ts,
           total_active_time_sec, ad_group_id, grouped_ads_count, display_format,
           media_mix, ad_text, ad_lang_code, validation_error
    FROM flagged
    WHERE validation_error IS NOT NULL
    ORDER BY doc_id, group_idx, pos"""

  /** E3 (generate_report.py:20-56): frozen now, half-even hours, top-10. */
  val reportSql: String = s"""$ctes
    SELECT ad_id,
           'https://www.facebook.com/ads/library/?id=' || ad_id AS ad_link,
           is_active,
           make_timestamp(start_date_ts * 1000000) AS start_date,
           CASE WHEN end_date_ts IS NULL OR end_date_ts = start_date_ts THEN NULL
                ELSE make_timestamp(end_date_ts * 1000000) END AS end_date,
           CAST(round_even(COALESCE(CAST(total_active_time_sec AS DOUBLE),
                ${AdFixture.frozenNow.getEpochSecond} - CAST(start_date_ts AS DOUBLE))
                / 3600, 0) AS BIGINT) AS hours_passed,
           media_mix, ad_text, ad_lang_code
    FROM curated
    WHERE is_active
    ORDER BY hours_passed DESC, ad_id ASC
    LIMIT 10"""
}
