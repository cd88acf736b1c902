package graft.etl

/** Deterministic raw-ads fixture (FIXTURES.md §1) exercising every semantic
  * branch the reference has: DCO/CAROUSEL vs VIDEO/IMAGE text paths, card
  * media combos incl. empty-string URLs, every validation failure class,
  * null/equal end_date_ts, null-key dedup collapse, the running-max
  * contribution boundary, pass-composition of the three dedup passes, and
  * half-even rounding on an exact half-hour.
  *
  * Expected outcomes (with now = 1720000000) are asserted in AdPipelineSpec.
  */
object AdFixture {

  /** One raw JSON document: an array of 4 ad groups. */
  val json: String = """[
  [
    {"ad_archive_id": "1001", "is_active": true, "start_date": 1717200000,
     "end_date": 1719800000, "total_active_time": 360000,
     "collation_id": "g1", "collation_count": 2,
     "snapshot": {"display_format": "VIDEO",
                  "body": {"text": "hello world this is english text"}}},
    {"ad_archive_id": "1002", "is_active": true, "start_date": 1717200000,
     "end_date": null, "total_active_time": null,
     "collation_id": "g1", "collation_count": null,
     "snapshot": {"display_format": "IMAGE",
                  "body": {"text": "the quick brown fox and the lazy dog"}}},
    {"ad_archive_id": "1003", "is_active": true, "start_date": 1717000000,
     "end_date": 1717000000, "total_active_time": 7200,
     "collation_id": null, "collation_count": 5,
     "snapshot": {"display_format": "DCO",
                  "cards": [{"body": "el gato y el perro en la casa",
                             "video_hd_url": "",
                             "original_image_url": "https://img.example/1.jpg"}]}}
  ],
  [
    {"ad_archive_id": "1004", "is_active": true, "start_date": 1717100000,
     "end_date": null, "total_active_time": 10800,
     "collation_id": "g2", "collation_count": 1,
     "snapshot": {"display_format": "CAROUSEL",
                  "cards": [{"body": "le chat et le chien sont ici",
                             "video_hd_url": "https://video.example/1.mp4",
                             "original_image_url": "https://img.example/2.jpg"},
                            {"body": "ignored second card",
                             "video_hd_url": null,
                             "original_image_url": null}]}},
    {"ad_archive_id": "1005", "is_active": true, "start_date": 1717100000,
     "end_date": null, "total_active_time": 3600,
     "collation_id": "g3", "collation_count": null,
     "snapshot": {"display_format": "CAROUSEL"}},
    {"ad_archive_id": "1001", "is_active": true, "start_date": 1717100000,
     "end_date": null, "total_active_time": 50400,
     "collation_id": "g9", "collation_count": null,
     "snapshot": {"display_format": "VIDEO",
                  "body": {"text": "duplicate by id of the first ad"}}},
    {"ad_archive_id": "1006", "is_active": true, "start_date": 1717100000,
     "end_date": null, "total_active_time": 7200,
     "collation_id": "g4", "collation_count": 3,
     "snapshot": {"display_format": "TEXT",
                  "body": {"text": "unknown format wow such text"}}}
  ],
  [
    {"is_active": true, "start_date": 1717300000,
     "end_date": null, "total_active_time": null,
     "collation_id": "g5", "collation_count": 99,
     "snapshot": {"display_format": "VIDEO", "body": {"text": "x"}}},
    {"ad_archive_id": "1007", "start_date": 1717300000,
     "end_date": null, "total_active_time": null,
     "collation_id": "g5b", "collation_count": 50,
     "snapshot": {"display_format": "VIDEO", "body": {"text": "y"}}},
    {"ad_archive_id": "1008", "is_active": true,
     "end_date": null, "total_active_time": null,
     "collation_id": "g5c", "collation_count": 42,
     "snapshot": {"display_format": "VIDEO", "body": {"text": "z"}}},
    {"ad_archive_id": "1009", "is_active": true, "start_date": 999999999999999,
     "end_date": null, "total_active_time": 3600,
     "collation_id": "g6", "collation_count": 4,
     "snapshot": {"display_format": "IMAGE",
                  "body": {"text": "bad epoch start here"}}},
    {"ad_archive_id": "1010", "is_active": true, "start_date": 1717300000,
     "end_date": 1717200000, "total_active_time": null,
     "collation_id": "g7", "collation_count": null,
     "snapshot": {"display_format": "VIDEO",
                  "body": {"text": "ends before it starts sadly"}}},
    {"ad_archive_id": "1011", "is_active": true, "start_date": 1717300000,
     "end_date": 1717400000, "total_active_time": 1800,
     "collation_id": "g8", "collation_count": 1,
     "snapshot": {"display_format": "DCO",
                  "cards": [{"body": "der hund und die katze sind hier",
                             "video_hd_url": "https://video.example/2.mp4",
                             "original_image_url": ""}]}}
  ],
  [
    {"ad_archive_id": "1012", "is_active": true, "start_date": 1717250000,
     "end_date": null, "total_active_time": 172800,
     "collation_id": "g10", "collation_count": null,
     "snapshot": {"display_format": "IMAGE",
                  "body": {"text": "the quick brown fox and the lazy dog"}}},
    {"ad_archive_id": "1013", "is_active": true, "start_date": 1717250000,
     "end_date": null, "total_active_time": 5400,
     "collation_id": "g11", "collation_count": null,
     "snapshot": {"display_format": "VIDEO",
                  "body": {"text": "hello world this is english text"}}},
    {"ad_archive_id": "1014", "is_active": true, "start_date": 1717250000,
     "end_date": null, "total_active_time": 9000,
     "collation_id": null, "collation_count": null,
     "snapshot": {"display_format": "IMAGE",
                  "body": {"text": "你好世界 这是中文 文本"}}},
    {"ad_archive_id": "1015", "is_active": false, "start_date": 1717250000,
     "end_date": 1717350000, "total_active_time": 100000,
     "collation_id": "g12", "collation_count": 7,
     "snapshot": {"display_format": "VIDEO",
                  "body": {"text": "inactive advertisement not shown in report"}}},
    {"ad_archive_id": "1016", "is_active": true, "start_date": 1716000000,
     "end_date": null, "total_active_time": null,
     "collation_id": "g13", "collation_count": null,
     "snapshot": {"display_format": "VIDEO",
                  "body": {"text": "fresh advert with no recorded active time"}}}
  ]
]"""

  /** Frozen clock for reproducible seconds_passed (SURVEY §7.2). */
  val frozenNow: java.time.Instant = java.time.Instant.ofEpochSecond(1720000000L)
}
