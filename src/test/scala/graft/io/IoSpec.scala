package graft.io

import java.nio.file.{Files, Paths}
import java.time.Instant

import graft.SparkSpec
import graft.etl.{AdFixture, AdPipeline}

class IoSpec extends SparkSpec {

  test("run-id artifacts: two runs land in distinct, non-overwriting dirs") {
    val base = Files.createTempDirectory("graft-runs").toString
    val landing = Files.createTempDirectory("graft-io-landing").toString
    Files.writeString(Paths.get(landing, "doc1.json"), AdFixture.json)
    val (c1, q1, r1) = AdPipeline.runWithId(
      spark, landing, base, Instant.ofEpochSecond(1720000000L))
    val (c2, q2, r2) = AdPipeline.runWithId(
      spark, landing, base, Instant.ofEpochSecond(1720000061L))
    assert(Set(c1, q1, r1, c2, q2, r2).size === 6)
    assert(c1 === s"$base/curated_20240703_094640")
    assert(c2 === s"$base/curated_20240703_094741")
    assert(spark.read.parquet(c1).count() === spark.read.parquet(c2).count())
    assert(Files.list(Paths.get(r1)).toArray.nonEmpty)
    assert(Files.list(Paths.get(r2)).toArray.nonEmpty)
  }

  test("report CSV and curated ORC round-trip losslessly") {
    val fixture = AdPipeline.fixtureRun(spark)
    // CSV: write the report, read back with the written schema
    val csvDir = Files.createTempDirectory("graft-io-csv").toString + "/report"
    val report = fixture.report
      .selectExpr("ad_id", "ad_link", "is_active", "hours_passed", "media_mix")
    Sinks.reportCsv(report, csvDir)
    val csvBack = Sources.reportCsv(spark, csvDir, report.schema)
    assert(csvBack.count() === report.count())
    assert(csvBack.select("ad_id").collect().map(_.getString(0)).sorted.toSeq ===
      report.select("ad_id").collect().map(_.getString(0)).sorted.toSeq)
    // ORC: same curated frame through the columnar alternative
    val orcDir = Files.createTempDirectory("graft-io-orc").toString + "/curated"
    Sinks.curatedOrc(fixture.curated, orcDir)
    val orcBack = Sources.curatedOrc(spark, orcDir)
    // file formats read back all-nullable — compare names and types
    assert(orcBack.schema.map(f => (f.name, f.dataType)) ===
      fixture.curated.schema.map(f => (f.name, f.dataType)))
    assert(orcBack.count() === fixture.curated.count())
  }

  test("raw landing sink round-trips through the whole-text source") {
    val landing = Files.createTempDirectory("graft-land-sink").toString + "/raw"
    val docs = Sources.rawAdsFromStrings(spark,
      Seq(("d1", AdFixture.json), ("d2", """[[{"ad_archive_id": "x1"}]]""")))
    Sinks.rawJsonLanding(docs, landing)
    val back = Sources.rawAdsJson(spark, s"$landing/*")
    assert(back.count() === 2)
    val values = back.collect().map(_.getAs[String]("value")).sortBy(_.length)
    assert(values(0).trim === """[[{"ad_archive_id": "x1"}]]""")
    assert(values(1).contains("\"ad_archive_id\": \"1001\""))
    // appending lands more documents without touching earlier ones
    Sinks.rawJsonLanding(
      Sources.rawAdsFromStrings(spark, Seq(("d3", """[[{"ad_archive_id": "x2"}]]"""))),
      landing)
    assert(Sources.rawAdsJson(spark, s"$landing/*").count() === 3)
  }
}
