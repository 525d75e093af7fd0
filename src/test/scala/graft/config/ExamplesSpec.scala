package graft.config

import graft.{Pipeline, SparkSpec}
import graft.bronze.Ingest

/** The SHIPPED example configs under examples/ are artifacts a user
  * copies first — so they are pinned here as real FILE inputs, not
  * mirrored as inline strings (every other config spec uses inline
  * YAML; none of them would catch an example file rotting against a
  * loader change). The two pipeline examples run END-TO-END through the
  * same path the RunPipeline CLI takes; the dataset registry parses
  * with its documented per-environment overlay semantics. */
class ExamplesSpec extends SparkSpec {

  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")

  private def runExample(path: String): Pipeline.RunResult = {
    val out = java.nio.file.Files
      .createTempDirectory("graft_example_out").toString
    // GRAFT_SF_DIR falls to its documented sf0.001 default; only the
    // output dir is redirected (the ${VAR:-default} surface in action)
    val config = ConfigLoader.parse(read(path),
      env = Map("GRAFT_OUT_DIR" -> out))
    val bronze = config.bronze.get
    var df = Ingest.readSource(spark, bronze.source)
    if (bronze.dropAllNullColumns) df = Ingest.dropAllNullColumns(df)
    if (bronze.addIngestionMetadata)
      df = Ingest.withIngestionMetadata(df, bronze.source.path)
    Pipeline.run(spark, config, df,
      goldSink = Some((name, mart) => mart.write.mode("overwrite")
        .parquet(s"${bronze.targetPath}/gold/$name")))
  }

  test("examples/events_pipeline.yaml runs end-to-end") {
    val result = runExample("examples/events_pipeline.yaml")
    result.stages.foreach(_.rows should be > 0L)
    // the example documents its gates as a passing baseline dashboard —
    // a shipped example that FAILS its own quality block teaches the
    // config surface backwards
    result.qualityResults.filterNot(_.passed) shouldBe empty
  }

  test("examples/curation_pipeline.yaml runs end-to-end") {
    val result = runExample("examples/curation_pipeline.yaml")
    result.stages.foreach(_.rows should be > 0L)
    result.qualityResults.filterNot(_.passed) shouldBe empty
  }

  test("examples/datasets.yaml parses with its documented overlay semantics") {
    val yaml = read("examples/datasets.yaml")
    val dev = ConfigLoader.parseDatasets(yaml,
      environment = Some("dev"), env = Map.empty)
    // enabled datasets only (fhv is enabled: false), in priority order
    // (taxi_zones ships priority 0 — ahead of the monthly feeds)
    dev.map(_.name) shouldBe
      Seq("taxi_zones", "yellow_taxi", "green_taxi")
    // the dev environment's frequency default overlays every dataset
    // that does not set its own... and every shipped dataset that sets
    // one keeps it (per-dataset keys win over environment defaults)
    dev.find(_.name == "taxi_zones").get.frequency shouldBe "yearly"
    dev.find(_.name == "yellow_taxi").get.frequency shouldBe "monthly"
    // the CSV feed carries its format through; parquet is the default
    dev.find(_.name == "taxi_zones").get.format shouldBe "csv"
    dev.find(_.name == "green_taxi").get.format shouldBe "parquet"
  }
}
