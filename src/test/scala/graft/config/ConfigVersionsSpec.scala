package graft.config

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Mirrors src/config_version_manager.py:15-171 semantics. */
class ConfigVersionsSpec extends AnyFunSuite with Matchers {

  test("version detection defaults to v1.0 like the reference") {
    ConfigVersions.versionOf(Map("version" -> "v1.1")) shouldBe "v1.1"
    ConfigVersions.versionOf(Map.empty) shouldBe "v1.0"
  }

  test("support / current / needs-migration checks") {
    ConfigVersions.isSupported("v1.0") shouldBe true
    ConfigVersions.isSupported("v1.1") shouldBe true
    ConfigVersions.isSupported("v2.0") shouldBe false
    ConfigVersions.isCurrent("v1.0") shouldBe true
    // unsupported versions can't migrate; v1.0 is already current;
    // v1.1 > current is forward-compatible, not a migration
    ConfigVersions.needsMigration("v2.0") shouldBe false
    ConfigVersions.needsMigration("v1.0") shouldBe false
    ConfigVersions.needsMigration("v1.1") shouldBe false
    ConfigVersions.parseVersion("v1.1") shouldBe ((1, 1))
    ConfigVersions.parseVersion("2.0-beta") shouldBe ((2, 0))
  }

  test("migrate: same version unchanged, fallback bumps version only") {
    val tree = Map[String, Any]("version" -> "v1.0", "pipeline" -> "x")
    ConfigVersions.migrate(tree, "v1.0") shouldBe theSameInstanceAs(tree)
    val up = ConfigVersions.migrate(tree, "v1.1")
    up("version") shouldBe "v1.1"
    up("pipeline") shouldBe "x" // everything else preserved
  }

  test("migrate: unsupported source or target raises ConfigError") {
    a[ConfigLoader.ConfigError] should be thrownBy
      ConfigVersions.migrate(Map("version" -> "v0.9"), "v1.0")
    a[ConfigLoader.ConfigError] should be thrownBy
      ConfigVersions.migrate(Map("version" -> "v1.0"), "v9.9")
  }

  test("validateCompatibility messages match the reference states") {
    ConfigVersions.validateCompatibility(Map("version" -> "v1.0")) shouldBe
      ((true, "Configuration is at current version: v1.0"))
    ConfigVersions.validateCompatibility(Map("version" -> "v1.1"))._1 shouldBe true
    val (ok, msg) = ConfigVersions.validateCompatibility(Map("version" -> "v3.0"))
    ok shouldBe false
    msg should include("Unsupported configuration version")
  }

  test("ConfigLoader.parse migrates the raw tree before mapping") {
    val yaml =
      """version: "v1.0"
        |pipeline:
        |  name: taxi
        |""".stripMargin
    val c = ConfigLoader.parse(yaml, env = Map.empty, migrateTo = Some("v1.1"))
    c.version shouldBe "v1.1"
    c.name shouldBe "taxi"
  }
}
