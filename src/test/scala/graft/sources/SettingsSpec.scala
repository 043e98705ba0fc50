package graft.sources

import graft.SparkTestBase

import java.nio.file.Files

class SettingsSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-settings").toString + "/settings.json"

  test("missing file: defaults are written and returned (ref :92-93)") {
    val path = tmp()
    val defaults = Map("autocad_location" -> "/opt/engine")
    assert(Settings.loadOrDefault(spark, path, defaults) == defaults)
    assert(Files.exists(java.nio.file.Paths.get(path)))
    // second load reads the persisted file, not the defaults arg
    assert(Settings.loadOrDefault(spark, path, Map.empty) == defaults)
  }

  test("save/load roundtrip incl. escaping") {
    val path = tmp()
    val s = Map("a" -> """quote " and \ backslash""", "b" -> "2")
    Settings.save(path, s)
    assert(Settings.loadOrDefault(spark, path, Map.empty) == s)
  }

  test("saveValidated rejects without writing (ref :490-497)") {
    val path = tmp()
    val ok = Settings.saveValidated(path, Map("k" -> "v"), _ => false)
    assert(!ok && !Files.exists(java.nio.file.Paths.get(path)))
    assert(Settings.saveValidated(path, Map("k" -> "v"), _.contains("k")))
    assert(Settings.loadOrDefault(spark, path, Map.empty) == Map("k" -> "v"))
  }
}
