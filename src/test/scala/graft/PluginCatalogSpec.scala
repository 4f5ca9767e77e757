package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PluginCatalog, Registry}

/** The plugin catalogue cannot rot: its entry set must equal the
  * registry's key set, every example must construct through the real
  * factory, and the committed PLUGINS.md must equal a regeneration.
  */
class PluginCatalogSpec extends AnyFunSuite {

  test("catalogue covers exactly the registry's plugins") {
    val catalogued = PluginCatalog.entries.map(_.plugin).toSet
    val registered = Registry.factories.keySet
    assert(catalogued == registered,
      s"missing from catalogue: ${(registered -- catalogued).toSeq.sorted}; " +
        s"stale in catalogue: ${(catalogued -- registered).toSeq.sorted}")
    assert(PluginCatalog.entries.map(_.plugin).distinct.size ==
      PluginCatalog.entries.size, "duplicate catalogue entries")
  }

  test("every example constructs through Registry.create") {
    PluginCatalog.entries.foreach { e =>
      try Registry.create(e.plugin, e.example)
      catch {
        case ex: Exception =>
          fail(s"${e.plugin}: example ${e.example} failed to construct: $ex")
      }
    }
  }

  test("every entry has a one-line summary and documented settings") {
    PluginCatalog.entries.foreach { e =>
      assert(e.summary.nonEmpty && !e.summary.contains('\n'), e.plugin)
      assert(e.settings.map(_.name).distinct.size == e.settings.size,
        s"${e.plugin}: duplicate setting rows")
    }
  }

  test("committed PLUGINS.md matches a regeneration") {
    val committed = java.nio.file.Files.readString(
      java.nio.file.Paths.get("PLUGINS.md"))
    assert(committed == PluginCatalog.renderMarkdown(),
      "PLUGINS.md is stale — run `sbt \"runMain graft.ops.PluginCatalog\"`")
  }
}
