package graft.cli

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, TestWarehouse}
import graft.sources.EscoWarehouse

/** CLI smoke: every analyze subcommand (including the round-2 additions
  * and the anchored variants) runs end-to-end against a saved mini
  * warehouse without throwing. Output goes to stdout; the library-level
  * values are pinned in CatalogGapsSpec/EscoWarehouseSpec — this guards
  * the wiring. */
class EscoCliSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val whDir: String = {
    val dir = Files.createTempDirectory("graft-cli-wh").toString
    EscoWarehouse.save(TestWarehouse.build(spark), dir)
    dir
  }

  private val analyses = Seq(
    "node-counts", "rel-counts", "top-essential-skills",
    "top-optional-skills", "top-occupations", "isco-most-occupations",
    "skill-cooccurrence", "skill-depths",
    "top-skills-by-relationships", "top-occupations-optional",
    "transferable-skills", "skill-groups-most-skills")

  analyses.foreach { name =>
    test(s"analyze $name runs") {
      EscoCli.run(spark, List("analyze", whDir, name))
    }
  }

  test("analyze related-occupations (direct and --bridge) runs") {
    EscoCli.run(spark,
      List("analyze", whDir, "related-occupations", "data engineer"))
    EscoCli.run(spark,
      List("analyze", whDir, "related-occupations", "data engineer", "--bridge"))
  }

  test("analyze skill-profile runs") {
    EscoCli.run(spark, List("analyze", whDir, "skill-profile", "manage data"))
  }

  test("search --json and --profile-search run against the saved warehouse") {
    EscoCli.run(spark, List("search", whDir, "data", "--type", "skill",
      "--threshold", "-1.0", "--limit", "3", "--json"))
    EscoCli.run(spark, List("search", whDir, "data", "--type", "skill",
      "--threshold", "-1.0", "--profile-search"))
  }
}
