package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.OracleGen
import graft.util.Tables

/** Guards the golden-oracle gate itself: every query OracleGen freezes must
  * have its /oracle/<name>.sql resource on the classpath, and every golden
  * on the classpath must be generator-owned. A lost or typo'd resource
  * would otherwise silently downgrade that query to rows-only grading
  * (Tables.literalOracle degrades to None with only a stderr warning).
  */
class OracleGenSpec extends AnyFunSuite {

  test("every OracleGen target has its golden resource (targets ⊆ resources)") {
    val missing = OracleGen.targets.filter { name =>
      getClass.getResource(s"/oracle/$name.sql") == null
    }
    assert(missing.isEmpty,
      s"golden oracle resources missing for: ${missing.mkString(", ")} — " +
        "regenerate with `sbt \"runMain graft.tools.OracleGen /root/testdata/sf0.01\"`")
  }

  test("every golden-graded QueryDef resolves a non-empty literal oracle") {
    OracleGen.targets.foreach { name =>
      val o = Tables.literalOracle(name)
      assert(o.exists(_.contains("VALUES")),
        s"$name: literalOracle returned ${o.map(_.take(40))} — expected a VALUES golden")
    }
  }

  test("checked-in goldens are exactly the OracleGen target set") {
    val dir = new java.io.File("src/main/resources/oracle")
    assume(dir.isDirectory, "source tree not available (packaged run)")
    val onDisk = dir.listFiles().map(_.getName).filter(_.endsWith(".sql"))
      .map(_.stripSuffix(".sql")).toSet
    assert(onDisk == OracleGen.targets.toSet,
      s"goldens on disk and OracleGen.targets diverge: " +
        s"only-on-disk=${(onDisk -- OracleGen.targets).mkString(",")} " +
        s"only-in-targets=${(OracleGen.targets.toSet -- onDisk).mkString(",")}")
  }
}
