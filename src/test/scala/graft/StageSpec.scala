package graft

import graft.sources.Stage
import org.scalatest.funsuite.AnyFunSuite

/** The object-store staging edge (S5): scheme-agnostic URI handling with a
  * real round-trip on file:// (the store this container has) and dispatch
  * checks for bucket-style schemes (whose connectors ship on a cluster
  * classpath, not here).
  */
class StageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("put/get round-trip through an explicit file:// URI") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    val df = Tables.part(spark, TestSpark.Sf0001)
    val target = Stage.put(df, s"file://$dir/part_stage")
    assert(target.startsWith("file:"))
    val back = Stage.get(spark, s"file://$dir/part_stage",
      schema = Some(Tables.partSchema))
    assert(back.count() == df.count())
    assert(back.schema == df.schema)
  }

  test("Tables readers accept explicit file:// URIs (scheme-agnostic sources)") {
    // the pinned-schema readers go through the Hadoop FileSystem registry,
    // so a fully-qualified URI directory is the same call as a bare path —
    // swap in gs://bucket/sf with the connector on the classpath
    val viaUri = Tables.documents(spark, s"file://${TestSpark.Sf0001}")
    val bare = Tables.documents(spark, TestSpark.Sf0001)
    assert(viaUri.count() == bare.count())
    assert(viaUri.schema == bare.schema)
  }

  test("bare paths resolve against the default filesystem with a scheme") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage-bare").toString
    val resolved = Stage.resolve(spark, s"$dir/x")
    assert(java.net.URI.create(resolved).getScheme != null,
      s"expected fully-qualified URI, got $resolved")
    assert(Stage.scheme(spark, s"$dir/x") == "file")
  }

  test("bucket-style URIs keep their scheme for FileSystem dispatch") {
    // no gs:// connector offline — assert the URI layer would dispatch on
    // the scheme rather than mangling the path (Path preserves authority)
    val p = new org.apache.hadoop.fs.Path("gs://some-bucket/layer/table")
    assert(p.toUri.getScheme == "gs")
    assert(p.toUri.getAuthority == "some-bucket")
    assert(p.toUri.getPath == "/layer/table")
    // and the CSV face of staging matches the bronze edge options
    val dir = java.nio.file.Files.createTempDirectory("graft-stage-csv").toString
    Stage.put(Tables.nation(spark, TestSpark.Sf0001), s"$dir/nation_csv",
      format = "csv", options = Map("header" -> "true", "sep" -> ";"))
    val back = Stage.get(spark, s"$dir/nation_csv", format = "csv",
      options = Map("header" -> "true", "sep" -> ";", "inferSchema" -> "true"))
    assert(back.count() == Tables.nation(spark, TestSpark.Sf0001).count())
  }
}
