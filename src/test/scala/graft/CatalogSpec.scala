package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.sources.Catalog

class CatalogSpec extends SparkSpec {
  private def freshCatalog(): (Catalog, java.nio.file.Path) = {
    val root = Files.createTempDirectory("graft_catalog_")
    (new Catalog(spark, root.toString), root)
  }

  test("PUT/GET roundtrip preserves content") {
    val (cat, _) = freshCatalog()
    val local    = Files.createTempFile("graft_in_", ".txt")
    Files.writeString(local, "alpha beta\ngamma\n")
    cat.put("data1", local.toString)

    val out = Files.createTempDirectory("graft_out_").resolve("got.txt")
    cat.get("data1", out.toString)
    assert(Files.readString(out) == "alpha beta\ngamma\n")
    assert(cat.readText("data1").collect().toSet == Set("alpha beta", "gamma"))
  }

  test("putText + readPrefix implements the maple source-scan contract") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putText("wc_in_a", Seq("one two", "three").toDS())
    cat.putText("wc_in_b", Seq("four").toDS())
    cat.putText("other", Seq("nope").toDS())
    assert(cat.readPrefix("wc_in").collect().toSet == Set("one two", "three", "four"))
  }

  test("STORE lists names; DELETE removes everywhere; LS locates") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putText("f1", Seq("x").toDS())
    cat.putText("f2", Seq("y").toDS())
    assert(cat.store() == Seq("f1", "f2"))
    assert(cat.ls("f1").nonEmpty)
    assert(cat.ls("missing").isEmpty)
    assert(cat.delete("f1"))
    assert(cat.store() == Seq("f2"))
    assert(!cat.exists("f1"))
  }

  test("structured formats round-trip: parquet, orc, csv, json") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
    Seq("parquet", "orc", "csv", "json").foreach { fmt =>
      cat.putTable(s"tbl_$fmt", df, fmt)
      val back = cat.readTable(s"tbl_$fmt", fmt)
      val rows = back
        .select(col("id").cast("long"), col("name"), col("score").cast("double"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(rows == Set((1L, "a", 1.5), (2L, "b", 2.5)), s"format $fmt")
    }
    intercept[IllegalArgumentException](cat.putTable("x", df, "avro"))
  }

  test("racing PUTs within the conflict window: reject, force, expire") {
    import graft.sources.{Catalog, PutConflictException}
    val root = Files.createTempDirectory("graft_catalog_conflict_")
    val cat  = new Catalog(spark, root.toString, putConflictWindowMs = 400L)
    val v1   = Files.createTempFile("graft_v1_", ".txt")
    val v2   = Files.createTempFile("graft_v2_", ".txt")
    Files.writeString(v1, "v1\n")
    Files.writeString(v2, "v2\n")

    cat.put("race", v1.toString)
    // second writer inside the window: rejected, first write preserved
    val c = intercept[PutConflictException](cat.put("race", v2.toString))
    assert(c.name == "race" && c.windowMs == 400L)
    assert(cat.readText("race").collect().toSeq == Seq("v1"))
    // force = the interactive "Y" (reference src/master.go:121-178)
    cat.put("race", v2.toString, force = true)
    assert(cat.readText("race").collect().toSeq == Seq("v2"))
    // outside the window: plain subsequent-PUT overwrite, no confirm needed
    Thread.sleep(450L)
    cat.put("race", v1.toString)
    assert(cat.readText("race").collect().toSeq == Seq("v1"))
  }

  test("PUT overwrites (reference subsequent-PUT semantics)") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putText("f", Seq("v1").toDS())
    cat.putText("f", Seq("v2").toDS())
    assert(cat.readText("f").collect().toSeq == Seq("v2"))
  }
}
