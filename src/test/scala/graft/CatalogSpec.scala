package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.{col, max}

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

  test("a reader looping readText during repeated putText never sees a missing dataset") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putText("hot", Seq("v0").toDS())

    val stop       = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writerDone = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val writer = new Thread(() => {
      try (1 to 12).foreach(i => cat.putText("hot", Seq(s"v$i").toDS()))
      catch { case t: Throwable => writerDone.set(t) }
      finally stop.set(true)
    })
    writer.start()

    // The reader must always observe SOME complete version (old or new) —
    // never a missing path (the pre-fix delete-then-rename window) and never
    // a partial write (tmp dirs are staged under a separate name).
    var reads = 0
    val seen  = scala.collection.mutable.Set[String]()
    while (!stop.get() || reads == 0) {
      val got = cat.readText("hot").collect().toSeq
      assert(got.size == 1 && got.head.startsWith("v"), s"partial/garbled read: $got")
      seen += got.head
      reads += 1
    }
    writer.join()
    assert(writerDone.get() == null, s"writer failed: ${writerDone.get()}")
    assert(cat.readText("hot").collect().toSeq == Seq("v12"))
    assert(reads > 0 && seen.nonEmpty)
  }

  test("store() collapses version dirs; writer retains exactly the previous version; delete() removes all") {
    import spark.implicits._
    val (cat, root) = freshCatalog()
    def versionDirs(): Seq[String] =
      java.nio.file.Files
        .list(root)
        .toArray
        .map(_.toString.split('/').last)
        .filter(n => Catalog.VersionRe.matches(n))
        .toSeq
        .sorted

    cat.putText("d", Seq("v1").toDS())
    cat.putText("d", Seq("v2").toDS())
    cat.putText("d", Seq("v3").toDS())
    // the immediately-previous version is retained for in-flight readers,
    // older ones are garbage-collected
    assert(versionDirs() == Seq("d.__v2__", "d.__v3__"))
    // ... but the namespace listing shows only the logical name
    assert(cat.store() == Seq("d"))
    assert(cat.readText("d").collect().toSeq == Seq("v3"))
    assert(cat.delete("d"))
    assert(versionDirs().isEmpty)
    assert(cat.store().isEmpty)
    assert(!cat.exists("d"))
  }

  test("versions + readTableVersion: shallow time travel over the retained window") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("t", Seq((1L, "v1")).toDF("k", "v"))
    cat.putTable("t", Seq((1L, "v2")).toDF("k", "v"))
    cat.putTable("t", Seq((1L, "v3")).toDF("k", "v"))
    // GC retains current + previous
    assert(cat.versions("t") == Seq(3L, 2L))
    assert(cat.readTableVersion("t", 2L).collect().head.getString(1) == "v2")
    assert(cat.readTableVersion("t", 3L).collect().head.getString(1) == "v3")
    assert(cat.readTable("t").collect().head.getString(1) == "v3", "unpinned read = newest")
    intercept[IllegalArgumentException](cat.readTableVersion("t", 1L)) // GC'd
  }

  test("compact: many small part files collapse to one, data and readers unharmed") {
    import spark.implicits._
    val (cat, root) = freshCatalog()
    // write with forced high parallelism → many tiny part files
    cat.putTable("t", (1L to 1000L).toDF("x").repartition(32))
    def partFiles(version: String): Int =
      java.nio.file.Files
        .list(root.resolve(version))
        .toArray
        .map(_.toString.split('/').last)
        .count(_.startsWith("part-"))
    assert(partFiles("t.__v1__") > 8, "precondition: fragmented input")
    val before = cat.readTable("t").as[Long].collect().sorted

    val n = cat.compact("t", targetBytes = 1L << 30) // everything fits one file
    assert(n == 1)
    // compaction published a NEW version; previous retained for in-flight readers
    assert(java.nio.file.Files.exists(root.resolve("t.__v2__")))
    assert(partFiles("t.__v2__") == 1)
    val after = cat.readTable("t").as[Long].collect().sorted
    assert(after.sameElements(before), "compaction must not change the data")
  }

  test("analyzeTable: exact one-pass stats, versioned alongside the data, non-atomic columns skipped") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    val df = Seq(
      (1L, "a", Some(10.5), Seq(1, 2)),
      (2L, "b", None, Seq(3)),
      (3L, "a", Some(-2.0), Seq.empty[Int])
    ).toDF("id", "tag", "score", "arr")
    cat.putTable("t", df)
    val stats = cat.analyzeTable("t")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getString(3), r.getString(4), r.getLong(5), r.getLong(6))))
      .toMap
    // array column carries no pruning stats; atomic columns all present
    assert(stats.keySet == Set("id", "tag", "score"))
    assert(stats("id") == ((3L, "1", "3", 3L, 0L)))
    assert(stats("tag") == ((3L, "a", "b", 2L, 0L)))
    assert(stats("score")._4 == 2L && stats("score")._5 == 1L) // ndv ignores null, 1 null
    assert(stats("score")._2 == "-2.0" && stats("score")._3 == "10.5")
    // stats are a published catalog table themselves (versioned, readable)
    assert(cat.exists("t.__stats__"))
    assert(cat.readTable("t.__stats__").count() == 3)
  }

  test("analyzeTable frequencyColumns publishes max_freq; skewFactorFor reads it back") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_cat_freq_").toString
    val cat  = new graft.sources.Catalog(spark, root)
    // key 0 is hot (6 of 10 rows), keys 1..4 carry one row each -> 5 keys,
    // max_freq 6, skew factor 6*5/10 = 3.0
    val rows = (Seq.fill(6)(0L) ++ (1L to 4L)).map(k => (k, k * 10)).toDF("k", "v")
    cat.putTable("freq_t", rows)
    cat.analyzeTable("freq_t", frequencyColumns = Seq("k"))
    val st = cat.statsFor("freq_t").get
    assert(st.columns.find(_.column == "k").get.maxFreq.contains(6L))
    assert(st.columns.find(_.column == "v").get.maxFreq.isEmpty, "unlisted column must not carry a stat")
    assert(cat.skewFactorFor("freq_t", "k").contains(3.0))
    assert(cat.skewFactorFor("freq_t", "v").isEmpty)
    // ANALYZE without the pass: nothing published, reader says None
    cat.putTable("nofreq_t", rows)
    cat.analyzeTable("nofreq_t")
    assert(cat.skewFactorFor("nofreq_t", "k").isEmpty)
  }

  test("readTableWhere: stale stats (re-PUT without re-ANALYZE) must not prune the newer version") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("ev", Seq((1L, 10L), (2L, 20L)).toDF("id", "x"))
    val stats = cat.analyzeTable("ev")
    assert(stats.columns.contains("analyzed_version"))
    assert(cat.statsFor("ev").get.analyzedVersion.contains(cat.versions("ev").max))
    // analyzed version: max x = 20 -> "> 100" provably empty, prune fires
    assert(cat.readTableWhere("ev", "x", ">", "100").count() == 0)
    // re-PUT a version whose rows the stale stats would wrongly prune
    cat.putTable("ev", Seq((3L, 500L)).toDF("id", "x"))
    assert(cat.readTableWhere("ev", "x", ">", "100").count() == 1,
      "stale stats silently pruned rows of the newer data version")
    // re-ANALYZE restores the short-circuit, now against the new version
    cat.analyzeTable("ev")
    assert(cat.readTableWhere("ev", "x", ">", "1000").count() == 0)
    assert(cat.readTableWhere("ev", "x", ">", "100").count() == 1)
  }

  test("compact preserves the prune contract: table stats re-stamped, zone maps rebuilt") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("cz", (1L to 400L).map(i => (i, i % 5)).toDF("id", "v")
      .repartitionByRange(4, col("id")))
    cat.analyzeTable("cz", fileStats = true)
    assert(cat.readTableWhere("cz", "id", ">", "400").count() == 0) // tier-1 prune fires
    assert(cat.readTableWhere("cz", "id", "<", "5").inputFiles.length == 1) // tier-2 fires
    cat.compact("cz") // rewrites the 4 small files into 1; data unchanged
    // compaction changed only FILES: table stats were re-stamped, so the
    // whole-table prune still fires with no re-ANALYZE
    val pruned = cat.readTableWhere("cz", "id", ">", "400")
    assert(pruned.inputFiles.isEmpty && pruned.count() == 0,
      "re-stamped table stats must keep pruning after compact")
    // zone maps were REBUILT over the compacted file set
    val zs = cat.fileStatsFor("cz").get
    assert(zs.analyzedVersion.contains(cat.versions("cz").max))
    assert(zs.columns.map(_.file).distinct.size == 1, "zone maps must describe the new files")
    assert(cat.readTableWhere("cz", "id", "<", "5").count() == 4)
  }

  test("zone-overlap audit -> compactZOrdered: the layout loop closes, measured") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    val grid = (0L until 4096L).map(i => (i, i % 64, i / 64)).toDF("id", "x", "y")
    cat.putTable("g", grid.repartition(8)) // round-robin: every file spans both full ranges
    cat.analyzeTable("g", fileStats = true)
    val before = cat.zoneOverlapAudit("g", Seq("x", "y"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(before("x") == 1.0 && before("y") == 1.0,
      s"round-robin zones must fully overlap: $before")
    val filesBefore = cat.readTableWhere("g", "x", "<", "8").inputFiles.length
    assert(filesBefore == 8)
    // the ACTION: re-cluster, re-publish, re-analyze — returns the new audit
    val after = cat.compactZOrdered("g", "x", "y", files = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(after("x") < before("x") && after("y") < before("y"), after.toString)
    val filesAfter = cat.readTableWhere("g", "x", "<", "8").inputFiles.length
    assert(filesAfter < filesBefore, s"re-clustered prune should touch fewer files: $filesAfter")
    assert(cat.readTable("g").count() == 4096, "re-clustering must not change the data")
    // stale zone maps refuse to advise (a re-PUT without re-ANALYZE)
    cat.putTable("g", grid.limit(10))
    val e = intercept[Exception](cat.zoneOverlapAudit("g", Seq("x")))
    assert(e.getMessage.contains("stale zone maps"), e.getMessage)
  }

  test("readTableWhere: non-finite double stats (NaN) degrade to a filtered scan, never throw") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("nanny", Seq((1L, 1.5), (2L, Double.NaN), (3L, 9.0)).toDF("id", "v"))
    cat.analyzeTable("nanny") // max renders "NaN": the prune comparison cannot parse it
    // ">" consults the unparseable max -> degrade to the scan (Spark orders
    // NaN above every double, so NaN and 9.0 both pass the pushed filter)
    assert(cat.readTableWhere("nanny", "v", ">", "5").count() == 2)
    // "<" consults only the parseable min (1.5 >= 0): prune still fires
    assert(cat.readTableWhere("nanny", "v", "<", "0").count() == 0)
  }

  test("hive-partitioned tables support the full mutation lifecycle: append, delete, compact") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    val df = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L)).toDF("id", "part", "v")
    cat.putPartitionedTable("pt", df, "part")
    assert(cat.readTable("pt").count() == 3)

    // APPEND: the delta generation keeps the hive layout (partition values
    // live in ITS directory names too), old rows survive, and the column
    // order difference (discovery moves 'part' to the schema tail) is
    // aligned by name, not rejected by position
    cat.appendTable("pt", Seq((4L, "c", 40L), (5L, "a", 50L)).toDF("id", "part", "v"))
    val afterAppend = cat.readTable("pt")
    assert(afterAppend.count() == 5, "append truncated the partitioned table")
    val partsByRow = afterAppend.select(col("id"), col("part")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(
      partsByRow == Map(1L -> "a", 2L -> "b", 3L -> "a", 4L -> "c", 5L -> "a"),
      s"partition values lost or nulled: $partsByRow")

    // DELETE: survivors of rewritten files keep their partition values
    val rep = cat.deleteWhere("pt", "v", ">", "35")
    assert(rep.head().getAs[Long]("n_rows_deleted") == 2L)
    val afterDelete = cat.readTable("pt")
    assert(afterDelete.count() == 3)
    assert(
      afterDelete.select(col("part")).distinct().collect().map(_.getString(0)).toSet == Set("a", "b"),
      "delete rewrite dropped partition values")

    // COMPACT: small files pack WITHIN the layout; rows and partition
    // values unharmed, file count shrinks
    cat.appendTable("pt", Seq((6L, "b", 60L)).toDF("id", "part", "v"))
    val before = cat.readTable("pt").inputFiles.length
    cat.compactSmallFiles("pt", smallBytes = 64L << 20, targetBytes = 64L << 20)
    val packed = cat.readTable("pt")
    assert(packed.count() == 4)
    assert(packed.inputFiles.length < before, "compaction wrote no fewer files")
    val sums = packed.groupBy(col("part")).agg(org.apache.spark.sql.functions.sum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums == Map("a" -> 40L, "b" -> 80L), s"compaction corrupted partitioned rows: $sums")

    // and the sample/stats tiers compose on the partitioned manifest
    cat.analyzeTable("pt", fileStats = true)
    assert(cat.readTableWhereAll("pt", Seq(("part", "=", "b"))).count() == 2)

    // VACUUM reclaims the rewritten-away partitioned blobs: the delete's
    // candidate files and the pre-compaction shards sit in hive subdirs of
    // their generations — a one-level walk leaked them forever
    val reclaimed = cat.vacuum("pt")
    assert(reclaimed > 0L, "vacuum reclaimed nothing from superseded partitioned generations")
    val after = cat.readTable("pt")
    assert(after.count() == 4, "vacuum touched referenced partitioned files")
    assert(
      after.groupBy(col("part")).agg(org.apache.spark.sql.functions.sum(col("v")).as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == Map("a" -> 40L, "b" -> 80L))
  }

  test("file-granular prune on a hive-partitioned table keeps the partition column's values") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    // two partitions, disjoint value ranges so the zone prune has real work
    val df = ((1 to 50).map(i => (i.toLong, "lo", i.toLong)) ++
      (1 to 50).map(i => (100L + i, "hi", 1000L + i))).toDF("id", "part", "v")
    cat.putPartitionedTable("ptp", df, "part")
    cat.analyzeTable("ptp", fileStats = true)
    // predicate only the 'hi' files can match: the pruned path-list read
    // must re-derive part from the directory names, not NULL it out
    val got = cat.readTableWhereAll("ptp", Seq(("v", ">", "1000")))
    assert(got.count() === 50L)
    val parts = got.select(col("part")).distinct().collect().map(_.getString(0)).toSet
    assert(parts === Set("hi"), s"partition column lost by the pruned read: $parts")
    // and a conjunct ON the partition column itself prunes + stays correct
    val onPart = cat.readTableWhereAll("ptp", Seq(("part", "=", "lo")))
    assert(onPart.count() === 50L)
    assert(onPart.agg(max(col("v"))).head().getLong(0) === 50L)
  }

  test("appendTableEvolve: new columns NULL-backfill old files, refusals for drop/retype, partitioned bases keep layout") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("ev", Seq((1L, "x"), (2L, "y")).toDF("id", "s"))
    cat.appendTableEvolve("ev", Seq((3L, "z", 30.5)).toDF("id", "s", "score"))
    val t = cat.readTable("ev")
    assert(t.schema.fieldNames.toSeq == Seq("id", "s", "score"))
    val byId = t.collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(byId == Map(1L -> None, 2L -> None, 3L -> Some(30.5)),
      s"old files must serve NULL for the evolved column: $byId")
    // drop and retype are rewrites, not appends — refuse loudly
    val drop = intercept[IllegalArgumentException](
      cat.appendTableEvolve("ev", Seq((4L, 1.0)).toDF("id", "score")))
    assert(drop.getMessage.contains("DROP"), drop.getMessage)
    val retype = intercept[IllegalArgumentException](
      cat.appendTableEvolve("ev", Seq((4L, 5, 1.0)).toDF("id", "s", "score")))
    assert(retype.getMessage.contains("RETYPE"), retype.getMessage)
    // evolved tables keep evolving: deleteWhere rewrites carry the wide schema
    cat.deleteWhere("ev", "id", "=", "2")
    assert(cat.readTable("ev").count() == 2)

    // partitioned base: layout preserved, partition values + NULL backfill coexist
    cat.putPartitionedTable("evp", Seq((1L, "a"), (2L, "b")).toDF("id", "part"), "part")
    cat.appendTableEvolve("evp", Seq((3L, "a", 7L)).toDF("id", "part", "extra"))
    val p = cat.readTable("evp").collect()
      .map(r => r.getLong(0) -> ((r.getAs[String]("part"), Option(r.getAs[Any]("extra"))))).toMap
    assert(p == Map(1L -> (("a", None)), 2L -> (("b", None)), 3L -> (("a", Some(7L)))), p.toString)
  }

  test("time travel across schema evolution: each version reads with ITS OWN schema") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("tt", Seq((1L, "x")).toDF("id", "s"))
    cat.appendTable("tt", Seq((2L, "y")).toDF("id", "s")) // v2: manifest, narrow schema
    cat.appendTableEvolve("tt", Seq((3L, "z", 9.5)).toDF("id", "s", "score")) // v3: wide
    val vs = cat.versions("tt")
    assert(vs.size >= 2)
    // the retained pre-evolution version still reads NARROW — evolution is
    // a property of the version's manifest, not a global mutation
    val before = cat.readTableVersion("tt", vs(1))
    assert(before.schema.fieldNames.toSeq == Seq("id", "s"), before.schema.fieldNames.mkString(","))
    assert(before.count() == 2)
    val after = cat.readTableVersion("tt", vs.head)
    assert(after.schema.fieldNames.toSeq == Seq("id", "s", "score"))
    assert(after.count() == 3)
  }

  test("delete removes derived side tables: a re-put name never meets its previous life's stamps") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    // first life: 3 rows, stats + sample published at its version
    cat.putTable("reborn", Seq((1L, 5.0), (2L, 6.0), (3L, 7.0)).toDF("id", "v"))
    cat.analyzeTable("reborn")
    cat.analyzeSample("reborn", "id")
    assert(cat.exists("reborn.__stats__") && cat.exists("reborn.__sample__"))
    // delete: the base AND every __-derived side table must go — a
    // surviving stamp from the old life is stale by definition (and the
    // monotonic commit counter is belt-and-braces, not a license to keep
    // old stamps around)
    assert(cat.delete("reborn"))
    assert(!cat.exists("reborn.__stats__"), "stats survived delete")
    assert(!cat.exists("reborn.__sample__"), "sample survived delete")
    assert(!cat.exists("reborn.__samplemeta__"), "sample meta survived delete")
    assert(cat.lsPrefix("reborn").isEmpty, s"leftovers: ${cat.lsPrefix("reborn")}")
    // second life: completely different data — nothing stale to consult
    cat.putTable("reborn", Seq((10L, 50.0)).toDF("id", "v"))
    // prune path must not use the old table's min/max (old max 7 < 40
    // would prove-empty a predicate the new data matches)
    assert(cat.readTableWhere("reborn", "v", ">", "40").count() == 1)
  }

  test("version numbers are monotonic across DELETE + re-PUT; pre-delete ids refuse loudly") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("phoenix", Seq((1L, "first-life")).toDF("id", "s"))
    cat.putTable("phoenix", Seq((2L, "first-life-v2")).toDF("id", "s"))
    val lifeOne = cat.versions("phoenix")
    assert(lifeOne.nonEmpty)
    val maxBefore = lifeOne.max
    assert(cat.delete("phoenix"))
    // rebirth: the commit high-water mark survives the delete, so the new
    // life's version ids continue strictly ABOVE the old life's — a
    // readTableVersion(pre-delete id) can never silently resolve to the
    // re-put table's data
    cat.putTable("phoenix", Seq((3L, "second-life")).toDF("id", "s"))
    val lifeTwo = cat.versions("phoenix")
    assert(lifeTwo.forall(_ > maxBefore),
      s"re-put version ids ${lifeTwo.mkString(",")} must exceed pre-delete max $maxBefore")
    // every pre-delete id is gone, and asking for one refuses loudly
    lifeOne.foreach { v =>
      val e = intercept[IllegalArgumentException](cat.readTableVersion("phoenix", v))
      assert(e.getMessage.contains("not retained"), e.getMessage)
    }
    assert(cat.readTableVersion("phoenix", lifeTwo.head).collect().map(_.getString(1)).toSeq
      == Seq("second-life"))
    // bookkeeping dirs never leak into the namespace listing
    assert(!cat.store().exists(Set("__hwm__", "__locks__")), cat.store().mkString(","))
  }

  test("cross-JVM writer fence: a held publish lease refuses loudly; an expired one is taken over") {
    import spark.implicits._
    import graft.sources.ConcurrentWriteException
    val root = Files.createTempDirectory("graft_catalog_lease_")
    val cat  = new Catalog(spark, root.toString, writerLeaseMs = 60000L)
    cat.putTable("fenced", Seq((1L, "a")).toDF("id", "s"))
    // simulate another JVM mid-publish: its lease file exists and is fresh
    val lock = root.resolve("__locks__/fenced.lock")
    Files.createDirectories(lock.getParent)
    Files.writeString(lock, "99999\n")
    val e = intercept[ConcurrentWriteException](
      cat.putTable("fenced", Seq((2L, "b")).toDF("id", "s")))
    assert(e.getMessage.contains("publish lease"), e.getMessage)
    // the refused write published nothing: first version still serves
    assert(cat.readTable("fenced").collect().map(_.getString(1)).toSeq == Seq("a"))
    // crashed writer: age the lease past expiry — the next writer takes over
    Files.setLastModifiedTime(
      lock, java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000L))
    cat.putTable("fenced", Seq((3L, "c")).toDF("id", "s"))
    assert(cat.readTable("fenced").collect().map(_.getString(1)).toSeq == Seq("c"))
    assert(!Files.exists(lock), "lease must be released after a successful publish")
    // a second catalog INSTANCE on the same root shares the fence
    val cat2 = new Catalog(spark, root.toString, writerLeaseMs = 60000L)
    Files.writeString(lock, "99999\n")
    intercept[ConcurrentWriteException](cat2.putTable("fenced", Seq((4L, "d")).toDF("id", "s")))
    Files.delete(lock)
  }

  test("GC protection follows hive files to their OWNING version dir: a twice-appended partitioned base survives") {
    import spark.implicits._
    // putPartitionedTable v1, appendTable v2, appendTable v3: at v3's
    // publish, v1 leaves the version-age window and ONLY its manifest
    // references keep it alive. Protection used to map each referenced
    // file to its immediate parent — a hive file's parent is the leaf
    // `part=x` dir, which never matches the version dir the GC deletes,
    // so the partitioned base vanished and the table silently truncated
    // to its deltas (flat tables survived only because parent == vdir).
    val (cat, _) = freshCatalog()
    val df = (1 to 90).map(i => (i.toLong, s"s$i", s"p${i % 3}")).toDF("id", "s", "part")
    cat.putPartitionedTable("pbase", df.filter(col("id") <= 30), "part")
    cat.appendTable("pbase", df.filter(col("id") > 30 && col("id") <= 60))
    cat.appendTable("pbase", df.filter(col("id") > 60))
    val back = cat.readTable("pbase")
    assert(back.count() === 90L, "the partitioned base was GC'd while still referenced")
    assert(back.filter(col("part").isNull).count() === 0L)
    assert(back.agg(org.apache.spark.sql.functions.sum(col("id"))).head().getLong(0) === (1 to 90).sum.toLong)
  }

  test("restoreTable: O(metadata) rollback of a bad delete; the changefeed reports the undo") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("rb", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    cat.appendTable("rb", Seq((4L, "d")).toDF("id", "s"))
    val good = cat.versions("rb").max
    cat.deleteWhere("rb", "id", "<=", "2") // the mistake
    val bad = cat.versions("rb").max
    assert(cat.readTable("rb").count() === 2L)
    cat.restoreTable("rb", good)
    val restored = cat.readTable("rb").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(restored == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // history preserved, not rewritten: the restore is a NEW commit and
    // the feed across it shows exactly the undone rows flowing back
    val vNow = cat.versions("rb").max
    assert(vNow > bad)
    val feed = cat.tableChanges("rb", bad, vNow).collect()
    assert(feed.map(r => (r.getLong(0), r.getString(2))).toSet
      == Set((1L, "insert"), (2L, "insert")), feed.mkString(";"))
    // refusals: restoring to the current version or to dropped history
    intercept[IllegalArgumentException](cat.restoreTable("rb", vNow))
    intercept[IllegalArgumentException](cat.restoreTable("rb", 999L))
  }

  test("retainVersions deepens the time-travel window; changesSince runs the CDC cursor loop") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_catalog_retain_")
    val cat  = new Catalog(spark, root.toString, retainVersions = 4)
    cat.putTable("deep", Seq((1L, "a")).toDF("id", "s"))
    val (c0, f0) = cat.changesSince("deep", cat.versions("deep").max)
    assert(f0.count() === 0L && f0.columns.contains("_change_type"), "fresh cursor must see an empty feed")
    var cursor = c0
    cat.appendTable("deep", Seq((2L, "b")).toDF("id", "s"))
    cat.appendTable("deep", Seq((3L, "c")).toDF("id", "s"))
    // one poll after two commits: both appends arrive in one feed
    val (c1, f1) = cat.changesSince("deep", cursor)
    assert(f1.collect().map(r => (r.getLong(0), r.getString(2))).toSet
      == Set((2L, "insert"), (3L, "insert")))
    cursor = c1
    cat.deleteWhere("deep", "id", "<=", "1")
    val (c2, f2) = cat.changesSince("deep", cursor)
    assert(f2.collect().map(r => (r.getLong(0), r.getString(2))).toSet == Set((1L, "delete")))
    cursor = c2
    // horizon 4: every version of this history is still readable (the
    // base stays beyond the horizon because retained manifests reference
    // its files — integrity protection composes with the knob)
    assert(cat.versions("deep").size === 4, cat.versions("deep").mkString(","))
    assert(cat.readTableVersion("deep", cat.versions("deep").min).count() === 1L)
    // an ahead-of-current cursor is a consumer bug — loud
    intercept[IllegalArgumentException](cat.changesSince("deep", cursor + 100))
    // a degenerate horizon is refused at construction
    intercept[IllegalArgumentException](new Catalog(spark, root.toString, retainVersions = 1))

    // the DROP path needs unreferenced versions: full overwrites (each
    // put materializes its own dir; nothing references the old ones)
    val cat2 = new Catalog(spark, root.toString, retainVersions = 3)
    (1 to 3).foreach(i => cat2.putTable("ow", Seq((i.toLong, s"v$i")).toDF("id", "s")))
    assert(cat2.versions("ow").size === 3)
    val oldest = cat2.versions("ow").min
    // overwrite span feed: the replaced row out, the new row in
    val (_, fow) = cat2.changesSince("ow", cat2.versions("ow").max - 1)
    assert(fow.collect().map(r => (r.getLong(0), r.getString(2))).toSet
      == Set((2L, "delete"), (3L, "insert")))
    cat2.putTable("ow", Seq((4L, "v4")).toDF("id", "s"))
    assert(cat2.versions("ow").size === 3)
    assert(!cat2.versions("ow").contains(oldest), "horizon must drop the oldest overwrite")
    // a cursor that fell behind the window refuses loudly — the consumer
    // re-bootstraps from a full read, never silently skips changes
    intercept[IllegalArgumentException](cat2.changesSince("ow", oldest))
  }

  test("tableChanges: append yields inserts, deleteWhere yields deletes, compaction an EMPTY feed") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("cdc", Seq((1L, "a"), (2L, "b"), (3L, "c"), (3L, "c")).toDF("id", "s"))
    cat.appendTable("cdc", Seq((4L, "d"), (5L, "e")).toDF("id", "s"))
    val Seq(v2, v1) = cat.versions("cdc").take(2)
    // append span: exactly the delta as inserts, zero deletes, O(delta)
    val cf12 = cat.tableChanges("cdc", v1, v2).collect()
    assert(cf12.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      == Set((4L, "d", "insert"), (5L, "e", "insert")))
    cat.deleteWhere("cdc", "id", "<=", "2")
    val v3 = cat.versions("cdc").max
    // delete span: the removed rows as deletes (duplicates kept as
    // multiset — both (3,c) copies SURVIVE, so neither appears)
    val cf23 = cat.tableChanges("cdc", v2, v3).collect()
    assert(cf23.map(r => (r.getLong(0), r.getString(2))).toSet
      == Set((1L, "delete"), (2L, "delete")), cf23.mkString(";"))
    // compaction span: file churn, zero data change — EMPTY both ways
    cat.compactSmallFiles("cdc", smallBytes = 64L << 20, targetBytes = 64L << 20)
    val v4 = cat.versions("cdc").max
    assert(cat.tableChanges("cdc", v3, v4).count() === 0L,
      "compaction leaked into the changefeed")
    // schema evolution: pre-evolution side aligns to the TO schema (NULL
    // for the new column), and the feed reports exactly the evolved delta
    cat.appendTableEvolve("cdc", Seq((6L, "f", 9.5)).toDF("id", "s", "score"))
    val v5 = cat.versions("cdc").max
    val cf45 = cat.tableChanges("cdc", v4, v5).collect()
    assert(cf45.length == 1 && cf45.head.getLong(0) == 6L && cf45.head.getDouble(2) == 9.5)
    // guards: inverted span and GC'd versions refuse loudly
    intercept[IllegalArgumentException](cat.tableChanges("cdc", v5, v4))
    intercept[IllegalArgumentException](cat.tableChanges("cdc", 999L, 1000L))
  }

  test("upsertTable: keyed replace-or-insert, zone-pruned rewrites, loud duplicate/NULL keys") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable(
      "mrg",
      (1 to 40).map(i => (i.toLong, s"v$i", i * 1.0)).toDF("id", "s", "x")
        .repartitionByRange(4, col("id")))
    cat.analyzeTable("mrg", fileStats = true)
    // updates touch only keys 1..5 (one range file) + insert 100..102
    val ups = (Seq(1L, 3L, 5L).map(i => (i, s"UP$i", -1.0)) ++
      Seq(100L, 101L, 102L).map(i => (i, s"NEW$i", 9.9))).toDF("id", "s", "x")
    val rep = cat.upsertTable("mrg", ups, "id").head()
    assert(rep.getAs[Long]("n_rows_replaced") === 3L)
    assert(rep.getAs[Long]("n_rows_upserted") === 6L)
    // zone maps were fresh: files whose id-range can't meet [1, 102]...
    // every range intersects here, but the 4-file split means at most the
    // intersecting files rewrite — assert we did better than rewrite-all
    // is not provable with this key spread, so assert correctness instead
    val back = cat.readTable("mrg").collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(back.size === 43)
    assert(back(1L) == (("UP1", -1.0)) && back(3L) == (("UP3", -1.0)) && back(5L) == (("UP5", -1.0)))
    assert(back(2L) == (("v2", 2.0)) && back(40L) == (("v40", 40.0)))
    assert(back(101L) == (("NEW101", 9.9)))
    // a SECOND upsert whose keys sit entirely above every stored range:
    // with fresh zone maps, zero files rewrite (pure insert)
    cat.analyzeTable("mrg", fileStats = true)
    val rep2 = cat.upsertTable("mrg", Seq((200L, "NEW200", 1.0)).toDF("id", "s", "x"), "id").head()
    assert(rep2.getAs[Long]("n_files_rewritten") === 0L)
    assert(rep2.getAs[Long]("n_rows_replaced") === 0L)
    assert(cat.readTable("mrg").count() === 44L)
    // update batches with duplicate or NULL keys refuse loudly
    intercept[IllegalArgumentException](
      cat.upsertTable("mrg", Seq((7L, "a", 1.0), (7L, "b", 2.0)).toDF("id", "s", "x"), "id"))
    val nullKey = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(null, "a", 1.0)),
      cat.readTable("mrg").schema)
    intercept[IllegalArgumentException](cat.upsertTable("mrg", nullKey, "id"))
    // schema mismatch refuses
    intercept[IllegalArgumentException](
      cat.upsertTable("mrg", Seq((1L, "a")).toDF("id", "s"), "id"))
  }

  test("nested (two-level) hive layout: full mutation lifecycle + partition-pruned scans on both levels") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    val df = (1 to 60).map(i => (i.toLong, s"d${i % 2}", s"r${i % 3}", i * 10L))
      .toDF("id", "day", "region", "v")
    cat.putPartitionedTableBy("nested", df.filter(col("id") <= 30), Seq("day", "region"))
    cat.appendTable("nested", df.filter(col("id") > 30))
    val all = cat.readTable("nested")
    assert(all.count() === 60L)
    // both partition columns come back with real values at every level
    assert(all.filter(col("day").isNull || col("region").isNull).count() === 0L)
    assert(all.select(col("day"), col("region")).distinct().count() === 6L)
    // predicates on any level are PartitionFilters (planning-time pruning),
    // and the pruned answers are right
    val pruned = all.filter(col("day") === "d1" && col("region") === "r2")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && (scan.contains("day") || scan.contains("region")),
      s"predicate did not reach the partition listing:\n${scan.take(600)}")
    assert(pruned.collect().map(_.getAs[Long]("id")).sorted.toSeq
      == (1 to 60).filter(i => i % 2 == 1 && i % 3 == 2).map(_.toLong))
    // deleteWhere keeps the nested layout; the changefeed composes with
    // it (delete span collected while both span versions are retained)
    val vAppend = cat.versions("nested").max
    cat.deleteWhere("nested", "id", "<=", "10")
    val vDelete = cat.versions("nested").max
    val feed = cat.tableChanges("nested", vAppend, vDelete).collect()
    assert(feed.map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"))).toSet
      == (1 to 10).map(i => (i.toLong, "delete")).toSet, feed.take(5).mkString(";"))
    // compaction packs within the layout, values unharmed
    cat.compactSmallFiles("nested", smallBytes = 64L << 20, targetBytes = 64L << 20)
    val after = cat.readTable("nested")
    assert(after.count() === 50L)
    assert(after.filter(col("day").isNull || col("region").isNull).count() === 0L)
    assert(after.agg(org.apache.spark.sql.functions.sum(col("id"))).head().getLong(0)
      === (11 to 60).sum.toLong)
  }

  test("hive k=v detection anchors below the table dir: a k=v segment in the ROOT never misclassifies") {
    import spark.implicits._
    // the catalog root itself contains a k=v segment (an object-store
    // prefix / run dir shape) — every table under it must still read and
    // mutate as its own layout says, not as a fabricated partitioned one
    val base = Files.createTempDirectory("graft_catalog_kv_")
    val root = base.resolve("run=5").resolve("data")
    val cat  = new Catalog(spark, root.toString)
    val df   = Seq((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p1")).toDF("id", "s", "part")
    // flat table: append goes through manifest mutation — partitionColsOf
    // must come back EMPTY despite run=5 sitting in every absolute path
    cat.putTable("flat", df.select(col("id"), col("s")))
    cat.appendTable("flat", Seq((4L, "w")).toDF("id", "s"))
    val flat = cat.readTable("flat")
    assert(flat.schema.fieldNames.toSeq == Seq("id", "s"))
    assert(flat.count() == 4)
    // partitioned table: the REAL k=v level (below the version dir) must
    // still be detected — mutations keep the layout and the partition
    // column survives an append + delete round trip with correct values
    cat.putPartitionedTable("parted", df, "part")
    cat.appendTable("parted", Seq((9L, "q", "p3")).toDF("id", "s", "part"))
    cat.deleteWhere("parted", "id", "<=", "1")
    val back = cat.readTable("parted").collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("part"))).toSet
    assert(back == Set((2L, "p2"), (3L, "p1"), (9L, "p3")), back.toString)
  }

  // ------------------------------------------------ expectation-gated writes

  test("appendTableExpect quarantines violators with rule attribution; clean rows append") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("exp_t", Seq((1L, 10.0, "ok"), (2L, 20.0, "ok")).toDF("id", "price", "tag"))
    val batch = Seq(
      (3L, 30.0, "ok"),    // clean
      (4L, -5.0, "ok"),    // violates price_pos
      (5L, 50.0, "bad"),   // violates tag_ok
      (6L, -1.0, "bad")    // violates BOTH
    ).toDF("id", "price", "tag")
    val report = cat.appendTableExpect(
      "exp_t", batch,
      Seq("price_pos" -> "price >= 0", "tag_ok" -> "tag <> 'bad'"))
    // report: every rule gets a row; a both-rules row counts in both
    val rep = report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("price_pos" -> 2L, "tag_ok" -> 2L), rep.toString)
    // table: base + the one clean row
    assert(cat.readTable("exp_t").select("id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L))
    // quarantine: the three dirty rows, each tagged with the rules it broke
    val q = cat.quarantineOf("exp_t").collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Seq[String]]("_violated").toSet).toMap
    assert(q == Map(
      4L -> Set("price_pos"),
      5L -> Set("tag_ok"),
      6L -> Set("price_pos", "tag_ok")), q.toString)
    // the quarantine stamp is the commit the clean siblings published
    val stamps = cat.quarantineOf("exp_t").select("_quarantined_commit")
      .collect().map(_.getLong(0)).toSet
    assert(stamps == Set(cat.versions("exp_t").max))
    // a SECOND gated batch appends to the existing quarantine (the array
    // column's parquet nullability round-trip must not refuse it)
    cat.appendTableExpect(
      "exp_t", Seq((7L, -7.0, "ok")).toDF("id", "price", "tag"),
      Seq("price_pos" -> "price >= 0", "tag_ok" -> "tag <> 'bad'"))
    assert(cat.quarantineOf("exp_t").count() == 4)
  }

  test("appendTableExpect fail mode writes NOTHING; drop mode discards violators silently") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("exp_f", Seq((1L, 10.0)).toDF("id", "price"))
    val vBefore = cat.versions("exp_f").max
    val ex = intercept[graft.sources.ExpectationViolationException] {
      cat.appendTableExpect(
        "exp_f", Seq((2L, -1.0), (3L, 5.0)).toDF("id", "price"),
        Seq("price_pos" -> "price >= 0"), onViolation = "fail")
    }
    assert(ex.perRule == Map("price_pos" -> 1L))
    assert(cat.versions("exp_f").max == vBefore, "fail mode must not publish")
    assert(!cat.exists("exp_f.__quarantine__"))
    // drop: clean row lands, dirty row vanishes, still no quarantine table
    val rep = cat.appendTableExpect(
      "exp_f", Seq((2L, -1.0), (3L, 5.0)).toDF("id", "price"),
      Seq("price_pos" -> "price >= 0"), onViolation = "drop")
    assert(rep.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("price_pos", 1L)))
    assert(cat.readTable("exp_f").select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(!cat.exists("exp_f.__quarantine__"))
  }

  test("appendTableExpect: all-clean batch reports zeros and creates no quarantine; NULL predicate passes (ANSI CHECK)") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("exp_c", Seq((1L, Some(10.0))).toDF("id", "price"))
    // price NULL on id=2: `price >= 0` evaluates NULL → SATISFIED by CHECK
    // semantics; the explicit IS NOT NULL rule is what catches nulls
    val rep1 = cat.appendTableExpect(
      "exp_c", Seq((2L, Option.empty[Double])).toDF("id", "price"),
      Seq("price_pos" -> "price >= 0"))
    assert(rep1.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("price_pos", 0L)))
    assert(!cat.exists("exp_c.__quarantine__"))
    assert(cat.readTable("exp_c").count() == 2)
    val rep2 = cat.appendTableExpect(
      "exp_c", Seq((3L, Option.empty[Double])).toDF("id", "price"),
      Seq("price_set" -> "price IS NOT NULL"))
    assert(rep2.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("price_set", 1L)))
    assert(cat.quarantineOf("exp_c").count() == 1)
  }

  // ------------------------------------------- value-Bloom point lookups

  test("bloom lookup prunes to candidate files and stays exact; stale index degrades to full scan") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    // three generations with DISJOINT id ranges → a probe hits one gen
    cat.putTable("bl_t", (1L to 100L).map(i => (i, s"v$i")).toDF("id", "s").repartition(2))
    cat.appendTable("bl_t", (101L to 200L).map(i => (i, s"v$i")).toDF("id", "s").repartition(2))
    cat.appendTable("bl_t", (201L to 300L).map(i => (i, s"v$i")).toDF("id", "s").repartition(2))
    cat.analyzeBloomIndex("bl_t", Seq("id", "s"))
    val cand = cat.lookupCandidateFiles("bl_t", "id", Seq(150L, 160L)).get
    assert(cand.nonEmpty && cand.size < 6,
      s"expected a proper prune over 6 files, got ${cand.size}")
    val got = cat.readTableLookupIn("bl_t", "id", Seq(150L, 160L))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(150L, 160L))
    // string-typed column probes hash in the string domain
    assert(cat.readTableLookupIn("bl_t", "s", Seq("v42", "v250"))
      .select("id").collect().map(_.getLong(0)).toSet == Set(42L, 250L))
    // all-pruned probe: empty frame, schema intact
    val none = cat.readTableLookupIn("bl_t", "id", Seq(9999L))
    assert(none.count() == 0 && none.columns.toSeq == Seq("id", "s"))
    // stale: append WITHOUT refresh → candidates refuse, read degrades to
    // the full scan and still sees the new row
    cat.appendTable("bl_t", Seq((301L, "v301")).toDF("id", "s"))
    assert(cat.lookupCandidateFiles("bl_t", "id", Seq(301L)).isEmpty)
    assert(cat.readTableLookupIn("bl_t", "id", Seq(301L)).count() == 1)
    // O(delta) refresh: only the unseen generation scans, then pruning resumes
    val rep = cat.analyzeBloomIndexAppended("bl_t").head()
    assert(rep.getAs[Long]("n_files_scanned") >= 1
      && rep.getAs[Long]("n_files_inherited") >= 6, rep.toString)
    assert(cat.lookupCandidateFiles("bl_t", "id", Seq(301L)).get.nonEmpty)
    assert(cat.readTableLookupIn("bl_t", "id", Seq(301L)).count() == 1)
  }

  test("readTableWhere equality probes compose value Blooms with (and without) zone maps") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    // three generations, disjoint id ranges; ids are NOT range-clustered
    // within a generation (repartition = hash), so only cross-generation
    // pruning is possible — and a point probe needs membership, not ranges
    cat.putTable("rw_t", (1L to 100L).map(i => (i, i * 3)).toDF("id", "v").repartition(2))
    cat.appendTable("rw_t", (101L to 200L).map(i => (i, i * 3)).toDF("id", "v").repartition(2))
    cat.appendTable("rw_t", (201L to 300L).map(i => (i, i * 3)).toDF("id", "v").repartition(2))
    val total = cat.readTable("rw_t").inputFiles.length
    // no stats of any kind: plain filtered scan over every file
    assert(cat.readTableWhere("rw_t", "id", "=", "150").inputFiles.length == total)
    // Bloom index ALONE (no zone maps): the equality read prunes to the
    // Bloom-candidate files and stays exact
    cat.analyzeBloomIndex("rw_t", Seq("id"))
    val pruned = cat.readTableWhere("rw_t", "id", "=", "150")
    assert(pruned.inputFiles.length < total,
      s"bloom tier must prune: ${pruned.inputFiles.length} vs $total")
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((150L, 450L)))
    // zone maps on top: the two exclusion sets union (here zone maps also
    // exclude by the per-generation id ranges — never fewer files pruned)
    cat.analyzeTable("rw_t", fileStats = true)
    val both = cat.readTableWhere("rw_t", "id", "=", "150")
    assert(both.inputFiles.length <= pruned.inputFiles.length)
    assert(both.collect().map(_.getLong(0)).toSeq == Seq(150L))
    // non-equality conjuncts never consult Blooms (range ops keep the
    // zone-map contract): still exact
    assert(cat.readTableWhere("rw_t", "id", "<=", "3").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L))
    // stale Bloom (append without refresh) must not prune the new row away
    cat.appendTable("rw_t", Seq((301L, 903L)).toDF("id", "v"))
    assert(cat.readTableWhere("rw_t", "id", "=", "301").collect().map(_.getLong(0)).toSeq
      == Seq(301L))
  }

  // ------------------------------- merge-on-read deletes (deletion vectors)

  test("deleteByKeys is metadata-only; every read path serves effective rows; time travel keeps epochs") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("mor_t", (1L to 100L).map(i => (i, i * 2)).toDF("id", "v").repartition(3))
    val filesBefore = cat.readTable("mor_t").inputFiles.map(f => f.substring(f.indexOf("/mor_t"))).toSet
    val vPre = cat.versions("mor_t").max
    val rep = cat.deleteByKeys("mor_t", "id", (1L to 100L by 7).map(_.asInstanceOf[Any])).head()
    assert(rep.getAs[Long]("n_tombstones_total") == 15 && rep.getAs[Long]("n_tombstones_new") == 15)
    // metadata-only: the new version references the SAME data files
    val filesAfter = cat.readTable("mor_t").inputFiles
      .filterNot(_.contains("_DELETES")) // the vector itself is a plan leaf
      .map(f => f.substring(f.indexOf("/mor_t"))).toSet
    assert(filesAfter == filesBefore, "deleteByKeys must not rewrite data files")
    val dead = (1L to 100L by 7).toSet
    val live = (1L to 100L).filterNot(dead).toSet
    assert(cat.readTable("mor_t").select("id").as[Long].collect().toSet == live)
    // pruned reads apply the vector too
    cat.analyzeBloomIndex("mor_t", Seq("id"))
    assert(cat.readTableLookupIn("mor_t", "id", Seq(8L, 9L)).select("id").as[Long].collect().toSet
      == Set(9L), "8 is tombstoned (1+7), 9 is live")
    assert(cat.readTableWhere("mor_t", "id", "=", "15").count() == 0, "15 = 1+2*7 is tombstoned")
    assert(cat.readTableWhere("mor_t", "id", "=", "16").count() == 1)
    // time travel: the pre-delete version still serves all 100 rows
    assert(cat.readTableVersion("mor_t", vPre).count() == 100)
    // a second vector unions; deletedKeysOf audits
    cat.deleteByKeys("mor_t", "id", Seq(2L))
    assert(cat.readTable("mor_t").count() == live.size - 1)
    assert(cat.deletedKeysOf("mor_t").get.count() == 16)
  }

  test("deletion vectors: append carries + refuses resurrects; CoW verbs refuse until merged") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("mor_g", (1L to 50L).map(i => (i, i)).toDF("id", "v").repartition(2))
    cat.deleteByKeys("mor_g", "id", Seq(10L, 20L))
    // append of fresh keys carries the vector forward
    cat.appendTable("mor_g", Seq((51L, 51L)).toDF("id", "v"))
    assert(cat.readTable("mor_g").count() == 49)
    assert(cat.deletedKeysOf("mor_g").get.count() == 2)
    // reinserting a tombstoned key refuses loudly
    val ex = intercept[IllegalArgumentException] {
      cat.appendTable("mor_g", Seq((20L, 0L)).toDF("id", "v"))
    }
    assert(ex.getMessage.contains("tombstoned"))
    // CoW rewrite verbs demand a merge first
    assert(intercept[IllegalArgumentException](
      cat.deleteWhere("mor_g", "id", "<=", "5")).getMessage.contains("mergeDeletes"))
    assert(intercept[IllegalArgumentException](
      cat.upsertTable("mor_g", Seq((3L, 9L)).toDF("id", "v"), "id")).getMessage.contains("mergeDeletes"))
    assert(intercept[IllegalArgumentException](
      cat.compactSmallFiles("mor_g")).getMessage.contains("mergeDeletes"))
    // after the merge, the verbs work again and results are unchanged
    cat.mergeDeletes("mor_g")
    assert(cat.readTable("mor_g").count() == 49)
    cat.deleteWhere("mor_g", "id", "<=", "5")
    assert(cat.readTable("mor_g").count() == 44)
  }

  test("mergeDeletes rewrites only Bloom-candidate files; results bit-identical; idempotent") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    // three generations with disjoint id ranges → tombstones from ONE
    // generation leave the other generations' files untouched
    cat.putTable("mor_m", (1L to 100L).map(i => (i, i)).toDF("id", "v").repartition(2))
    cat.appendTable("mor_m", (101L to 200L).map(i => (i, i)).toDF("id", "v").repartition(2))
    cat.appendTable("mor_m", (201L to 300L).map(i => (i, i)).toDF("id", "v").repartition(2))
    cat.deleteByKeys("mor_m", "id", Seq(150L, 160L, 170L))
    cat.analyzeBloomIndex("mor_m", Seq("id")) // fresh at the DV version
    val before = cat.readTable("mor_m").select("id").as[Long].collect().sorted.toSeq
    val filesBefore = cat.readTable("mor_m").inputFiles.toSet
    val rep = cat.mergeDeletes("mor_m").head()
    assert(rep.getAs[Long]("n_files_rewritten") < rep.getAs[Long]("n_files_live"),
      s"bloom prune must spare the generations without tombstoned keys: $rep")
    assert(rep.getAs[Long]("n_tombstones_merged") == 3)
    val after = cat.readTable("mor_m").select("id").as[Long].collect().sorted.toSeq
    assert(after == before, "merge must be invisible to readers")
    assert(cat.deletedKeysOf("mor_m").isEmpty)
    // untouched files are re-referenced verbatim
    val filesAfter = cat.readTable("mor_m").inputFiles.toSet
    assert((filesBefore intersect filesAfter).nonEmpty, "untouched generations must not rewrite")
    // idempotent: a second merge is a zero-work no-op
    val rep2 = cat.mergeDeletes("mor_m").head()
    assert(rep2.getAs[Long]("n_files_rewritten") == 0 && rep2.getAs[Long]("n_tombstones_merged") == 0)
  }

  test("changefeed across deletion vectors: DV span = deletes, merge span = empty, restore = un-deletes, clone snapshots the vector") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("mor_c", (1L to 40L).map(i => (i, i)).toDF("id", "v").repartition(2))
    val v1 = cat.versions("mor_c").max
    cat.deleteByKeys("mor_c", "id", Seq(5L, 15L, 25L))
    val v2 = cat.versions("mor_c").max
    // the DV publish is a pure row-level delete in the feed
    val feed1 = cat.tableChanges("mor_c", v1, v2).collect()
    assert(feed1.forall(_.getAs[String]("_change_type") == "delete"))
    assert(feed1.map(_.getAs[Long]("id")).toSet == Set(5L, 15L, 25L))
    // clone under a pending vector snapshots effective rows
    cat.cloneTable("mor_c", "mor_c_dev")
    assert(cat.readTable("mor_c_dev").count() == 37)
    // merge: the feed across the span must be EMPTY (file churn, no data change)
    cat.mergeDeletes("mor_c")
    val v3 = cat.versions("mor_c").max
    assert(cat.tableChanges("mor_c", v2, v3).isEmpty, "merge span must cancel")
    assert(cat.readTable("mor_c").count() == 37)
    // restore to the pre-delete version: the tombstoned rows flow BACK as inserts
    cat.restoreTable("mor_c", v1)
    val v4 = cat.versions("mor_c").max
    val back = cat.tableChanges("mor_c", v3, v4).collect()
    assert(back.forall(_.getAs[String]("_change_type") == "insert"))
    assert(back.map(_.getAs[Long]("id")).toSet == Set(5L, 15L, 25L))
    assert(cat.readTable("mor_c").count() == 40)
    // the clone diverged at the snapshot: still 37 effective rows
    assert(cat.readTable("mor_c_dev").count() == 37)
  }

  // ------------------------------------------------------ shallow clones

  test("cloneTable is zero-copy, isolated both ways, and survives source GC + vacuum") {
    import spark.implicits._
    val (cat, root) = freshCatalog()
    cat.putTable("prod", (1L to 90L).map(i => (i, i * 2)).toDF("id", "v").repartition(3))
    cat.cloneTable("prod", "dev")
    // zero-copy: the clone's version dir holds ONLY metadata, no parquet
    val devDir = java.nio.file.Files.list(root).iterator().asScala
      .filter(_.getFileName.toString.startsWith("dev.__v")).toSeq
    assert(devDir.size == 1)
    val inDev = java.nio.file.Files.list(devDir.head).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(inDev.forall(f => f.startsWith("_") || f.startsWith(".")),
      s"clone dir must be metadata-only (manifest/schema/marker + checksums): $inDev")
    assert(cat.readTable("dev").count() == 90)
    // diverge the clone; the source must not see it
    cat.appendTable("dev", Seq((1000L, 0L)).toDF("id", "v"))
    assert(cat.readTable("prod").count() == 90)
    // source-side churn: delete + compact + two more publishes push the
    // clone-shared base version far outside the source's retained window,
    // then vacuum sweeps the blob area — the clone must survive all of it
    cat.deleteWhere("prod", "id", "<=", "30")
    cat.compactSmallFiles("prod", smallBytes = 64L << 20, targetBytes = 64L << 20)
    cat.appendTable("prod", Seq((2000L, 0L)).toDF("id", "v"))
    cat.appendTable("prod", Seq((2001L, 0L)).toDF("id", "v"))
    cat.vacuum("prod")
    assert(cat.readTable("prod").count() == 62)
    assert(cat.readTable("dev").count() == 91,
      "clone truncated — source GC reclaimed clone-referenced files")
    // the clone pins the base: delete refuses while the clone lives
    val ex = intercept[graft.sources.LiveCloneException](cat.delete("prod"))
    assert(ex.clones == Seq("dev"))
    assert(cat.delete("dev"))
    assert(cat.delete("prod"), "after the clone is gone, delete proceeds")
    assert(!cat.exists("prod") && !cat.exists("dev"))
  }

  test("clone-of-clone: transitive back-references protect the grandparent's files") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.putTable("g0", (1L to 50L).map(i => (i, i)).toDF("id", "v").repartition(2))
    cat.cloneTable("g0", "g1")
    cat.cloneTable("g1", "g2")
    // diverge g1 AWAY from g0's files entirely (full compact rewrites all
    // of g1's data into its own dirs) — g2 still references g0's originals
    cat.compact("g1")
    // churn g0 so its own retained window drops the shared base version
    cat.deleteWhere("g0", "id", "<=", "10")
    cat.appendTable("g0", Seq((900L, 0L)).toDF("id", "v"))
    cat.appendTable("g0", Seq((901L, 0L)).toDF("id", "v"))
    cat.vacuum("g0")
    assert(cat.readTable("g2").count() == 50,
      "grandchild clone truncated — transitive protection failed")
    assert(cat.readTable("g1").count() == 50)
    assert(cat.readTable("g0").count() == 42)
  }
}
