package graft

import graft.operators.MapleJuice
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class MapleJuiceSpec extends SparkSpec {
  import MapleJuice._

  test("parseKV: key/value split, last record kept, cleaned semantics") {
    assert(parseKV("the 1") == Some(("the", "1")))
    assert(parseKV("k multi word value") == Some(("k", "multi word value")))
    assert(parseKV("  padded   v  ") == Some(("padded", "v")))
    assert(parseKV("") == None)
    assert(parseKV("solo") == Some(("solo", ""))) // no silent drop (§2f wart 1)
  }

  test("maple+juice word count matches declarative groupBy.count") {
    import spark.implicits._
    val lines = Seq("the quick brown fox", "the lazy dog", "the fox").toDS()
    val mj = MapleJuice
      .run(lines)(l => l.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, "1")))((_, vs) => vs.size.toString)
      .collect()
      .map(r => (r.getString(0), r.getString(1).toLong))
      .toMap
    val expected = lines
      .flatMap(_.split("\\s+"))
      .groupByKey(identity)
      .count()
      .collect()
      .toMap
    assert(mj == expected)
    assert(mj("the") == 3L)
  }

  test("juice is order-insensitive: shuffled input gives identical output") {
    import spark.implicits._
    // property check with a deterministic scalacheck generator stream
    val gen = Gen.listOfN(30, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.alphaNumStr.map(_.take(5))))
    (0 until 5).foreach { i =>
      val pairs = gen(Gen.Parameters.default, Seed(42L + i)).get
      def reduceOf(ps: List[(String, String)]) =
        juice(ps.toDS())((_, vs) => vs.toSeq.sorted.mkString("|")).collect().toMap
      val rnd = new scala.util.Random(7 * i + 1)
      assert(reduceOf(pairs) == reduceOf(rnd.shuffle(pairs)))
    }
  }

  test("numTasks>0 juice partitions by key like the reference's FNV mod n") {
    import spark.implicits._
    val pairs = (1 to 100).map(i => (s"k${i % 7}", i.toString)).toDS()
    val out   = juice(pairs, numTasks = 4)((k, vs) => vs.size.toString).collect().toMap
    assert(out.size == 7)
    assert(out("k0").toInt + out("k1").toInt * 6 > 0) // all keys present, counts sane
    assert(out.values.map(_.toInt).sum == 100)
  }

  test("kv inversion is an involution (property: invert twice = identity)") {
    import spark.implicits._
    val gen = Gen.listOfN(50, Gen.zip(Gen.alphaNumStr.map("k" + _.take(6)), Gen.alphaNumStr.map("v" + _.take(6))))
    (0 until 3).foreach { i =>
      val pairs = gen(Gen.Parameters.default, Seed(11L + i)).get
      val ds    = pairs.toDS()
      def invert(d: org.apache.spark.sql.Dataset[(String, String)]) = d.map { case (k, v) => (v, k) }
      assert(invert(invert(ds)).collect().sorted.sameElements(ds.collect().sorted))
    }
  }

  test("mapleExe pipes lines through an external executable") {
    import spark.implicits._
    // sed swaps the two fields -> reproduces reverse_map.go's k/v inversion
    val lines = Seq("a 1", "b 2", "a 3").toDS()
    val out   = mapleExe(lines, Seq("sed", "-E", "s/^(\\S+) (\\S+)$/\\2 \\1/")).collect().toSet
    assert(out == Set(("1", "a"), ("2", "b"), ("3", "a")))
  }

  test("ship distributes a local exe file and tasks resolve it via SparkFiles") {
    import spark.implicits._
    // a real on-disk mapper script, referenced by ABSOLUTE LOCAL PATH only —
    // ship() must addFile it and tasks must resolve the executor-side copy
    val script = java.nio.file.Files.createTempFile("graft_mapper_", ".sh")
    java.nio.file.Files.writeString(script, "#!/bin/sh\nwhile read k v; do echo \"$v $k\"; done\n")
    script.toFile.setExecutable(true)
    val shipped = ship(spark, Seq(script.toString))
    assert(shipped.head.startsWith("sparkfile:"), s"local file must be rewritten: $shipped")
    assert(ship(spark, Seq("wc", "-l")) == Seq("wc", "-l"), "PATH binaries pass through")
    val lines = Seq("a 1", "b 2").toDS()
    val out   = mapleExe(lines, shipped).collect().toSet
    assert(out == Set(("1", "a"), ("2", "b")))
  }

  test("mapleExe fails loudly when the exe exits nonzero") {
    import spark.implicits._
    val lines = Seq("x 1").toDS()
    val ex = intercept[Exception] {
      mapleExe(lines, Seq("sh", "-c", "exit 3")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("mapleExe survives an exe flooding stderr past the OS pipe buffer") {
    import spark.implicits._
    // 1 MB to stderr BEFORE consuming stdin: without a dedicated stderr
    // drainer the child blocks on the full pipe and the task hangs forever
    val script = java.nio.file.Files.createTempFile("graft_noisy_", ".sh")
    java.nio.file.Files.writeString(
      script,
      "#!/bin/sh\nyes noisy-stderr-line | head -c 1048576 >&2\nwhile read k v; do echo \"$k $v\"; done\n")
    script.toFile.setExecutable(true)
    val lines = (1 to 50).map(i => s"k$i $i").toDS().repartition(1)
    val out   = mapleExe(lines, Seq(script.toString)).collect().toSet
    assert(out == (1 to 50).map(i => (s"k$i", i.toString)).toSet)
  }

  test("mapleExe propagates an upstream input failure instead of exiting 0 on truncated stdin") {
    import spark.implicits._
    val lines = spark
      .range(100)
      .repartition(1)
      .map(i => if (i == 60) throw new IllegalStateException("upstream boom") else s"w$i 1")
    val ex = intercept[Exception] {
      mapleExe(lines, Seq("cat")).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(chain(ex).exists(_.contains("upstream boom")), s"got: ${chain(ex)}")
  }

  test("mapleExe under partial consumption (limit) completes and cleans up") {
    import spark.implicits._
    // downstream take(1) abandons the output iterator: the task-completion
    // listener must reap the still-running child (no leak, no hang)
    val lines = (1 to 10000).map(i => s"k$i $i").toDS().repartition(1)
    val first = mapleExe(lines, Seq("cat")).take(1)
    assert(first.length == 1)
  }

  test("juiceExe runs `reducer <keyfile>` per group (word-count exe parity)") {
    import spark.implicits._
    val pairs = Seq(("the", "1"), ("the", "1"), ("fox", "1")).toDS()
    // wc -l counts the value lines = reduce_exe_word_count.go semantics
    val out = juiceExe(pairs, Seq("wc", "-l"))
      .collect()
      .map { case (k, v) => (k, v.trim.split("\\s+").head.toInt) }
      .toMap
    assert(out == Map("the" -> 2, "fox" -> 1))
  }
}
