package graft

import java.nio.file.Files

class CliSpec extends SparkSpec {

  private def freshCli(): Cli =
    new Cli(spark, Files.createTempDirectory("graft_cli_").toString)

  test("storage command round trip: PUT/LS/STORE/GET/DELETE") {
    val cli   = freshCli()
    val local = Files.createTempFile("cli_in_", ".txt")
    Files.writeString(local, "hello world\nbye\n")

    assert(cli.handle(s"PUT data1 $local") == "put data1")
    assert(cli.handle("STORE") == "data1")
    assert(cli.handle("LS data1").contains("data1"))
    val out = Files.createTempDirectory("cli_out_").resolve("out.txt")
    assert(cli.handle(s"GET data1 $out").startsWith("got data1"))
    assert(Files.readString(out) == "hello world\nbye\n")
    assert(cli.handle("DELETE data1") == "deleted data1")
    assert(cli.handle("LS data1") == "no such file data1")
    assert(cli.handle("DELETE data1") == "no such file data1")
  }

  test("LIST/SELF report engine runtime state; unknown command is safe") {
    val cli = freshCli()
    assert(cli.handle("SELF").contains("up"))
    assert(cli.handle("LIST").nonEmpty)
    assert(cli.handle("FROB x").startsWith("unknown command"))
  }

  test("ping probes every live executor slot (reference README.md:17 parity)") {
    val cli = freshCli()
    val out = cli.handle("ping")
    assert(out.startsWith("pong from"), out)
    assert(out.contains("host"), out)
    assert(cli.handle("PING").startsWith("pong from"), "case-insensitive like the reference REPL")
  }

  test("maple/juice word count end to end through the CLI (exe UDFs)") {
    import spark.implicits._
    val cli = freshCli()
    // stage the corpus: two input files under prefix wc_in
    cli.catalog.putText("wc_in_a", Seq("the quick brown fox", "the lazy dog").toDS())
    cli.catalog.putText("wc_in_b", Seq("the fox").toDS())

    // mapper exe: tokenize to `word 1` lines (awk, any-language UDF parity;
    // comma is the CLI's argv separator, so the program avoids commas)
    val mapper = "awk,{for(i=1;i<=NF;i++) print $i\" 1\"}"
    assert(cli.maple(mapper, 2, "wc_mid", "wc_in") == "maple wc_mid done")
    assert(cli.catalog.exists("wc_mid"))

    // reducer exe: `wc -l <keyfile>` = line count (reference word-count exe)
    assert(cli.juice("wc,-l", 2, "wc_mid", "wc_out", true) == "juice wc_out done")
    assert(!cli.catalog.exists("wc_mid"), "delete_input=1 removes intermediates")

    val result = cli.catalog
      .readText("wc_out")
      .collect()
      .map(_.split(" ", 2))
      .map(a => a(0) -> a(1).trim.split("\\s+").head.toInt)
      .toMap
    assert(result("the") == 3)
    assert(result("fox") == 2)
    assert(result("dog") == 1)
  }

  test("grep over named datasets") {
    import spark.implicits._
    val cli = freshCli()
    cli.catalog.putText("log_vm1", Seq("HEARTBEAT 1 2", "JOIN 3 4").toDS())
    cli.catalog.putText("log_vm2", Seq("HEARTBEAT 5 6").toDS())
    assert(cli.handle("grep HEARTBEAT log_") == "2 matching lines")
    assert(cli.handle("grep JOIN log_") == "1 matching lines")
  }
}
