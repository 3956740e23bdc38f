package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Engine

/** Dev probe: does localCheckpoint preserve outputPartitioning in this
  * Spark version, and do co-partitioned checkpointed frames join without
  * an Exchange? Prints the physical plans so the claim is checkable. */
object ProbePartitioning {
  def main(args: Array[String]): Unit = {
    val spark = Engine
      .tune(SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    import org.apache.spark.sql.graftbridge.Bridge
    val a0 = (1 to 10000).toDF("id").repartition(4, col("id")).localCheckpoint(true)
    val b0 = (1 to 10000).map(i => (i, i * 2)).toDF("src", "v").repartition(4, col("src")).localCheckpoint(true)
    val a = Bridge.withHashPartitioning(
      Bridge.capCheckpointStats(a0, 1L << 40), Seq("id"), 4)
    val b = Bridge.withHashPartitioning(
      Bridge.capCheckpointStats(b0, 1L << 40), Seq("src"), 4)

    println("=== logicalRDD partitioning after rewrap ===")
    a.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        println("a outputPartitioning: " + l.outputPartitioning + " stats=" + l.stats.sizeInBytes)
      case other => println("not a LogicalRDD: " + other.getClass)
    }

    val j = a.join(b, a("id") === b("src"))
    println("=== join physical plan ===")
    println(j.queryExecution.executedPlan.toString)
    j.queryExecution.toRdd.foreach(_ => ())
    println("=== join executed (after AQE) ===")
    println(j.queryExecution.executedPlan.toString)

    // replicate one pageRank iteration with CAPPED stats (the iterative
    // operators' real shape): which exchanges survive?
    def capped(df: org.apache.spark.sql.DataFrame, keys: Seq[String], n: Int) = {
      val cp = df.repartition(n, keys.map(col): _*).localCheckpoint(true)
      Bridge.withHashPartitioning(Bridge.capCheckpointStats(cp, 1L << 40), keys, n)
      // NOTE: cap only fires above threshold; emulate by setting huge stats? skip —
      // pageRank frames carry big inherited stats, here stats are honest-small.
    }
    val parts = 4
    val e = capped((1 to 20000).map(i => (i % 997, i % 313)).toDF("src", "dst"), Seq("src"), parts)
    val nodes = capped(e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct(), Seq("id"), parts)
    val outDeg = capped(e.groupBy("src").agg(count(lit(1)).as("deg")), Seq("src"), parts)
    val dangling = capped(nodes.join(outDeg, nodes("id") === outDeg("src"), "left_anti").select(col("id").as("did")), Seq("did"), parts)
    val ranks = capped(nodes.select(col("id"), lit(1.0).as("rank")), Seq("id"), parts)
    val danglingMass = ranks.join(dangling, ranks("id") === col("did"), "left_semi")
      .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
    val weights = ranks.join(outDeg, ranks("id") === outDeg("src"))
      .select(col("id").as("wsrc"), (col("rank") / col("deg")).as("w"))
    val contribs = e.join(weights, col("src") === col("wsrc"))
      .groupBy(col("dst")).agg(sum(col("w")).as("c"))
    val nextPlan = nodes.join(contribs, nodes("id") === contribs("dst"), "left")
      .crossJoin(broadcast(danglingMass))
      .select(col("id"), (lit(0.15) + lit(0.85) * (coalesce(col("c"), lit(0.0)) + col("dmass"))).as("rank"))
    println("=== iteration initial plan ===")
    println(nextPlan.queryExecution.executedPlan.toString)
    nextPlan.queryExecution.toRdd.foreach(_ => ())
    println("=== iteration after AQE ===")
    println(nextPlan.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
