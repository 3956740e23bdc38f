package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational operator coverage over the TPC-H-ish corpus.
  *
  * The reference has NO relational operators (SURVEY.md §2e: no joins,
  * windows, sorts, set ops, grouping sets) — its single primitive is
  * "whole group → arbitrary exe". This module exposes the full relational
  * surface a user of a real analytics engine needs, expressed declaratively so
  * Catalyst plans them (pushdown, pruning, broadcast/SMJ selection, AQE).
  *
  * Scale notes are per-query; the common rules:
  *  - dimension tables (region/nation/customer/supplier/part) are broadcast —
  *    no shuffle of the fact table for those joins;
  *  - aggregations are partial (map-side combine) by construction, since we
  *    use declarative groupBy.agg;
  *  - every top-k is rank-then-filter or sort-limit (TakeOrdered physical op),
  *    never a full global sort materialization.
  */
object Relational {

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------- q1
    // TPC-H Q1-shaped pricing summary: the canonical partial-agg pipeline.
    // At 100 TB: scan + map-side partial agg + tiny 6-row shuffle — optimal.
    Q(
      "q1_pricing_summary",
      Some("""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-06-30 00:00:00'
        GROUP BY l_returnflag, l_linestatus
      """)) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
      li.filter(col("l_shipdate") <= lit("2000-06-30").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          asDouble(sum(money(col("l_extendedprice")))).as("sum_base_price"),
          asDouble(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))).as("sum_disc_price"),
          (asDouble(sum(col("l_quantity"))) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // ----------------------------------------------------------------- q3
    // Join customer ⋈ orders ⋈ lineitem, aggregate revenue, deterministic
    // top-10. customer is broadcast (small dim); orders⋈lineitem shuffles on
    // o_orderkey = l_orderkey, the natural co-partitioning key. Top-k is
    // sort-limit => TakeOrderedAndProject, no global sort.
    Q(
      "q3_topk_revenue",
      Some("""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               strftime(MIN(o_orderdate), '%Y-%m-%d') AS orderdate
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .join(
          t.orders.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer.filter(col("c_mktsegment") === "BUILDING")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(
          asDouble(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))).as("revenue"),
          date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ----------------------------------------------------------------- q5
    // Multi-way join through both dimension chains (customer-nation and
    // supplier-nation must match): all dims broadcast, single fact shuffle.
    Q(
      "q5_nation_revenue",
      Some("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey  = c_custkey
          JOIN supplier ON l_suppkey  = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
        WHERE c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .join(
          t.orders.filter(
            col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(asDouble(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))).as("revenue"))
    },

    // ------------------------------------------------ stats-driven join
    // Cost-based join shape from PUBLISHED catalog stats, end to end: PUT
    // the dimension into the versioned store, ANALYZE it (one-pass column
    // stats published as `<name>.__stats__`), then join through
    // Catalog.joinWithStats, which reads the stats frame and picks
    // broadcast-vs-merge from the DECOMPRESSED size estimate instead of
    // Spark's on-disk-bytes guess. At 100 TB the decision is the point: a
    // snappy-parquet side under the 10 MB conf default can hydrate to
    // gigabytes, and the stats veto is what stops that broadcast (see
    // Catalog.scala scaladoc; PlanSpec asserts both plan shapes). Here
    // nation is 25 rows, so the stats PICK the broadcast — no shuffle of
    // customer.
    Q(
      "catalog_stats_join",
      Some("""
        SELECT n_name,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
      """)) { (spark, dir) =>
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-stats-join").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable("nation_dim", t.nation)
      cat.analyzeTable("nation_dim")
      cat
        .joinWithStats(t.customer, "nation_dim", col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          asDouble(sum(money(col("c_acctbal")))).as("sum_acctbal"))
    },

    // ------------------------------------------------ stats-driven prune
    // Scan-side pruning from the SAME published stats (Catalog
    // .readTableWhere): a 1995-only orders snapshot is PUT + ANALYZEd,
    // then read under two predicates — one provably empty from the
    // published min/max (orderdate past the version's max: the read plans
    // an empty LOCAL relation, zero files touched — PlanSpec pins the
    // plan), one in-range (a normal pushed-down filtered scan). The row
    // pins both counts against DuckDB running the predicates the slow way.
    Q(
      "catalog_stats_prune",
      Some("""
        WITH o95 AS (SELECT * FROM orders
                     WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                       AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
        SELECT
          (SELECT COUNT(*) FROM o95 WHERE o_orderdate > TIMESTAMP '1996-01-01 00:00:00') AS n_pruned,
          (SELECT COUNT(*) FROM o95 WHERE o_orderdate >= TIMESTAMP '1995-06-01 00:00:00') AS n_kept
      """)) { (spark, dir) =>
      import spark.implicits._
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-stats-prune").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable("orders_1995", t.orders.filter(
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01").cast("timestamp")))
      cat.analyzeTable("orders_1995")
      val nPruned = cat.readTableWhere("orders_1995", "o_orderdate", ">", "1996-01-01 00:00:00").count()
      val nKept   = cat.readTableWhere("orders_1995", "o_orderdate", ">=", "1995-06-01 00:00:00").count()
      Seq((nPruned, nKept)).toDF("n_pruned", "n_kept")
    },

    // ------------------------------------------- file-granular stats prune
    // Zone-map tier between "prune the whole table" and "read everything":
    // orders is published as FOUR range-partitioned files on o_orderkey
    // (disjoint per-file [min, max]), ANALYZE(fileStats = true) records the
    // per-file extremes from one extra map-side-combined pass, and
    // readTableWhere plans the scan over ONLY the files whose range can
    // intersect the predicate — the selective tail read below touches 1 of
    // 4 files (PlanSpec pins inputFiles), yet the row hashes against
    // DuckDB running both predicates over ALL rows: pruning that changes a
    // result is a bug, this row is the guard. At 100 TB this is min/max
    // data skipping over the catalog's own metadata — no manifest format
    // needed, no data read to decide.
    Q(
      "catalog_file_prune",
      Some("""
        SELECT
          (SELECT COUNT(*) FROM orders WHERE o_orderkey > 55000) AS n_tail,
          (SELECT CAST(COALESCE(SUM(CAST(o_custkey AS BIGINT)), 0) AS BIGINT) FROM orders WHERE o_orderkey > 55000) AS sum_tail_cust,
          (SELECT COUNT(*) FROM orders WHERE o_orderkey <= 1000) AS n_head
      """)) { (spark, dir) =>
      import spark.implicits._
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-file-prune").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable("orders_zoned", t.orders.repartitionByRange(4, col("o_orderkey")))
      cat.analyzeTable("orders_zoned", fileStats = true)
      val tail = cat.readTableWhere("orders_zoned", "o_orderkey", ">", "55000")
      val nTail = tail.count()
      val sumTail = tail.agg(coalesce(sum(col("o_custkey").cast("long")), lit(0L))).head().getLong(0)
      val nHead = cat.readTableWhere("orders_zoned", "o_orderkey", "<=", "1000").count()
      Seq((nTail, sumTail, nHead)).toDF("n_tail", "sum_tail_cust", "n_head")
    },

    // ----------------------------------- conjunct prune over a Z layout
    // The 2-D composition: orders Z-clustered on (custkey, orderkey), zone
    // maps published, then a 2-D range predicate read through
    // readTableWhereAll — each conjunct prunes its own axis and the scan
    // plans only files neither axis excludes (PlanSpec pins the composed
    // file counts; this row pins that composed pruning NEVER changes
    // results, hashing the counts against DuckDB over all rows).
    Q(
      "catalog_conj_prune",
      Some("""
        SELECT
          (SELECT COUNT(*) FROM orders WHERE o_custkey <= 100 AND o_orderkey <= 3000) AS n_both,
          (SELECT CAST(COALESCE(SUM(CAST(o_orderkey AS BIGINT)), 0) AS BIGINT)
           FROM orders WHERE o_custkey <= 100 AND o_orderkey <= 3000) AS sum_keys
      """)) { (spark, dir) =>
      import spark.implicits._
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-conj-prune").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable("orders_z2", graft.sources.Sinks.zOrdered(t.orders, "o_custkey", "o_orderkey", files = 8))
      cat.analyzeTable("orders_z2", fileStats = true)
      val both = cat.readTableWhereAll(
        "orders_z2", Seq(("o_custkey", "<=", "100"), ("o_orderkey", "<=", "3000")))
      val n = both.count()
      val s = both.agg(coalesce(sum(col("o_orderkey").cast("long")), lit(0L))).head().getLong(0)
      Seq((n, s)).toDF("n_both", "sum_keys")
    },

    // -------------------------------------------- bucketed co-located join
    // Persisted co-location: both sides bucketed on the join key at PUT
    // time, so the join needs NO exchange — the scans themselves satisfy
    // the join's distribution — and the follow-up groupBy on the same key
    // aggregates exchange-free too (BucketedJoinSpec pins the zero-Exchange
    // plan). This row pins that the shuffle-free plan returns EXACTLY the
    // plain join's rows (oracle = the ordinary join in DuckDB). At 100 TB
    // this is the daily-join amortization: one bucketed write, then every
    // subsequent join on that key skips the fact-table shuffle.
    Q(
      "catalog_bucketed_join",
      Some("""
        SELECT o_orderkey, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderkey
      """)) { (spark, dir) =>
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-bucket-join").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putBucketedTable(
        "ord_b",
        t.orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")),
        "o_orderkey",
        8)
      cat.putBucketedTable(
        "li_b",
        t.lineitem.select(col("l_orderkey"), col("l_extendedprice")),
        "l_orderkey",
        8)
      cat.readBucketedTable("ord_b")
        .join(cat.readBucketedTable("li_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(
          count(lit(1)).as("n_items"),
          asDouble(sum(money(col("l_extendedprice")))).as("sum_price"))
    },

    // -------------------------------- 3-conjunct prune over a 3-D Z layout
    // The N-dimensional composition: orders Z-clustered on THREE axes
    // (custkey, orderkey, totalprice — the (tenant, key, measure) shape),
    // zone maps published, a 3-conjunct range read through
    // readTableWhereAll. Each conjunct prunes its own axis; a 2-D curve
    // would leave the third axis unclustered and its conjunct pruning
    // nothing. Oracle = the same conjunction over all rows, so a wrong
    // interleave or a bad scale fold changes results and hash-mismatches
    // (SinksSpec pins the file-count win over the unordered layout).
    Q(
      "catalog_conj3_prune",
      Some("""
        SELECT
          (SELECT COUNT(*) FROM orders
           WHERE o_custkey <= 100 AND o_orderkey <= 3000 AND o_totalprice <= 100000) AS n_box,
          (SELECT CAST(COALESCE(SUM(CAST(o_orderkey AS BIGINT)), 0) AS BIGINT)
           FROM orders
           WHERE o_custkey <= 100 AND o_orderkey <= 3000 AND o_totalprice <= 100000) AS sum_keys
      """)) { (spark, dir) =>
      import spark.implicits._
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-conj3-prune").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable(
        "orders_z3",
        graft.sources.Sinks.zOrderedN(t.orders, Seq("o_custkey", "o_orderkey", "o_totalprice"), files = 8))
      cat.analyzeTable("orders_z3", fileStats = true)
      val box = cat.readTableWhereAll(
        "orders_z3",
        Seq(("o_custkey", "<=", "100"), ("o_orderkey", "<=", "3000"), ("o_totalprice", "<=", "100000")))
      val n = box.count()
      val s = box.agg(coalesce(sum(col("o_orderkey").cast("long")), lit(0L))).head().getLong(0)
      Seq((n, s)).toDF("n_box", "sum_keys")
    },

    // ------------------------------------------- append + targeted delete
    // The mutation lifecycle end-to-end: PUT half the table, APPEND the
    // other half (O(delta) — a manifest referencing the old files plus the
    // new generation, no rewrite), re-ANALYZE, then a zone-map-TARGETED
    // deleteWhere (only files whose [min,max] can contain matching rows are
    // rewritten; the custkey-range layout makes most files provably
    // unaffected) and a VACUUM of the unreferenced blobs. The oracle is the
    // equivalent end state in DuckDB — append∪put minus the deleted range —
    // so a wrong manifest, a lost file, a GC bite, or a delete touching the
    // wrong rows all hash-mismatch. MutationSpec pins the mechanics
    // (O(delta) append, untouched-file reuse, NULL survivors, time travel,
    // vacuum refcounting).
    Q(
      "catalog_append_delete",
      Some("""
        SELECT COUNT(*) AS n_rows,
               CAST(COALESCE(SUM(CAST(o_orderkey AS BIGINT)), 0) AS BIGINT) AS sum_keys
        FROM orders WHERE o_custkey > 500
      """)) { (spark, dir) =>
      import spark.implicits._
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-append-del").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable("orders_m", t.orders.filter(col("o_orderkey") <= 30000).repartitionByRange(4, col("o_custkey")))
      cat.appendTable("orders_m", t.orders.filter(col("o_orderkey") > 30000).repartitionByRange(4, col("o_custkey")))
      cat.analyzeTable("orders_m", fileStats = true)
      cat.deleteWhere("orders_m", "o_custkey", "<=", "500")
      cat.vacuum("orders_m")
      val res = cat.readTable("orders_m")
      val n   = res.count()
      val s   = res.agg(coalesce(sum(col("o_orderkey").cast("long")), lit(0L))).head().getLong(0)
      Seq((n, s)).toDF("n_rows", "sum_keys")
    },

    // ------------------------------ schema-evolving append (ADD COLUMN)
    // The other mutation verb a lakehouse needs: append a frame carrying a
    // NEW column; pre-evolution files serve NULL for it with zero rewrite
    // (the manifest's explicit schema widens, and path-list reads fill the
    // missing column). The oracle rebuilds the same two-epoch table in
    // SQL — a dropped old row, a rewritten base file, or a NULL that
    // became a default all hash-mismatch. Exact-decimal money discipline
    // on the evolved column's aggregate.
    Q(
      "catalog_schema_evolve",
      Some("""
        SELECT COUNT(*) AS n_rows,
               COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS n_evolved,
               CAST(SUM(CASE WHEN o_orderkey % 2 = 1
                             THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_price
        FROM orders
      """)) { (spark, dir) =>
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-evolve").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable(
        "orders_e",
        t.orders.filter(col("o_orderkey") % 2 === 0).select(col("o_orderkey"), col("o_custkey")))
      cat.appendTableEvolve(
        "orders_e",
        t.orders
          .filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")))
      cat.readTable("orders_e").agg(
        count(lit(1)).as("n_rows"),
        count(col("o_totalprice")).as("n_evolved"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_price"))
    },

    // ------------------------------------- shallow time travel, oracled
    // readTableVersion under the full gate: PUT (v1, two columns) →
    // APPEND (v2) → schema-evolving APPEND (v3 adds o_totalprice) — the
    // GC retains v1 alive because v2's manifest still references its
    // files, so the FIRST version stays readable across two manifest
    // publishes and a schema evolution. The row reads v_first (must be
    // exactly the original put: no appended rows, no evolved column) next
    // to the latest version; the oracle rebuilds both epochs in SQL, so
    // a version read that leaks newer files, loses the old schema, or
    // resolves the wrong snapshot hash-mismatches. Version ids come from
    // versions() (monotonic via the commit high-water mark), never from
    // hardcoded numbering.
    Q(
      "catalog_time_travel",
      Some("""
        SELECT
          (SELECT COUNT(*) FROM orders WHERE o_orderkey % 4 = 0) AS n_v1,
          (SELECT CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT)
           FROM orders WHERE o_orderkey % 4 = 0) AS sum_keys_v1,
          (SELECT COUNT(*) FROM orders) AS n_latest,
          (SELECT COUNT(*) FROM orders WHERE o_orderkey % 4 IN (2, 3)) AS n_evolved,
          (SELECT CAST(SUM(CASE WHEN o_orderkey % 4 IN (2, 3)
                                THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
           FROM orders) AS sum_price
      """)) { (spark, dir) =>
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-time-travel").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable(
        "orders_t",
        t.orders.filter(col("o_orderkey") % 4 === 0).select(col("o_orderkey"), col("o_custkey")))
      cat.appendTable(
        "orders_t",
        t.orders.filter(col("o_orderkey") % 4 === 1).select(col("o_orderkey"), col("o_custkey")))
      cat.appendTableEvolve(
        "orders_t",
        t.orders
          .filter(col("o_orderkey") % 4 >= 2)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")))
      val vFirst = cat.versions("orders_t").min
      val first  = cat.readTableVersion("orders_t", vFirst)
      val a = first.agg(
        count(lit(1)).as("n_v1"),
        sum(col("o_orderkey").cast("long")).as("sum_keys_v1"))
      val b = cat.readTable("orders_t").agg(
        count(lit(1)).as("n_latest"),
        count(col("o_totalprice")).as("n_evolved"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_price"))
      a.crossJoin(b) // both sides are single-row aggregates — scalar join
    },

    // --------------------- partitioned-table mutation lifecycle
    // The date-partitioned-ingest pattern every 100-TB lakehouse runs:
    // hive-layout PUT (directory per o_orderpriority), APPEND (the delta
    // generation keeps the layout — its partition values live in ITS
    // directory names), targeted DELETE (survivor rewrite keeps the
    // layout), small-file COMPACTION (packs within the layout), then a
    // partition-pruned stats read. Every step once either truncated or
    // NULLed the partition column on partitioned tables (flat listing /
    // bare path-list reads); the oracle — the same per-priority rollup
    // over the surviving rows — hash-catches any of those regressions.
    Q(
      "catalog_partitioned_lifecycle",
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS sum_keys
        FROM orders
        WHERE o_orderkey % 3 IN (0, 1) AND NOT (o_custkey <= 20)
        GROUP BY 1
      """)) { (spark, dir) =>
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-part-life").toString
      val cat  = new graft.sources.Catalog(spark, root)
      // ingest batches arrive coalesced (a partitionBy write fans out one
      // file per task per partition value — 32 tasks × 5 priorities would
      // spray 160 shards per write; 4 tasks is the honest batch shape)
      cat.putPartitionedTable(
        "orders_p",
        t.orders.filter(col("o_orderkey") % 3 === 0).repartition(4, col("o_orderkey")),
        "o_orderpriority")
      cat.appendTable(
        "orders_p", t.orders.filter(col("o_orderkey") % 3 === 1).repartition(4, col("o_orderkey")))
      // threshold 20, not an sf0.1-sized absolute: TPC-H custkeys only
      // reach ~150 at sf0.001, so a larger constant deletes 100% of rows
      // at the smoke scale and the non-empty invariant fires — the delete
      // must stay non-degenerate at EVERY supported sf
      cat.deleteWhere("orders_p", "o_custkey", "<=", "20")
      cat.compactSmallFiles("orders_p", smallBytes = 64L << 20, targetBytes = 64L << 20)
      cat.analyzeTable("orders_p", fileStats = true)
      // the final read exercises the partition-pruned path-list plan
      cat.readTable("orders_p")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey").cast("long")).as("sum_keys"))
    },

    // ------------------------------------------------- UPSERT (MERGE)
    // The UPDATE verb under the gate: PUT the even-key half, then one
    // MERGE batch that UPDATES every key ≡ 0 (mod 4) (price doubled —
    // whole-row replacement) and INSERTS every key ≡ 1 (mod 4) (new
    // rows, also at doubled price). The oracle rebuilds the exact end
    // state — original rows for keys ≡ 2 (mod 4), doubled rows for the
    // merged keys — so a lost replacement (old row survives), a double
    // apply, a dropped insert, or a key matched by position instead of
    // value all hash-mismatch. ×2 is exact in binary FP, so the doubled
    // price is bit-identical on both engines; sums run through DECIMAL.
    Q(
      "catalog_upsert",
      Some("""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS sum_keys,
               CAST(SUM(CASE WHEN o_orderkey % 4 IN (0, 1)
                             THEN CAST(o_totalprice * 2 AS DECIMAL(18,2))
                             ELSE CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_price
        FROM orders
        WHERE o_orderkey % 2 = 0 OR o_orderkey % 4 = 1
      """)) { (spark, dir) =>
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-upsert").toString
      val cat  = new graft.sources.Catalog(spark, root)
      val base = t.orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      cat.putTable(
        "orders_m2", base.filter(col("o_orderkey") % 2 === 0).repartitionByRange(4, col("o_orderkey")))
      val updates = base
        .filter(col("o_orderkey") % 4 <= 1)
        .select(col("o_orderkey"), col("o_custkey"), (col("o_totalprice") * 2).as("o_totalprice"))
      cat.upsertTable("orders_m2", updates, "o_orderkey")
      cat.readTable("orders_m2").agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_orderkey").cast("long")).as("sum_keys"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_price"))
    },

    // ----------------------------- NESTED (multi-level) hive partitioning
    // Two directory levels (priority/status) with the full mutation story
    // on top: hive PUT by BOTH columns, APPEND keeping the nested layout
    // (the delta generation's files carry both partition values in their
    // own directory names). The rollup groups by both partition columns,
    // so a NULLed or truncated level anywhere — the classic flat-listing
    // or wrong-basePath regression, now across two levels — changes the
    // group keys and hash-mismatches.
    Q(
      "catalog_partitioned_nested",
      Some("""
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS sum_keys
        FROM orders
        GROUP BY 1, 2
      """)) { (spark, dir) =>
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-part-nested").toString
      val cat  = new graft.sources.Catalog(spark, root)
      val base = t.orders.select(
        col("o_orderkey"), col("o_custkey"), col("o_orderpriority"), col("o_orderstatus"))
      // coalesced ingest batches, same honest shape as the 1-level row
      // (fan-out here is 5 priorities × 3 statuses = 15 dirs per batch)
      cat.putPartitionedTableBy(
        "orders_n",
        base.filter(col("o_orderkey") % 2 === 0).repartition(4, col("o_orderkey")),
        Seq("o_orderpriority", "o_orderstatus"))
      cat.appendTable(
        "orders_n", base.filter(col("o_orderkey") % 2 === 1).repartition(4, col("o_orderkey")))
      cat.readTable("orders_n")
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey").cast("long")).as("sum_keys"))
    },

    // --------------------------------------------- RESTORE (rollback)
    // The undo verb under the gate: PUT → a bad deleteWhere → restoreTable
    // back to the pre-delete version. The restore is O(metadata) — a new
    // manifest referencing the old version's files, no data motion — and
    // history-preserving: the changefeed across the restore span reports
    // exactly the undone rows flowing back as inserts (n_restored), which
    // the oracle recomputes as the deleted slice. A restore that loses
    // rows, resurrects the delete, or rewrites history hash-mismatches.
    Q(
      "catalog_restore",
      Some("""
        SELECT
          (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0) AS n_rows,
          (SELECT CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT)
           FROM orders WHERE o_orderkey % 2 = 0) AS sum_keys,
          (SELECT COUNT(*) FROM orders
           WHERE o_orderkey % 2 = 0 AND o_custkey <= 20) AS n_restored
      """)) { (spark, dir) =>
      import spark.implicits._
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-restore").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable(
        "orders_r",
        t.orders.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority")))
      val vGood = cat.versions("orders_r").max
      cat.deleteWhere("orders_r", "o_custkey", "<=", "20") // the mistake
      val vBad = cat.versions("orders_r").max
      cat.restoreTable("orders_r", vGood)
      val vNow = cat.versions("orders_r").max
      val nRestored = cat.tableChanges("orders_r", vBad, vNow)
        .filter(col("_change_type") === "insert").count()
      val r = cat.readTable("orders_r")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey").cast("long")).as("s")).head()
      Seq((r.getLong(0), r.getLong(1), nRestored)).toDF("n_rows", "sum_keys", "n_restored")
    },

    // ------------------------------------------------ CHANGEFEED (CDC)
    // tableChanges under the gate: the row-level diff between retained
    // versions, computed from the manifest FILE diff (O(changed files),
    // never O(table)). Three spans, each a different mutation verb:
    // append (inserts = the delta, zero deletes), deleteWhere (deletes =
    // the removed rows, zero inserts), and COMPACTION — whose span must
    // be EMPTY both ways (file churn is not data change; the invariance
    // falls out of the multiset algebra, and this row hash-pins it).
    // Span scalars collect eagerly IN ORDER because the version-retention
    // window slides as mutations publish — the changefeed contract is
    // "diff retained versions", not "diff arbitrary history".
    Q(
      "catalog_changefeed",
      Some("""
        SELECT
          (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 1) AS n_ins_append,
          (SELECT CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT)
           FROM orders WHERE o_orderkey % 3 = 1) AS sum_ins_keys,
          CAST(0 AS BIGINT) AS n_del_append,
          (SELECT COUNT(*) FROM orders
           WHERE o_orderkey % 3 IN (0, 1) AND o_custkey <= 20) AS n_del_delete,
          (SELECT CAST(COALESCE(SUM(CAST(o_orderkey AS BIGINT)), 0) AS BIGINT)
           FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_custkey <= 20) AS sum_del_keys,
          CAST(0 AS BIGINT) AS n_ins_delete,
          CAST(0 AS BIGINT) AS n_changes_compact
      """)) { (spark, dir) =>
      import spark.implicits._
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-changefeed").toString
      val cat  = new graft.sources.Catalog(spark, root)
      val base = t.orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      cat.putTable("orders_cf", base.filter(col("o_orderkey") % 3 === 0))
      cat.appendTable("orders_cf", base.filter(col("o_orderkey") % 3 === 1))
      val Seq(v2, v1) = cat.versions("orders_cf").take(2)
      val cf12 = cat.tableChanges("orders_cf", v1, v2)
      val ins12 = cf12.filter(col("_change_type") === "insert")
        .agg(count(lit(1)), coalesce(sum(col("o_orderkey").cast("long")), lit(0L))).head()
      val nDel12 = cf12.filter(col("_change_type") === "delete").count()
      cat.deleteWhere("orders_cf", "o_custkey", "<=", "20")
      val v3 = cat.versions("orders_cf").max
      val cf23 = cat.tableChanges("orders_cf", v2, v3)
      val del23 = cf23.filter(col("_change_type") === "delete")
        .agg(count(lit(1)), coalesce(sum(col("o_orderkey").cast("long")), lit(0L))).head()
      val nIns23 = cf23.filter(col("_change_type") === "insert").count()
      cat.compactSmallFiles("orders_cf", smallBytes = 64L << 20, targetBytes = 64L << 20)
      val v4 = cat.versions("orders_cf").max
      val nCompact = cat.tableChanges("orders_cf", v3, v4).count()
      Seq((ins12.getLong(0), ins12.getLong(1), nDel12, del23.getLong(0), del23.getLong(1), nIns23, nCompact))
        .toDF("n_ins_append", "sum_ins_keys", "n_del_append", "n_del_delete",
          "sum_del_keys", "n_ins_delete", "n_changes_compact")
    },

    // ---------------------- incremental VIEW MAINTENANCE over the feed
    // The payoff query for the changefeed: a downstream aggregate kept
    // current by consuming ONLY changesSince feeds — the initial snapshot
    // plus signed deltas (insert = +1, delete = −1), never a re-read of
    // the base table. Three mutation rounds (append, deleteWhere,
    // compaction — whose feed must contribute NOTHING); the final view is
    // hash-compared to the oracle's full rollup of the end state, so a
    // missed change, a double-counted row, or compaction leaking into the
    // feed all mismatch. The cost model this proves: maintaining the view
    // is O(churn), not O(table) — the difference between viable and
    // non-viable at 100 TB with gigabytes of daily churn.
    Q(
      "catalog_cdc_incr_view",
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS sum_keys
        FROM orders
        WHERE o_orderkey % 3 IN (0, 1) AND NOT (o_custkey <= 20)
        GROUP BY 1
      """)) { (spark, dir) =>
      import spark.implicits._
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-cdc-view").toString
      val cat  = new graft.sources.Catalog(spark, root)
      val base = t.orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      cat.putTable("orders_v", base.filter(col("o_orderkey") % 3 === 0))
      // the consumer's VIEW STATE is view-sized (one row per priority) and
      // each poll folds a churn-sized delta into it, materialized at poll
      // time — both because that IS incremental maintenance's cost model
      // and because a feed is a snapshot over the retention window (hold
      // it lazily across later mutations and the window slides past it)
      def deltaOf(rows: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] = rows
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(col("__sign")).as("dn"),
          sum(col("__sign") * col("o_orderkey").cast("long")).as("dk"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      // bootstrap: the one full read the consumer ever does
      var state  = deltaOf(cat.readTable("orders_v").withColumn("__sign", lit(1L)))
      var cursor = cat.versions("orders_v").max
      def poll(): Unit = {
        val (cur, feed) = cat.changesSince("orders_v", cursor)
        cursor = cur
        val d = deltaOf(feed.withColumn(
          "__sign", when(col("_change_type") === "insert", 1L).otherwise(-1L)))
        state = (state.keySet ++ d.keySet).map { k =>
          val (n0, s0) = state.getOrElse(k, (0L, 0L))
          val (dn, ds) = d.getOrElse(k, (0L, 0L))
          k -> ((n0 + dn, s0 + ds))
        }.toMap
      }
      cat.appendTable("orders_v", base.filter(col("o_orderkey") % 3 === 1))
      poll()
      cat.deleteWhere("orders_v", "o_custkey", "<=", "20")
      poll()
      cat.compactSmallFiles("orders_v", smallBytes = 64L << 20, targetBytes = 64L << 20)
      poll() // must contribute nothing — compaction is not churn
      state.toSeq
        .collect { case (k, (n, s)) if n > 0 => (k, n, s) }
        .toDF("o_orderpriority", "n", "sum_keys")
    },

    // ------------------------------------------- expectation-gated ingest
    // The write-path data-quality gate: PUT a curated base, then ONE
    // appendTableExpect of a raw batch under two declared rules — clean
    // rows land in the table, violators land in the quarantine with the
    // rules they broke. The oracle rebuilds both end states and the
    // per-rule counts from the same predicates, so a leaked dirty row, a
    // dropped clean row, a wrong rule attribution, or a double-counted
    // violation all hash-mismatch. NULL-free columns by TPC-H
    // construction, so ANSI CHECK null semantics don't bite here.
    Q(
      "catalog_expectations",
      Some("""
        SELECT
          (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0
             OR (o_orderkey % 3 = 1 AND o_totalprice <= 300000
                 AND o_orderpriority <> '1-URGENT')) AS n_main,
          (SELECT CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) FROM orders
           WHERE o_orderkey % 3 = 0
             OR (o_orderkey % 3 = 1 AND o_totalprice <= 300000
                 AND o_orderpriority <> '1-URGENT')) AS sum_main,
          (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 1
             AND (o_totalprice > 300000 OR o_orderpriority = '1-URGENT')) AS n_quar,
          (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 1
             AND o_totalprice > 300000) AS n_price_cap,
          (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 1
             AND o_orderpriority = '1-URGENT') AS n_not_urgent
      """)) { (spark, dir) =>
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-expect").toString
      val cat  = new graft.sources.Catalog(spark, root)
      val base = t.orders.select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      cat.putTable("orders_x", base.filter(col("o_orderkey") % 3 === 0).repartition(4))
      val report = cat.appendTableExpect(
        "orders_x",
        base.filter(col("o_orderkey") % 3 === 1).repartition(4),
        Seq(
          "price_cap"  -> "o_totalprice <= 300000",
          "not_urgent" -> "o_orderpriority <> '1-URGENT'"))
      val main = cat.readTable("orders_x").agg(
        count(lit(1)).as("n_main"),
        sum(col("o_orderkey").cast("long")).as("sum_main"))
      val quar = cat.quarantineOf("orders_x").agg(count(lit(1)).as("n_quar"))
      val rep = report.agg(
        sum(when(col("rule") === "price_cap", col("n_violations"))).as("n_price_cap"),
        sum(when(col("rule") === "not_urgent", col("n_violations"))).as("n_not_urgent"))
      main.crossJoin(quar).crossJoin(rep) // three single-row aggregates — scalar joins
    },

    // ----------------------------------- value-Bloom point-lookup pruning
    // The needle-in-100-TB read: three append generations (so the table is
    // many files), per-file value Blooms on the probe column built in one
    // scan + one O(delta) incremental refresh, then an IN-list lookup that
    // reads ONLY Bloom-candidate files. Exact by construction (no Bloom
    // false negatives; survivors re-filtered) — the oracle is the plain
    // IN-list over all of orders, so a wrongly-pruned file (lost rows) or
    // a stale-stamp read hash-mismatches. CatalogSpec asserts the prune
    // ratio on a controlled fixture; here the gate asserts exactness.
    Q(
      "catalog_bloom_lookup",
      Some("""
        SELECT o_custkey, COUNT(*) AS n,
               CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS sum_keys
        FROM orders
        WHERE o_custkey IN (1, 2, 4, 5, 7, 8, 10, 11)
        GROUP BY 1
      """)) { (spark, dir) =>
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-bloom-lookup").toString
      val cat  = new graft.sources.Catalog(spark, root)
      val base = t.orders.select(col("o_orderkey"), col("o_custkey"))
      cat.putTable(
        "orders_bl", base.filter(col("o_orderkey") % 3 === 0).repartitionByRange(4, col("o_custkey")))
      cat.appendTable(
        "orders_bl", base.filter(col("o_orderkey") % 3 === 1).repartitionByRange(4, col("o_custkey")))
      cat.analyzeBloomIndex("orders_bl", Seq("o_custkey"))
      cat.appendTable(
        "orders_bl", base.filter(col("o_orderkey") % 3 === 2).repartitionByRange(4, col("o_custkey")))
      cat.analyzeBloomIndexAppended("orders_bl") // only the third generation scans
      cat
        .readTableLookupIn("orders_bl", "o_custkey", Seq(1, 2, 4, 5, 7, 8, 10, 11))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey").cast("long")).as("sum_keys"))
    },

    // ----------------------------------------------- zero-copy shallow clone
    // CREATE TABLE dev SHALLOW CLONE prod, then diverge BOTH sides: append
    // new rows to the clone, delete + compact + vacuum the source. The
    // clone's manifest references the source's files, so the source-side
    // publish GC and vacuum run with cross-table protection — without it,
    // the clone silently truncates to its divergence delta (the bug class
    // this verb exists to prevent), and the clone-side rollup
    // hash-mismatches. Source-side rollup catches the reverse leak (the
    // clone's append must never reach the source).
    Q(
      "catalog_clone",
      Some("""
        SELECT
          (SELECT COUNT(*) FROM orders
           WHERE o_orderkey % 2 = 0 AND NOT (o_custkey <= 20)) AS n_src,
          (SELECT CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) FROM orders
           WHERE o_orderkey % 2 = 0 AND NOT (o_custkey <= 20)) AS sum_src,
          (SELECT COUNT(*) FROM orders
           WHERE o_orderkey % 2 = 0 OR o_orderkey % 4 = 1) AS n_clone,
          (SELECT CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) FROM orders
           WHERE o_orderkey % 2 = 0 OR o_orderkey % 4 = 1) AS sum_clone
      """)) { (spark, dir) =>
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-clone").toString
      val cat  = new graft.sources.Catalog(spark, root)
      val base = t.orders.select(col("o_orderkey"), col("o_custkey"))
      cat.putTable(
        "orders_prod", base.filter(col("o_orderkey") % 2 === 0).repartitionByRange(4, col("o_orderkey")))
      cat.cloneTable("orders_prod", "orders_dev")
      // clone-side divergence: new rows the source must never see
      cat.appendTable("orders_dev", base.filter(col("o_orderkey") % 4 === 1))
      // source-side divergence + GC pressure: the delete republishes (the
      // clone-shared base version leaves the source's own retained window),
      // compaction publishes again, vacuum sweeps the blob area — the
      // clone survives all three only through the back-reference protection
      cat.deleteWhere("orders_prod", "o_custkey", "<=", "20")
      cat.compactSmallFiles("orders_prod", smallBytes = 64L << 20, targetBytes = 64L << 20)
      cat.vacuum("orders_prod")
      val src = cat.readTable("orders_prod").agg(
        count(lit(1)).as("n_src"),
        sum(col("o_orderkey").cast("long")).as("sum_src"))
      val dev = cat.readTable("orders_dev").agg(
        count(lit(1)).as("n_clone"),
        sum(col("o_orderkey").cast("long")).as("sum_clone"))
      src.crossJoin(dev) // both sides single-row aggregates — scalar join
    },

    // ------------------------------------- merge-on-read DELETE (vectors)
    // The scattered-delete shape CoW gets wrong at 100 TB: tombstoned keys
    // hit every file, so deleteWhere would rewrite the corpus while
    // deleteByKeys publishes ONE metadata version (same file list + a
    // broadcast-sized deletion vector) and every reader — live, pruned,
    // changefeed — serves effective rows. The row then appends under the
    // vector (carry + no resurrect), audits the DV span through the
    // changefeed, folds the vector with mergeDeletes, and asserts the
    // merge was invisible (n_after) AND churn-free in the feed
    // (n_merge_feed = 0). Oracle rebuilds every scalar from predicates.
    Q(
      "catalog_mor_delete",
      Some("""
        SELECT
          (SELECT COUNT(*) FROM orders
           WHERE (o_orderkey % 2 = 0 AND NOT o_orderkey % 13 = 7) OR o_orderkey % 2 = 1) AS n_live,
          (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders
           WHERE (o_orderkey % 2 = 0 AND NOT o_orderkey % 13 = 7) OR o_orderkey % 2 = 1) AS sum_price,
          (SELECT COUNT(*) FROM orders
           WHERE o_orderkey % 2 = 0 AND o_orderkey % 13 = 7) AS n_deleted,
          CAST(0 AS BIGINT) AS n_merge_feed,
          (SELECT COUNT(*) FROM orders
           WHERE (o_orderkey % 2 = 0 AND NOT o_orderkey % 13 = 7) OR o_orderkey % 2 = 1) AS n_after
      """)) { (spark, dir) =>
      import spark.implicits._
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-mor").toString
      val cat  = new graft.sources.Catalog(spark, root)
      val base = t.orders.select(col("o_orderkey"), col("o_totalprice"))
      cat.putTable(
        "orders_mor", base.filter(col("o_orderkey") % 2 === 0).repartitionByRange(4, col("o_orderkey")))
      val vPut = cat.versions("orders_mor").max
      // GDPR-shaped delete: keys ≡ 7 (mod 13) are scattered across every
      // range file — the CoW-worst case, O(tombstones) here
      cat.deleteByKeys(
        "orders_mor",
        base.filter(col("o_orderkey") % 2 === 0 && col("o_orderkey") % 13 === 7)
          .select(col("o_orderkey")))
      val vDv = cat.versions("orders_mor").max
      val nDeleted = cat.tableChanges("orders_mor", vPut, vDv)
        .filter(col("_change_type") === "delete").count()
      // ingest continues under the vector (odd keys are never tombstoned)
      cat.appendTable("orders_mor", base.filter(col("o_orderkey") % 2 === 1))
      val preMerge = cat.readTable("orders_mor").agg(
        count(lit(1)).as("n_live"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_price"))
      val vAppend = cat.versions("orders_mor").max
      cat.mergeDeletes("orders_mor")
      val vMerge     = cat.versions("orders_mor").max
      val nMergeFeed = cat.tableChanges("orders_mor", vAppend, vMerge).count()
      val nAfter     = cat.readTable("orders_mor").count()
      preMerge.crossJoin(
        Seq((nDeleted, nMergeFeed, nAfter)).toDF("n_deleted", "n_merge_feed", "n_after"))
    },

    // -------------------------------------------- incremental ANALYZE
    // Append + O(delta) stats refresh + zone-map prune, composed: the
    // appended files are the ONLY ones scanned by analyzeAppended (per-file
    // zone maps merge; IncrementalAnalyzeSpec pins the scan counts), the
    // merged stats restamp to the live version, and readTableWhere prunes
    // through them immediately — no O(table) re-ANALYZE between ingest and
    // indexed reads. Oracle = the same range counts over all rows, so a
    // wrong merge (bad min/max fold, lost file, stale stamp) changes
    // results and hash-mismatches.
    Q(
      "catalog_incr_analyze",
      Some("""
        SELECT
          (SELECT COUNT(*) FROM orders WHERE o_orderkey <= 1000) AS n_head,
          (SELECT COUNT(*) FROM orders WHERE o_orderkey > 55000) AS n_tail,
          (SELECT CAST(COALESCE(SUM(CAST(o_custkey AS BIGINT)), 0) AS BIGINT)
           FROM orders WHERE o_orderkey > 55000) AS sum_tail
      """)) { (spark, dir) =>
      import spark.implicits._
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-incr-analyze").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable("orders_i", t.orders.filter(col("o_orderkey") <= 30000).repartitionByRange(4, col("o_orderkey")))
      cat.analyzeTable("orders_i", fileStats = true)
      cat.appendTable("orders_i", t.orders.filter(col("o_orderkey") > 30000).repartitionByRange(4, col("o_orderkey")))
      cat.analyzeAppended("orders_i")
      val nHead = cat.readTableWhere("orders_i", "o_orderkey", "<=", "1000").count()
      val tail  = cat.readTableWhere("orders_i", "o_orderkey", ">", "55000")
      val nTail = tail.count()
      val sTail = tail.agg(coalesce(sum(col("o_custkey").cast("long")), lit(0L))).head().getLong(0)
      Seq((nHead, nTail, sTail)).toDF("n_head", "n_tail", "sum_tail")
    },

    // ------------------------------------------------- sampled approx agg
    // The AQP tier: analyzeSample publishes a deterministic md5-hash 1/16
    // slice of the table (version-stamped like every stats tier), and
    // approxAgg answers grouped COUNT/SUM from ONLY that slice, scaled by
    // the exact integer factor — sample cost instead of corpus cost, and
    // bit-reproducible (the oracle applies the SAME portable hash filter
    // and scaling in DuckDB, so a biased sample, wrong scale, or stale
    // stamp hash-mismatches). At 100 TB this is the "answer in seconds
    // from the pre-materialized slice" exploratory path.
    Q(
      "catalog_approx_agg",
      Some("""
        SELECT o_orderpriority,
               CAST(COUNT(*) * 16 AS BIGINT) AS n_est,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 16 AS DECIMAL(38,2)) AS DOUBLE) AS sum_est
        FROM orders
        WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) < '1'
        GROUP BY o_orderpriority
      """)) { (spark, dir) =>
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-approx-agg").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable("orders_s", t.orders)
      cat.analyzeSample("orders_s", "o_orderkey")
      cat.approxAgg("orders_s", "o_orderpriority", "o_totalprice")
    },

    // ------------------------------------------ incremental sample tier
    // The sample tier's O(delta) refresh: hash-sample membership is a pure
    // row property, so the sample of (base ∪ delta) is the union of their
    // samples — analyzeSampleIncremental scans ONLY the appended files and
    // carries the prior sampled rows verbatim (sound for pure appends;
    // anything that rewrote a covered file refuses loudly —
    // SampleTierSpec). The oracle is the SAME full-sample estimate over
    // all rows, so hash-identity proves the O(delta) refresh changes
    // nothing.
    Q(
      "catalog_approx_incr",
      Some("""
        SELECT o_orderpriority,
               CAST(COUNT(*) * 16 AS BIGINT) AS n_est,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 16 AS DECIMAL(38,2)) AS DOUBLE) AS sum_est
        FROM orders
        WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) < '1'
        GROUP BY o_orderpriority
      """)) { (spark, dir) =>
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-approx-incr").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable("orders_si", t.orders.filter(col("o_orderkey") <= 30000))
      cat.analyzeSample("orders_si", "o_orderkey")
      cat.appendTable("orders_si", t.orders.filter(col("o_orderkey") > 30000))
      cat.analyzeSampleIncremental("orders_si")
      cat.approxAgg("orders_si", "o_orderpriority", "o_totalprice")
    },

    // --------------------------------------------- partial compaction
    // Manifest-aware OPTIMIZE: a 16-way tiny-file PUT (the streaming-append
    // pathology) bin-packed by compactSmallFiles, which rewrites ONLY the
    // small files and re-references everything else. The oracle is the
    // full-table count/sum, so a row lost or duplicated in the repack
    // hash-mismatches. MutationSpec pins the mechanics (large files
    // re-referenced verbatim, no-op below 2 small files, O(delta) stats
    // refresh over the packed outputs).
    Q(
      "catalog_pack_small",
      Some("""
        SELECT COUNT(*) AS n_rows,
               CAST(COALESCE(SUM(CAST(o_orderkey AS BIGINT)), 0) AS BIGINT) AS sum_keys
        FROM orders
      """)) { (spark, dir) =>
      import spark.implicits._
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-pack-small").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable("orders_p", t.orders.repartition(16))
      cat.compactSmallFiles("orders_p", smallBytes = 1L << 30, targetBytes = 1L << 30)
      val res = cat.readTable("orders_p")
      val n   = res.count()
      val s   = res.agg(coalesce(sum(col("o_orderkey").cast("long")), lit(0L))).head().getLong(0)
      Seq((n, s)).toDF("n_rows", "sum_keys")
    },

    // ------------------------------------------- storage lifecycle e2e
    // The composed mutation lifecycle, hash-checked end to end: PUT a
    // third of the table, APPEND the rest in two exactly-once batches,
    // full ANALYZE, a targeted DELETE, an O(delta) analyzeAppended (it
    // doubles as the post-delete refresh — untouched files inherit their
    // zone maps, only the rewrite generation scans), small-file
    // compaction, another O(delta) refresh, VACUUM, then two zone-map-
    // pruned reads plus the full count/sum. Any step corrupting a row,
    // losing a file, or pruning wrongly hash-mismatches the DuckDB end
    // state. This is the row that says the storage engine's pieces
    // compose, not just pass alone.
    Q(
      "catalog_lifecycle_e2e",
      Some("""
        SELECT
          (SELECT COUNT(*) FROM orders WHERE o_custkey > 30) AS n_rows,
          (SELECT CAST(COALESCE(SUM(CAST(o_orderkey AS BIGINT)), 0) AS BIGINT)
           FROM orders WHERE o_custkey > 30) AS sum_keys,
          (SELECT COUNT(*) FROM orders WHERE o_custkey > 30 AND o_orderkey <= 1000) AS n_head,
          (SELECT COUNT(*) FROM orders WHERE o_custkey > 30 AND o_orderkey > 55000) AS n_tail
      """)) { (spark, dir) =>
      import spark.implicits._
      val t    = Tables(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-lifecycle").toString
      val cat  = new graft.sources.Catalog(spark, root)
      cat.putTable("orders_l", t.orders.filter(col("o_orderkey") <= 20000).repartitionByRange(3, col("o_orderkey")))
      cat.appendTableExactlyOnce(
        "orders_l",
        t.orders.filter(col("o_orderkey") > 20000 && col("o_orderkey") <= 40000)
          .repartitionByRange(3, col("o_orderkey")),
        0L)
      cat.appendTableExactlyOnce(
        "orders_l",
        t.orders.filter(col("o_orderkey") > 40000).repartitionByRange(3, col("o_orderkey")),
        1L)
      cat.analyzeTable("orders_l", fileStats = true)
      cat.deleteWhere("orders_l", "o_custkey", "<=", "30")
      cat.analyzeAppended("orders_l")
      cat.compactSmallFiles("orders_l", smallBytes = 256L << 10, targetBytes = 1L << 20)
      cat.analyzeAppended("orders_l")
      cat.vacuum("orders_l")
      val all   = cat.readTable("orders_l")
      val nRows = all.count()
      val sKeys = all.agg(coalesce(sum(col("o_orderkey").cast("long")), lit(0L))).head().getLong(0)
      val nHead = cat.readTableWhere("orders_l", "o_orderkey", "<=", "1000").count()
      val nTail = cat.readTableWhere("orders_l", "o_orderkey", ">", "55000").count()
      Seq((nRows, sKeys, nHead, nTail)).toDF("n_rows", "sum_keys", "n_head", "n_tail")
    },

    // ---------------------------------------------------------- semi join
    // EXISTS: customers that placed an order in 1995. Broadcast the DISTINCT
    // keys of the filtered side when small; left_semi never duplicates rows.
    Q(
      "join_semi_active_customers",
      Some("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (
          SELECT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val active = t.orders.filter(
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      t.customer
        .join(active, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    },

    // ---------------------------------------------------------- anti join
    // NOT EXISTS: customers with no order since 2000 (non-empty at every SF,
    // unlike "no orders at all" — the corpus gives every customer orders).
    Q(
      "join_anti_idle_customers",
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer
        .join(
          t.orders.filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },

    // ---------------------------------------------- runtime-filter join
    // Semi-join reduction: the selective predicate lives on orders, so a
    // plain plan shuffles ALL of lineitem to meet the 1%-ish surviving
    // build rows. bloomReducedJoin summarizes the surviving o_orderkey set
    // into a 1 MiB Bloom and drops non-matching lineitem rows at the scan,
    // BEFORE the shuffle; the join then removes Bloom false positives, so
    // the result is exact (oracle = the plain join). At 100 TB this is the
    // difference between shuffling the fact table and shuffling its sliver.
    Q(
      "join_bloom_reduce",
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_totalprice > 250000
        GROUP BY o_orderpriority
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      graft.operators.RuntimeFilter
        .bloomReducedJoin(
          t.lineitem.select(col("l_orderkey"), col("l_extendedprice")),
          t.orders.filter(col("o_totalprice") > 250000)
            .select(col("o_orderkey"), col("o_orderpriority")),
          "l_orderkey",
          "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          asDouble(sum(money(col("l_extendedprice")))).as("sum_price"))
    },

    // ------------------------------------------------------------ window
    // Top-3 orders per customer: rank inside the window partition, filter —
    // the scalable top-k-per-group (shuffle by c, no global sort).
    Q(
      "window_topk_per_customer",
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice, rn
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
        WHERE rn <= 3
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t.orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), asDouble(money(col("o_totalprice"))).as("o_totalprice"), col("rn"))
    },

    // Running sum per supplier over ship time. The frame order is made total
    // (shipdate, orderkey, linenumber) so the prefix sums are deterministic;
    // quantities are integral doubles, so sums are exact in both engines.
    Q(
      "window_running_qty",
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               SUM(l_quantity) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        FROM lineitem
        WHERE l_suppkey < 50
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window
        .partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.lineitem
        .filter(col("l_suppkey") < 50)
        .select(
          col("l_suppkey"),
          col("l_orderkey"),
          col("l_linenumber"),
          sum(col("l_quantity")).over(w).as("running_qty"))
    },

    // -------------------------------------------------------- sort/limit
    // Deterministic global top-25 (unique tiebreak) — physical plan is
    // TakeOrderedAndProject: per-partition heap + driver merge of 25 rows,
    // NOT a global sort. That is the 100 TB-safe shape.
    Q(
      "sort_topk_lineitem",
      Some("""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 25
      """)) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(25)
        .select(col("l_orderkey"), col("l_linenumber"), asDouble(money(col("l_extendedprice"))).as("l_extendedprice"))
    },

    // ----------------------------------------------------------- set ops
    Q(
      "set_intersect_custkeys",
      Some("""
        SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      """)) { (spark, dir) =>
      val o = Tables(spark, dir).orders
      def yr(y: Int) = o
        .filter(
          col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
            col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      yr(1995).intersect(yr(1996))
    },
    Q(
      "set_except_custkeys",
      Some("""
        SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      """)) { (spark, dir) =>
      val o = Tables(spark, dir).orders
      def yr(y: Int) = o
        .filter(
          col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
            col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      yr(1995).except(yr(1996))
    },
    Q(
      "set_union_keys",
      Some("""
        SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        UNION
        SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal < 0
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
        .union(t.customer.filter(col("c_acctbal") < 0).select(col("c_custkey").as("k")))
        .distinct()
    },

    // ---------------------------------------------------- rollup / cube
    Q(
      "rollup_flag_status",
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      """)) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
    },
    Q(
      "cube_flag_status",
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      """)) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
    },

    // ------------------------------------------------------ distinct agg
    Q(
      "agg_distinct_parts",
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
      """)) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    },

    // -------------------------------------------------- scalar functions
    // String/math function parity sample (exact ops only — no FP rounding).
    Q(
      "scalar_funcs_part",
      Some("""
        SELECT p_partkey,
               UPPER(p_brand) AS brand_u,
               LOWER(p_type) AS type_l,
               LENGTH(p_name) AS name_len,
               SUBSTR(p_name, 1, 8) AS name_pre,
               CONCAT(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
               ABS(p_size - 25) AS size_dist,
               p_size % 7 AS size_mod
        FROM part WHERE p_size BETWEEN 10 AND 40
      """)) { (spark, dir) =>
      Tables(spark, dir).part
        .filter(col("p_size").between(10, 40))
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          lower(col("p_type")).as("type_l"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 8).as("name_pre"),
          concat(col("p_brand"), lit(":"), col("p_size").cast("string")).as("brand_size"),
          abs(col("p_size") - 25).as("size_dist"),
          (col("p_size") % 7).as("size_mod"))
    },

    // ------------------------------------------------------- date funcs
    Q(
      "date_funcs_orders",
      Some("""
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY 1, 2
      """)) { (spark, dir) =>
      Tables(spark, dir).orders
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), asDouble(sum(money(col("o_totalprice")))).as("sum_price"))
    },

    // ------------------------------------------------------- json funcs
    Q(
      "json_funcs_events",
      Some("""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               COUNT(*) AS n
        FROM events GROUP BY event_type
      """)) { (spark, dir) =>
      Tables(spark, dir).events
        .groupBy(col("event_type"))
        .agg(
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
          count(lit(1)).as("n"))
    },

    // -------------------------------------- pushed-down event time range
    // Tables.eventsBetween filters the RAW nanos long before the timestamp
    // conversion, so the range reaches the parquet scan (PlanSpec asserts
    // PushedFilters) — the partition-pruning analogue for file-level stats.
    Q(
      "events_day_window",
      Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-04 00:00:00'
        GROUP BY event_type
      """)) { (spark, dir) =>
      Tables(spark, dir)
        .eventsBetween("2024-01-02", "2024-01-04")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), asDouble(sum(money(col("value")))).as("sum_value"))
    },

    // ------------------------------------------- time-windowed (events)
    // Batch shape of the streaming tumbling-window aggregation (the same
    // transform runs under readStream in graft.streaming — see EventStreams).
    Q(
      "events_hourly_agg",
      Some("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
      """)) { (spark, dir) =>
      Tables(spark, dir).events
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), asDouble(sum(money(col("value")))).as("sum_value"))
    },

    // ------------------------------------------------- CDC MERGE (upsert)
    // Lakehouse-style MERGE INTO as pure dataflow (operators/Cdc): a delta
    // of updates (keys %10=0, price doubled, status 'U') and inserts
    // (shifted keys, status 'N') applied to orders. Money stays DECIMAL
    // through the merge (exact ×2), cast to double only at the end.
    Q(
      "merge_upsert_orders",
      Some("""
        WITH base AS (SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders),
        upd AS (SELECT o_orderkey, 'U' AS o_orderstatus, price * 2 AS price FROM base WHERE o_orderkey % 10 = 0),
        ins AS (SELECT o_orderkey + 100000000 AS o_orderkey, 'N' AS o_orderstatus, price FROM base WHERE o_orderkey % 100 = 7),
        delta AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
        merged AS (
          SELECT * FROM delta
          UNION ALL
          SELECT b.* FROM base b ANTI JOIN delta d USING (o_orderkey))
        SELECT o_orderkey, o_orderstatus, CAST(price AS DOUBLE) AS o_totalprice FROM merged
      """)) { (spark, dir) =>
      val base = Tables(spark, dir).orders
        .select(col("o_orderkey"), col("o_orderstatus"), money(col("o_totalprice")).as("price"))
      val upd = base
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"), (col("price") * 2).as("price"))
      val ins = base
        .filter(col("o_orderkey") % 100 === 7)
        .select(
          (col("o_orderkey") + 100000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"),
          col("price"))
      graft.operators.Cdc
        .mergeInto(base, upd.unionByName(ins), Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderstatus"), asDouble(col("price")).as("o_totalprice"))
    },

    // -------------------------------------------- CDC tombstone application
    // applyChanges: a change batch carrying upserts AND deletes (keys %7=0
    // tombstoned, %7=3 upserted with doubled price) applied in one pass —
    // the delete half of the CDC contract, oracled directly.
    Q(
      "cdc_apply_changes",
      Some("""
        WITH base AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders),
        delta AS (
          SELECT o_orderkey, price, TRUE AS is_delete FROM base WHERE o_orderkey % 7 = 0
          UNION ALL
          SELECT o_orderkey, price * 2 AS price, FALSE FROM base WHERE o_orderkey % 7 = 3),
        merged AS (
          SELECT o_orderkey, price FROM delta WHERE NOT is_delete
          UNION ALL
          SELECT b.o_orderkey, b.price FROM base b ANTI JOIN delta d USING (o_orderkey))
        SELECT o_orderkey, CAST(price AS DOUBLE) AS o_totalprice FROM merged
      """)) { (spark, dir) =>
      val base = Tables(spark, dir).orders
        .select(col("o_orderkey"), money(col("o_totalprice")).as("price"))
      val dels = base
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("price"), lit(true).as("is_delete"))
      val upds = base
        .filter(col("o_orderkey") % 7 === 3)
        .select(col("o_orderkey"), (col("price") * 2).as("price"), lit(false).as("is_delete"))
      graft.operators.Cdc
        .applyChanges(base, dels.unionByName(upds), Seq("o_orderkey"), "is_delete")
        .select(col("o_orderkey"), asDouble(col("price")).as("o_totalprice"))
    },

    // ------------------------------------ incremental aggregate refresh
    // Materialized-view maintenance: a stored per-status aggregate over
    // pre-1997 orders refreshed by a CDC delta (1997+ inserts, %97 base
    // deletes) WITHOUT rescanning the facts — signed per-key delta fold,
    // one key-sized full-outer merge. The oracle computes the FULL
    // aggregate over the post-change fact set, so the row hash proves the
    // self-maintenance identity refresh(base, Δ) ≡ agg(F ⊖ Δ) exactly
    // (decimal sums — a float sum would break the identity in the ulps).
    Q(
      "cdc_incremental_agg",
      Some("""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        WHERE NOT (o_orderdate < '1997-01-01' AND o_orderkey % 97 = 0)
        GROUP BY o_orderstatus
      """)) { (spark, dir) =>
      val orders = Tables(spark, dir).orders
      val baseFacts = orders.filter(col("o_orderdate") < "1997-01-01")
      val base = baseFacts
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(money(col("o_totalprice"))).as("total"))
      val inserts = orders
        .filter(col("o_orderdate") >= "1997-01-01")
        .select(col("o_orderstatus"), money(col("o_totalprice")).as("total"), lit("I").as("op"))
      val deletes = baseFacts
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderstatus"), money(col("o_totalprice")).as("total"), lit("D").as("op"))
      graft.operators.Cdc
        .incrementalAggRefresh(
          base, inserts.unionByName(deletes),
          keys = Seq("o_orderstatus"), opCol = "op", countCol = "n_orders", sumCols = Seq("total"))
        .select(col("o_orderstatus"), col("n_orders"), asDouble(col("total")).as("total"))
    },

    // -------------------------------------------------- SCD type-2 history
    // Dimension-history tracking (operators/Cdc.scd2Apply): a segment-change
    // delta (keys %5=0; half actually changed, half identical no-ops) closes
    // open versions and opens new ones. The oracle replays the outcome
    // classes directly: unchanged opens pass through, changed keys emit a
    // closed old version + a new open one.
    Q(
      "scd2_customer_segment",
      Some("""
        WITH cur AS (SELECT c_custkey, c_mktsegment AS segment, TIMESTAMP '2023-01-01 00:00:00' AS vf FROM customer),
        d AS (SELECT c_custkey, CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment ELSE 'PROMO' END AS segment,
                     TIMESTAMP '2024-06-01 00:00:00' AS ts
              FROM customer WHERE c_custkey % 5 = 0),
        changed AS (SELECT cur.c_custkey, cur.segment AS old_seg, d.segment AS new_seg, cur.vf, d.ts
                    FROM cur JOIN d USING (c_custkey) WHERE cur.segment <> d.segment)
        SELECT c_custkey, segment, strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
        FROM cur ANTI JOIN changed USING (c_custkey)
        UNION ALL
        SELECT c_custkey, old_seg, strftime(vf, '%Y-%m-%d %H:%M:%S'), strftime(ts, '%Y-%m-%d %H:%M:%S') FROM changed
        UNION ALL
        SELECT c_custkey, new_seg, strftime(ts, '%Y-%m-%d %H:%M:%S'), CAST(NULL AS VARCHAR) FROM changed
      """)) { (spark, dir) =>
      val cust = Tables(spark, dir).customer
      val current = cust.select(
        col("c_custkey"),
        col("c_mktsegment").as("segment"),
        lit("2023-01-01 00:00:00").cast("timestamp").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"))
      val delta = cust
        .filter(col("c_custkey") % 5 === 0)
        .select(
          col("c_custkey"),
          when(col("c_custkey") % 10 === 0, col("c_mktsegment")).otherwise(lit("PROMO")).as("segment"),
          lit("2024-06-01 00:00:00").cast("timestamp").as("ts"))
      graft.operators.Cdc
        .scd2Apply(current, delta, Seq("c_custkey"), "ts")
        .select(
          col("c_custkey"),
          col("segment"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"))
    },

    // ------------------------------------------- outer-join distribution
    // TPC-H Q13 shape: how many customers placed 0, 1, 2, … qualifying
    // orders. The oracle states it as the classic LEFT OUTER JOIN + two
    // aggregates; the Spark plan pre-aggregates orders per custkey FIRST
    // (map-side partial agg shrinks the fact side to one row per customer)
    // so the outer join carries counts, not order rows — at 100 TB the
    // join input is customer-sized on both sides instead of order-sized.
    // TPC-H Q7-style cross-nation trade volume: revenue between every
    // (customer nation, supplier nation) pair by ship year — the
    // multi-join star shape (lineitem x orders x customer x supplier x
    // nation x nation) where both nation sides broadcast and the fact
    // scan carries the money arithmetic. Decimal-exact revenue sums.
    Q(
      "sql_q7_volume",
      Some("""
        SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE n1.n_nationkey < 5 AND n2.n_nationkey < 15
        GROUP BY 1, 2, 3
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val n1 = t.nation.filter(col("n_nationkey") < 5)
        .select(col("n_nationkey").as("ck_nat"), col("n_name").as("cust_nation"))
      val n2 = t.nation.filter(col("n_nationkey") < 15)
        .select(col("n_nationkey").as("sk_nat"), col("n_name").as("supp_nation"))
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("c_nationkey") === col("ck_nat"))
        .join(broadcast(n2), col("s_nationkey") === col("sk_nat"))
        .groupBy(
          col("cust_nation"), col("supp_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(
          asDouble(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))))
            .as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // coalesce(n, 0) restores the zero-order customers the pre-agg form
    // would otherwise lose. Pure integer counts — engine-exact.
    Q(
      "sql_q13_custdist",
      Some("""
        WITH co AS (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
        SELECT c_count, COUNT(*) AS custdist
        FROM co GROUP BY c_count
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val perCust = t.orders
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      t.customer
        .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("n"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }
  )
}
