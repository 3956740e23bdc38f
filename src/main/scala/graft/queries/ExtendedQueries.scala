package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{DataQuality, Features, Funnel, Sketches}
import graft.sources.Tables

/** Second-wave relational coverage: grouping sets, INTERSECT ALL, range
  * joins, value-offset window functions/frames, and a composed
  * corpus-cleaning pipeline (quality gate → dedup → stats in one plan).
  *
  * All of these fill §2e gaps (the reference has no relational surface at
  * all); each is a single declarative plan — Catalyst handles pushdown and
  * the aggregates partial-aggregate map-side.
  */
object ExtendedQueries {

  /** DuckDB replay of [[graft.operators.DataQuality.correlationMatrix]]
    * over the four lineitem numeric columns: 1e-2-grid decimal moments in
    * one pass, then the fixed-order double closed form per pair, round 6
    * — generated so the six pair arms stay mechanically identical. */
  private def correlationOracle: String = {
    val cols  = Seq("l_quantity" -> "q", "l_extendedprice" -> "e", "l_discount" -> "d", "l_tax" -> "t")
    val grid  = cols.map { case (c, a) => s"CAST(ROUND($c, 2) AS DECIMAL(17,2)) AS $a" }.mkString(", ")
    val sums  = cols.map { case (_, a) => s"SUM($a) AS s_$a, SUM($a * $a) AS ss_$a" }.mkString(", ")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size } yield (cols(i), cols(j))
    val cross = pairs.map { case ((_, a), (_, b)) => s"SUM($a * $b) AS sp_${a}_$b" }.mkString(", ")
    val arms = pairs.map { case ((ca, a), (cb, b)) =>
      val va = s"(CAST(n AS DOUBLE) * CAST(ss_$a AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))"
      val vb = s"(CAST(n AS DOUBLE) * CAST(ss_$b AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))"
      val num = s"(CAST(n AS DOUBLE) * CAST(sp_${a}_$b AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))"
      s"""SELECT '$ca' AS col_a, '$cb' AS col_b,
             ROUND(CASE WHEN $va > 0 AND $vb > 0 THEN $num / (sqrt($va) * sqrt($vb)) END, 6) AS r,
             n AS n_rows FROM m"""
    }.mkString("\nUNION ALL\n")
    s"""WITH g AS (SELECT $grid FROM lineitem),
       m AS (SELECT COUNT(*) AS n, $sums, $cross FROM g)
       $arms"""
  }

  /** Spearman oracle: per-column doubled-average-rank maps (exact ints
    * under ties), then the correlationOracle moment formula on the rank
    * columns. */
  private def spearmanOracle: String = {
    val cols = Seq("l_quantity" -> "q", "l_discount" -> "d", "l_tax" -> "t")
    val maps = cols.map { case (c, a) =>
      s"""r_$a AS (SELECT $c AS v_$a,
            2 * COALESCE(SUM(cnt) OVER (ORDER BY $c ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + cnt + 1 AS r2
          FROM (SELECT $c, COUNT(*) AS cnt FROM lineitem GROUP BY 1))"""
    }.mkString(",\n")
    val joins = cols.map { case (c, a) => s"JOIN r_$a ON r_$a.v_$a = l.$c" }.mkString(" ")
    val proj  = cols.map { case (_, a) => s"CAST(r_$a.r2 AS DECIMAL(17,0)) AS $a" }.mkString(", ")
    val sums  = cols.map { case (_, a) => s"SUM($a) AS s_$a, SUM($a * $a) AS ss_$a" }.mkString(", ")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size } yield (cols(i), cols(j))
    val cross = pairs.map { case ((_, a), (_, b)) => s"SUM($a * $b) AS sp_${a}_$b" }.mkString(", ")
    val arms = pairs.map { case ((ca, a), (cb, b)) =>
      val va  = s"(CAST(n AS DOUBLE) * CAST(ss_$a AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))"
      val vb  = s"(CAST(n AS DOUBLE) * CAST(ss_$b AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))"
      val num = s"(CAST(n AS DOUBLE) * CAST(sp_${a}_$b AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))"
      s"""SELECT '$ca' AS col_a, '$cb' AS col_b,
             ROUND(CASE WHEN $va > 0 AND $vb > 0 THEN $num / (sqrt($va) * sqrt($vb)) END, 6) AS r,
             n AS n_rows FROM m"""
    }.mkString("\nUNION ALL\n")
    s"""WITH $maps,
       g AS (SELECT $proj FROM lineitem l $joins),
       m AS (SELECT COUNT(*) AS n, $sums, $cross FROM g)
       $arms"""
  }

  /** Mann-Whitney oracle: one pooled-rank block per group pair, doubled
    * ranks exact under ties, the single effect-size division last. */
  private def mannWhitneyOracle(groups: Seq[String], valueCol: String, groupCol: String): String =
    (for { i <- groups.indices; j <- (i + 1) until groups.size } yield {
      val (ga, gb) = (groups(i), groups(j))
      s"""SELECT '$ga' AS group_a, '$gb' AS group_b, t.n_a, t.n_b, t.u2_a, t.effect_a FROM (
         WITH pair AS (SELECT $groupCol AS g, $valueCol AS v FROM lineitem WHERE $groupCol IN ('$ga', '$gb')),
         rm AS (SELECT v, 2 * COALESCE(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + cnt + 1 AS r2
                FROM (SELECT v, COUNT(*) AS cnt FROM pair GROUP BY 1)),
         ag AS (SELECT g, COUNT(*) AS n, CAST(SUM(r2) AS BIGINT) AS sr2 FROM pair JOIN rm USING (v) GROUP BY 1)
         SELECT a.n AS n_a, b.n AS n_b, a.sr2 - a.n * (a.n + 1) AS u2_a,
                round(CAST(a.sr2 - a.n * (a.n + 1) AS DOUBLE)
                      / (2.0 * CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)), 6) AS effect_a
         FROM ag a, ag b WHERE a.g = '$ga' AND b.g = '$gb') t"""
    }).mkString("\nUNION ALL\n")

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------- grouping sets
    // Explicit GROUPING SETS (rollup/cube's general form): per-flag,
    // per-(flag,status), and grand-total rows in ONE pass — Spark expands to
    // a single Expand + aggregate, not three scans.
    Q(
      "grouping_sets_flag_status",
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
      """)) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_returnflag"), col("l_linestatus")), Seq()),
          col("l_returnflag"),
          col("l_linestatus"))
        .agg(count(lit(1)).as("n"), asDouble(sum(money(col("l_extendedprice")))).as("sum_price"))
    },

    // ---------------------------------------------------- INTERSECT ALL
    // Multiset intersection (min of multiplicities) — the bag-semantics
    // sibling of set_intersect_custkeys.
    Q(
      "set_intersect_all_keys",
      Some("""
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("k"))
        .intersectAll(t.orders.filter(col("o_totalprice") > 150000).select(col("o_custkey").as("k")))
    },

    // -------------------------------------------------------- range join
    // Events within each user's first active day: equi-join on the user key
    // carries the shuffle; the time range is a residual predicate. The
    // per-user window table is tiny → broadcast; at 100 TB the equi-key
    // keeps this a join, never a cross product.
    Q(
      "join_range_first_day",
      Some("""
        WITH w AS (SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id)
        SELECT e.user_id, COUNT(*) AS n_first_day,
               CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events e JOIN w ON e.user_id = w.user_id
          AND e.ts >= w.t0 AND e.ts < w.t0 + INTERVAL 1 DAY
        GROUP BY e.user_id
      """)) { (spark, dir) =>
      val events = Tables(spark, dir).events
      val firstDay = events.groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      events
        .join(
          broadcast(firstDay),
          Seq("user_id"))
        .filter(col("ts") >= col("t0") && col("ts") < col("t0") + expr("INTERVAL 1 DAY"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_first_day"), asDouble(sum(money(col("value")))).as("sum_value"))
    },

    // ------------------------------------- interval join with NO equi-key
    // Purchases inside ANY early-user signup window — no shared key, so a
    // bare range predicate would plan as BroadcastNestedLoop (a cross
    // product once both sides are large). IntervalJoin bands time into
    // 4-hour bins: intervals replicate into the <= 2 bins they span,
    // points key by their single bin, and the plan is a shuffled
    // EQUI-join with the range as a residual — exact by construction (a
    // point has one bin, so each match meets once). Left join back to the
    // interval set so empty windows emit zero rows too; all-integer.
    Q(
      "join_interval_overlap",
      Some("""
        WITH s AS (SELECT event_id AS signup_id, ts AS t0, ts + INTERVAL 4 HOUR AS t1
                   FROM events WHERE event_type = 'signup' AND user_id < 30),
        m AS (SELECT s.signup_id, e.user_id FROM events e
              JOIN s ON e.ts >= s.t0 AND e.ts <= s.t1 WHERE e.event_type = 'purchase'),
        a AS (SELECT signup_id, COUNT(*) AS n_purchases, COUNT(DISTINCT user_id) AS n_buyers
              FROM m GROUP BY signup_id)
        SELECT s.signup_id, COALESCE(a.n_purchases, 0) AS n_purchases,
               COALESCE(a.n_buyers, 0) AS n_buyers
        FROM s LEFT JOIN a USING (signup_id)
      """)) { (spark, dir) =>
      val ev = Tables(spark, dir).events
      val intervals = ev
        .filter(col("event_type") === "signup" && col("user_id") < 30)
        .select(col("event_id").as("signup_id"), col("ts").as("t0"),
          (col("ts") + expr("INTERVAL 4 HOUR")).as("t1"))
      val points = ev
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("pe_id"), col("ts").as("pts"), col("user_id").as("buyer"))
      val matched = graft.operators.IntervalJoin
        .pointInInterval(points, "pts", intervals, "t0", "t1", binMicros = 3600000000L * 4)
        .groupBy(col("signup_id"))
        .agg(count(lit(1)).as("n_purchases"), countDistinct(col("buyer")).as("n_buyers"))
      intervals
        .join(matched, Seq("signup_id"), "left")
        .select(
          col("signup_id"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
          coalesce(col("n_buyers"), lit(0L)).as("n_buyers"))
    },

    // ------------------------------------------- lag / lead / ntile window
    // Value-offset window functions over a total per-customer order (date,
    // then key — deterministic despite duplicate dates).
    Q(
      "window_lag_lead_ntile",
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(COALESCE(lag(o_totalprice) OVER w, -1) AS DOUBLE) AS prev_price,
               CAST(COALESCE(lead(o_totalprice) OVER w, -1) AS DOUBLE) AS next_price,
               ntile(4) OVER w AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      """)) { (spark, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(spark, dir).orders
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          // NULL-free floats: the first/last row in a partition takes a -1
          // sentinel (mixed NULL/float columns are hash-hostile downstream)
          coalesce(lag(col("o_totalprice"), 1).over(w), lit(-1d)).as("prev_price"),
          coalesce(lead(col("o_totalprice"), 1).over(w), lit(-1d)).as("next_price"),
          ntile(4).over(w).as("quartile"))
    },

    // ------------------------------------- rank-function window family
    // dense_rank / percent_rank / cume_dist over per-customer price order.
    // percent_rank = (rank−1)/(n−1) and cume_dist = peers/n are divisions
    // of exact integers (IEEE-exact, identical both engines); ties on
    // equal prices are genuine and both functions define them identically.
    Q(
      "window_rank_family",
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(dense_rank() OVER w AS BIGINT) AS drank,
               ROUND(percent_rank() OVER w, 6) AS prank,
               ROUND(cume_dist() OVER w, 6) AS cdist
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)
      """)) { (spark, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
      Tables(spark, dir).orders
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          dense_rank().over(w).cast("long").as("drank"),
          round(percent_rank().over(w), 6).as("prank"),
          round(cume_dist().over(w), 6).as("cdist"))
    },

    // ------------------------------------------------- RANGE window frame
    // Trailing-28-day spend per customer: a value-based (RANGE) frame over
    // epoch seconds — frame membership depends on ORDER VALUES only, so ties
    // on o_orderdate cannot make it nondeterministic.
    Q(
      "window_trailing_spend",
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
                 RANGE BETWEEN 2419200 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_28d
        FROM orders
      """)) { (spark, dir) =>
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-2419200L, Window.currentRow)
      Tables(spark, dir).orders
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          asDouble(sum(money(col("o_totalprice"))).over(w)).as("spend_28d"))
    },

    // ------------------------------------- composed corpus-clean pipeline
    // The training-data shape end to end in ONE plan: length gate →
    // whitespace-normalized fingerprint → exact-dedup keep-min → per-kept-doc
    // stats. Catalyst fuses the projection chain; the only shuffles are the
    // fingerprint groupBy and the keeper join.
    Q(
      "pipeline_corpus_clean",
      Some("""
        WITH q AS (
          SELECT doc_id,
                 md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
                 len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
          FROM documents
          WHERE LENGTH(text) >= 100),
        d AS (SELECT fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups FROM q GROUP BY fp)
        SELECT q.doc_id, q.n_tokens, d.n_dups
        FROM q JOIN d ON q.doc_id = d.keep_id
      """)) { (spark, dir) =>
      val toks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
      val q = Tables(spark, dir).documents
        .filter(length(col("text")) >= 100)
        .select(
          col("doc_id"),
          md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp"),
          size(toks).as("n_tokens"))
      val keepers = q.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      q.join(keepers, q("doc_id") === keepers("keep_id"))
        .select(col("doc_id"), col("n_tokens"), col("n_dups"))
    },

    // -------------------------------------------------- regexp functions
    // Extraction/replacement/count parity (regexp_matches already covered
    // by grep/quality): part-type word extraction and digit scrubbing.
    Q(
      "regexp_funcs_part",
      Some("""
        SELECT p_partkey,
               regexp_extract(p_type, '([a-z]+)$', 1) AS type_last_word,
               regexp_replace(p_name, '[0-9]+', '#', 'g') AS name_scrubbed,
               len(regexp_extract_all(p_name, '[0-9]+')) AS n_number_runs
        FROM part
      """)) { (spark, dir) =>
      Tables(spark, dir).part
        .select(
          col("p_partkey"),
          regexp_extract(col("p_type"), "([a-z]+)$", 1).as("type_last_word"),
          regexp_replace(col("p_name"), "[0-9]+", "#").as("name_scrubbed"),
          size(regexp_extract_all(col("p_name"), lit("[0-9]+"), lit(0))).as("n_number_runs"))
    },

    // ------------------------------------------------------ union by name
    // Schema-evolution union: two projections with different column orders
    // and a missing column on one side, aligned by NAME with null fill.
    Q(
      "union_by_name_keys",
      Some("""
        SELECT o_custkey AS k, 'order' AS src, CAST(o_totalprice AS DOUBLE) AS amount FROM orders WHERE o_totalprice > 200000
        UNION ALL BY NAME
        SELECT 'customer' AS src, c_custkey AS k, CAST(-1 AS DOUBLE) AS amount FROM customer WHERE c_acctbal < -900
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val a = t.orders
        .filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("k"), lit("order").as("src"), col("o_totalprice").as("amount"))
      val b = t.customer
        .filter(col("c_acctbal") < -900)
        .select(lit("customer").as("src"), col("c_custkey").as("k"))
      // null-fill from the missing column becomes a -1 sentinel: mixed
      // NULL/float columns are hash-hostile in downstream comparators
      a.unionByName(b, allowMissingColumns = true)
        .withColumn("amount", coalesce(col("amount"), lit(-1d)))
    },

    // ------------------------------------------- collection aggregation
    // Deterministic list aggregation: collect + sort inside the row, then
    // a scalar join — order-insensitive input contract (SURVEY.md §2f.4)
    // made deterministic by the explicit sort.
    Q(
      "agg_collect_sorted",
      Some("""
        SELECT n_nationkey,
               array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
               COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_nationkey
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_nationkey"))
        .agg(
          array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
          count(lit(1)).as("n_customers"))
    },

    // ---------------------------------------- first/last window values
    // first_value/last_value over an explicit full-partition frame with a
    // total order (date, key) — frame-clause coverage the ranking windows
    // don't touch.
    Q(
      "window_first_last",
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(first_value(o_totalprice) OVER w AS DOUBLE) AS first_price,
               CAST(last_value(o_totalprice) OVER w AS DOUBLE) AS last_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      """)) { (spark, dir) =>
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(spark, dir).orders
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("last_price"))
    },

    // ------------------------------------------------- sketch aggregates
    // Mergeable Datasketches HLL distinct estimate. At lgConfigK=14 the
    // sketch holds ≤ ~12k distinct per group in its coupon (EXACT) regime
    // — the gate corpora (≤1.5k distinct users/group) sit squarely inside
    // it, so the estimate column IS the exact count and the row hash-
    // checks against COUNT(DISTINCT); at production cardinality the same
    // plan degrades to ~0.8% error (SketchSpec pins the envelope). Every
    // column the operator emits is inside the oracle hash (HLL++
    // approx_count_distinct, which has no exact regime and no cross-engine
    // replay, is deliberately not part of the operator surface).
    Q(
      "sketch_distinct_users",
      Some("""
        SELECT event_type, count(DISTINCT user_id) AS hll_distinct, count(*) AS n_rows
        FROM events GROUP BY event_type
      """)) { (spark, dir) =>
      Sketches.distinctCounts(Tables(spark, dir).events, "event_type", "user_id", lgConfigK = 14)
    },

    // Daily HLL cube re-aggregated by UNION — distinct-over-range from
    // stored sketches, the never-rescan-raw-events pattern. Coupon-regime
    // exactness survives the union (sketch union merges coupon sets), so
    // the total equals the exact all-days distinct at gate scale.
    Q(
      "sketch_union_daily",
      Some("""
        SELECT event_type, count(DISTINCT user_id) AS distinct_total
        FROM events GROUP BY event_type
      """)) { (spark, dir) =>
      Sketches.unionSketches(
        Sketches.dailySketches(Tables(spark, dir).events, "ts", "event_type", "user_id", lgConfigK = 14),
        "event_type")
    },

    // Distributed approximate quantiles per order status — long form (one
    // scalar row per group×quantile) so the output is harness-sortable; the
    // array-column form remains as Sketches.approxQuantiles. At accuracy
    // 1e6 the GK summary's rank error bound (n/accuracy < 1 at gate group
    // sizes ≤ 50k) forces the EXACT order statistic, which Spark selects
    // at rank ceil(q*n) — the oracle replays that rank over a row_number
    // window. Production accuracy stays the 1e4 operator default.
    Q(
      "sketch_quantiles_price",
      Some("""
        WITH ranked AS (
          SELECT o_orderstatus, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS rn,
                 count(*) OVER (PARTITION BY o_orderstatus) AS n
          FROM orders),
        qs AS (SELECT unnest([0.5, 0.95, 0.99]) AS q)
        SELECT r.o_orderstatus, q.q AS q, r.o_totalprice AS value, r.n AS n_rows
        FROM ranked r JOIN qs q ON r.rn = CAST(ceil(q.q * r.n) AS BIGINT)
      """)) { (spark, dir) =>
      Sketches.approxQuantilesLong(
        Tables(spark, dir).orders,
        "o_orderstatus",
        col("o_totalprice"),
        Seq(0.5, 0.95, 0.99),
        accuracy = 1000000)
    },

    // Count-min heavy hitters over event types. With 5 distinct keys in a
    // w=ceil(e/eps)≈2719-column sketch, no two keys collide in all depth
    // rows (deterministic for the fixed seed), so every estimate equals
    // the exact count and the row hash-checks; at real key cardinality
    // the same probe over-counts by ≤ eps·N w.p. conf (SketchSpec pins
    // that envelope).
    Q(
      "sketch_heavy_hitters",
      Some("""
        SELECT CAST(event_type AS VARCHAR) AS event_type, count(*) AS est_count
        FROM events GROUP BY 1 HAVING count(*) >= 100
      """)) { (spark, dir) =>
      val events = Tables(spark, dir).events
      Sketches.heavyHitters(
        events,
        "event_type",
        events.select(col("event_type")).distinct(),
        minCount = 100)
    },

    // Portable HLL: register-level HyperLogLog over the splitmix64 portable
    // hash — unlike the Datasketches/HLL++ rows above, the ESTIMATE itself
    // is cross-engine auditable in the DENSE (approximate) regime: the
    // oracle replays the hash (same HUGEINT mulmod machinery as
    // dedup_simhash), the bucket/rho register build (rho via bin() bit
    // length), the EXACT integer harmonic sum Σ2^(rmax−r), the fixed-order
    // raw estimator, and the linear-counting correction — every constant
    // forced ::DOUBLE (DuckDB decimal literals would silently change the
    // arithmetic), final round(…, 6) on both sides. At 1.5k distinct over
    // 4096 registers this exercises the linear-counting branch with a
    // genuinely approximate (non-exact-count) value that still hash-matches.
    Q(
      "sketch_portable_hll",
      Some("""
        WITH du AS (SELECT DISTINCT event_type, CAST(user_id AS UBIGINT) AS x FROM events),
        m1a AS (SELECT event_type, xor(x, x >> 30) AS a FROM du),
        m1 AS (SELECT event_type, CAST((( (a & 4294967295)::HUGEINT * 13787848793156543929::HUGEINT
                 + (((a >> 32)::HUGEINT * 13787848793156543929::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
               ) % 18446744073709551616::HUGEINT) AS UBIGINT) AS z1 FROM m1a),
        m2a AS (SELECT event_type, xor(z1, z1 >> 27) AS a FROM m1),
        m2 AS (SELECT event_type, CAST((( (a & 4294967295)::HUGEINT * 10723151780598845931::HUGEINT
                 + (((a >> 32)::HUGEINT * 10723151780598845931::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
               ) % 18446744073709551616::HUGEINT) AS UBIGINT) AS z2 FROM m2a),
        h AS (SELECT event_type, xor(z2, z2 >> 31) AS h FROM m2),
        rb AS (SELECT event_type, CAST(h >> 52 AS INT) AS bucket,
                      CAST((h::HUGEINT * 4096) % 18446744073709551616::HUGEINT AS UBIGINT) AS w
               FROM h),
        rho AS (SELECT event_type, bucket,
                       CASE WHEN w = 0 THEN 53 ELSE 65 - length(bin(w)) END AS rho
                FROM rb),
        regs0 AS (SELECT event_type, bucket, MAX(rho) AS r FROM rho GROUP BY 1, 2),
        grid AS (SELECT g.event_type, b.b AS bucket
                 FROM (SELECT DISTINCT event_type FROM events) g,
                      (SELECT unnest(range(0, 4096)) AS b) b),
        regs AS (SELECT grid.event_type, grid.bucket, COALESCE(regs0.r, 0) AS r
                 FROM grid LEFT JOIN regs0
                   ON regs0.event_type = grid.event_type AND regs0.bucket = grid.bucket),
        agg AS (SELECT event_type, MAX(r) AS rmax FROM regs GROUP BY 1),
        s AS (SELECT regs.event_type,
                     SUM(CAST((1::UBIGINT << CAST(agg.rmax - regs.r AS INT)) AS HUGEINT)) AS ssum,
                     SUM(CASE WHEN regs.r = 0 THEN 1 ELSE 0 END) AS zeros,
                     MAX(agg.rmax) AS rmax
              FROM regs JOIN agg USING (event_type) GROUP BY 1),
        est AS (SELECT event_type,
                       0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 4096::DOUBLE)
                         * 4096 * 4096 * pow(2.0::DOUBLE, rmax) / CAST(ssum AS DOUBLE) AS raw,
                       zeros
                FROM s),
        n AS (SELECT event_type, COUNT(*) AS n_rows FROM events GROUP BY 1)
        SELECT est.event_type,
               ROUND(CASE WHEN raw <= 2.5::DOUBLE * 4096 AND zeros > 0
                          THEN 4096 * ln(4096::DOUBLE / zeros) ELSE raw END, 6) AS hll_portable,
               n.n_rows
        FROM est JOIN n USING (event_type)
      """)) { (spark, dir) =>
      Sketches.portableDistinct(Tables(spark, dir).events, "event_type", "user_id", p = 12)
    },

    // Portable Bloom membership gate: build over error event ids, probe
    // EVERY event id — the decontamination/blocklist shape (filter built
    // once over the member set, broadcast, probed by a narrow scan; no
    // join on the probe path). The oracle replays the splitmix64 double
    // hashing and the bit-set relationally, so membership ANSWERS —
    // including each of the ~200 deterministic false positives at these
    // settings — are hash-checked, alongside the exact truth column (no
    // false negative can exist on either side by construction).
    Q(
      "sketch_bloom_membership",
      Some(bloomMembershipSql(logBits = 14, nHashes = 4))) { (spark, dir) =>
      val ev      = Tables(spark, dir).events
      val members = ev.filter(col("event_type") === "error").select(col("event_id")).distinct()
      val probes  = ev.select(col("event_id")).distinct()
      Sketches
        .bloomMembership(members, "event_id", probes, "event_id", logBits = 14, nHashes = 4)
        .join(members.withColumn("is_member", lit(true)), Seq("event_id"), "left")
        .select(
          col("event_id"),
          col("in_filter"),
          coalesce(col("is_member"), lit(false)).as("is_member"))
    },

    // Portable count-min frequencies (Sketches.cmsCounts): the linear,
    // mergeable counter matrix beside the Bloom set-membership gate —
    // build once over the event stream (map-side-combined, one matrix
    // per partition shuffles), broadcast, probe per-user counts with a
    // narrow scan. Derandomized splitmix64 row seeds make every
    // estimate — including each collision-inflated overcount —
    // deterministic and hash-checked against the relational replay;
    // est >= exact always (no undercount is possible).
    Q(
      "sketch_countmin",
      Some(cmsSql(logW = 10, depth = 4))) { (spark, dir) =>
      val ev     = Tables(spark, dir).events
      val probes = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      Sketches.cmsCounts(ev, "user_id", probes, "user_id", logW = 10, depth = 4)
    },

    // AMS F2 sketch (Sketches.amsF2): the second frequency moment of
    // user_id — self-join size / repeat rate — from 64 splitmix64
    // sign-hash counters with 4x16 medians-of-means; exact integers until
    // the ONE median division, exact F2 rides along and rel_err is
    // computed from the already-rounded estimate. The oracle replays the
    // full hash chain, sign sums, and rank selection bit-for-bit.
    Q(
      "sketch_ams_f2",
      Some(amsF2Sql(groups = 4, perGroup = 16))) { (spark, dir) =>
      Sketches.amsF2(Tables(spark, dir).events, "user_id", groups = 4, perGroup = 16)
    },

    // Count-min heavy-change detection (Sketches.cmsHeavyChange): which
    // users' traffic moved most between the two halves of the event-time
    // range? Sketch linearity means two stored matrices answer it without
    // rescanning either window; exact per-key deltas ride along. Movers
    // ranked (|delta| desc, key) — a total order, so the top-20 cut
    // replays.
    Q(
      "sketch_cms_delta",
      Some(cmsHeavyChangeSql(logW = 10, depth = 4, topK = 20))) { (spark, dir) =>
      Sketches.cmsHeavyChange(
        Tables(spark, dir).events, "user_id", "ts", logW = 10, depth = 4, topK = 20)
    },

    // AMS join-size estimator (Sketches.amsJoinSize): the same sign-hash
    // counters on events.user_id and orders.o_custkey, per-estimator
    // products S_a*S_b whose expectation IS the inner-join cardinality —
    // the planner question two tiny persisted sketches can answer without
    // rescanning either table. Exact join size rides along for the audit.
    Q(
      "sketch_ams_join",
      Some(amsJoinSql(groups = 4, perGroup = 16))) { (spark, dir) =>
      val t = Tables(spark, dir)
      Sketches.amsJoinSize(t.events, "user_id", t.orders, "o_custkey", groups = 4, perGroup = 16)
    },

    // Portable cube + union: daily m-byte register blobs re-aggregated by
    // elementwise max. Union-of-days ≡ one global pass BIT FOR BIT (the
    // register max is order-free and idempotent; SketchSpec pins the
    // equality), so the oracle replays the GLOBAL register build — the
    // same replay as sketch_portable_hll — and the union's estimate must
    // hash-match it. This is the stored-sketch-cube contract: an external
    // engine can audit any-range distinct estimates from persisted blobs.
    Q(
      "sketch_portable_union",
      Some("""
        WITH du AS (SELECT DISTINCT event_type, CAST(user_id AS UBIGINT) AS x FROM events),
        m1a AS (SELECT event_type, xor(x, x >> 30) AS a FROM du),
        m1 AS (SELECT event_type, CAST((( (a & 4294967295)::HUGEINT * 13787848793156543929::HUGEINT
                 + (((a >> 32)::HUGEINT * 13787848793156543929::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
               ) % 18446744073709551616::HUGEINT) AS UBIGINT) AS z1 FROM m1a),
        m2a AS (SELECT event_type, xor(z1, z1 >> 27) AS a FROM m1),
        m2 AS (SELECT event_type, CAST((( (a & 4294967295)::HUGEINT * 10723151780598845931::HUGEINT
                 + (((a >> 32)::HUGEINT * 10723151780598845931::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
               ) % 18446744073709551616::HUGEINT) AS UBIGINT) AS z2 FROM m2a),
        h AS (SELECT event_type, xor(z2, z2 >> 31) AS h FROM m2),
        rb AS (SELECT event_type, CAST(h >> 52 AS INT) AS bucket,
                      CAST((h::HUGEINT * 4096) % 18446744073709551616::HUGEINT AS UBIGINT) AS w
               FROM h),
        rho AS (SELECT event_type, bucket,
                       CASE WHEN w = 0 THEN 53 ELSE 65 - length(bin(w)) END AS rho
                FROM rb),
        regs0 AS (SELECT event_type, bucket, MAX(rho) AS r FROM rho GROUP BY 1, 2),
        grid AS (SELECT g.event_type, b.b AS bucket
                 FROM (SELECT DISTINCT event_type FROM events) g,
                      (SELECT unnest(range(0, 4096)) AS b) b),
        regs AS (SELECT grid.event_type, grid.bucket, COALESCE(regs0.r, 0) AS r
                 FROM grid LEFT JOIN regs0
                   ON regs0.event_type = grid.event_type AND regs0.bucket = grid.bucket),
        agg AS (SELECT event_type, MAX(r) AS rmax FROM regs GROUP BY 1),
        s AS (SELECT regs.event_type,
                     SUM(CAST((1::UBIGINT << CAST(agg.rmax - regs.r AS INT)) AS HUGEINT)) AS ssum,
                     SUM(CASE WHEN regs.r = 0 THEN 1 ELSE 0 END) AS zeros,
                     MAX(agg.rmax) AS rmax
              FROM regs JOIN agg USING (event_type) GROUP BY 1),
        est AS (SELECT event_type,
                       0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 4096::DOUBLE)
                         * 4096 * 4096 * pow(2.0::DOUBLE, rmax) / CAST(ssum AS DOUBLE) AS raw,
                       zeros
                FROM s)
        SELECT event_type,
               ROUND(CASE WHEN raw <= 2.5::DOUBLE * 4096 AND zeros > 0
                          THEN 4096 * ln(4096::DOUBLE / zeros) ELSE raw END, 6) AS distinct_est
        FROM est
      """)) { (spark, dir) =>
      Sketches.portableUnion(
        Sketches.portableDailyCube(Tables(spark, dir).events, "ts", "event_type", "user_id", p = 12),
        "event_type",
        p = 12)
    },

    // KMV / theta sketch: the k smallest distinct mix64 hashes per group are
    // a pure order statistic — fully deterministic, so unlike register HLLs
    // the ESTIMATE hash-checks cross-engine at ANY cardinality (here 150
    // distinct over k=128: genuinely approximate, no exact-regime gating).
    // The oracle replays the splitmix64 chain, takes row_number ≤ k over
    // UBIGINT order, and applies the same fixed-order (k−1)/U₍k₎ double
    // arithmetic (UBIGINT→DOUBLE cast ≡ the engine's round-to-odd idiom).
    Q(
      "sketch_kmv_distinct",
      Some("""
        WITH du AS (SELECT DISTINCT event_type, CAST(user_id AS UBIGINT) AS x FROM events),
        m1a AS (SELECT event_type, xor(x, x >> 30) AS a FROM du),
        m1 AS (SELECT event_type, CAST((( (a & 4294967295)::HUGEINT * 13787848793156543929::HUGEINT
                 + (((a >> 32)::HUGEINT * 13787848793156543929::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
               ) % 18446744073709551616::HUGEINT) AS UBIGINT) AS z1 FROM m1a),
        m2a AS (SELECT event_type, xor(z1, z1 >> 27) AS a FROM m1),
        m2 AS (SELECT event_type, CAST((( (a & 4294967295)::HUGEINT * 10723151780598845931::HUGEINT
                 + (((a >> 32)::HUGEINT * 10723151780598845931::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
               ) % 18446744073709551616::HUGEINT) AS UBIGINT) AS z2 FROM m2a),
        h AS (SELECT event_type, xor(z2, z2 >> 31) AS h FROM m2),
        rk AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
        keep AS (SELECT event_type, h FROM rk WHERE rn <= 128),
        meta AS (SELECT event_type, COUNT(*) AS cnt, MAX(h) AS theta FROM keep GROUP BY 1),
        n AS (SELECT event_type, COUNT(*) AS n_rows FROM events GROUP BY 1)
        SELECT m.event_type,
               ROUND(CASE WHEN m.cnt < 128 THEN CAST(m.cnt AS DOUBLE)
                          ELSE CAST(127 AS DOUBLE) / (CAST(m.theta AS DOUBLE) / pow(2.0::DOUBLE, 64)) END,
                     6) AS distinct_est,
               n.n_rows
        FROM meta m JOIN n USING (event_type)
      """)) { (spark, dir) =>
      Sketches.kmvDistinct(Tables(spark, dir).events, "event_type", "user_id", k = 128)
    },

    // Theta-sketch SET OPERATIONS from the same stored KMV samples — the
    // query register HLLs fundamentally cannot answer: estimated |A∩B| and
    // |A∪B| for every event-type pair. θ = min of the kth-min thresholds;
    // retained common hashes <u θ scale by 2^64/θ. Deterministic end to
    // end, so the whole pair grid hash-matches the replay.
    Q(
      "sketch_kmv_setops",
      Some("""
        WITH du AS (SELECT DISTINCT event_type, CAST(user_id AS UBIGINT) AS x FROM events),
        m1a AS (SELECT event_type, xor(x, x >> 30) AS a FROM du),
        m1 AS (SELECT event_type, CAST((( (a & 4294967295)::HUGEINT * 13787848793156543929::HUGEINT
                 + (((a >> 32)::HUGEINT * 13787848793156543929::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
               ) % 18446744073709551616::HUGEINT) AS UBIGINT) AS z1 FROM m1a),
        m2a AS (SELECT event_type, xor(z1, z1 >> 27) AS a FROM m1),
        m2 AS (SELECT event_type, CAST((( (a & 4294967295)::HUGEINT * 10723151780598845931::HUGEINT
                 + (((a >> 32)::HUGEINT * 10723151780598845931::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
               ) % 18446744073709551616::HUGEINT) AS UBIGINT) AS z2 FROM m2a),
        h AS (SELECT event_type, xor(z2, z2 >> 31) AS h FROM m2),
        rk AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
        keep AS (SELECT event_type, h FROM rk WHERE rn <= 128),
        meta AS (SELECT event_type, COUNT(*) AS cnt, MAX(h) AS theta FROM keep GROUP BY 1),
        pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 CASE WHEN a.cnt = 128 AND b.cnt = 128 THEN LEAST(a.theta, b.theta)
                      WHEN a.cnt = 128 THEN a.theta
                      WHEN b.cnt = 128 THEN b.theta
                      ELSE NULL END AS theta_pair
          FROM meta a JOIN meta b ON a.event_type < b.event_type),
        ca AS (SELECT p.type_a, p.type_b, COUNT(*) AS ca
               FROM keep k JOIN pairs p ON k.event_type = p.type_a
               WHERE p.theta_pair IS NULL OR k.h < p.theta_pair GROUP BY 1, 2),
        cb AS (SELECT p.type_a, p.type_b, COUNT(*) AS cb
               FROM keep k JOIN pairs p ON k.event_type = p.type_b
               WHERE p.theta_pair IS NULL OR k.h < p.theta_pair GROUP BY 1, 2),
        ci AS (SELECT p.type_a, p.type_b, COUNT(*) AS ci
               FROM keep x JOIN keep y ON x.h = y.h AND x.event_type < y.event_type
               JOIN pairs p ON p.type_a = x.event_type AND p.type_b = y.event_type
               WHERE p.theta_pair IS NULL OR x.h < p.theta_pair GROUP BY 1, 2)
        SELECT p.type_a, p.type_b,
               ROUND(CASE WHEN p.theta_pair IS NULL THEN CAST(COALESCE(ci.ci, 0) AS DOUBLE)
                          ELSE CAST(COALESCE(ci.ci, 0) AS DOUBLE)
                               / (CAST(p.theta_pair AS DOUBLE) / pow(2.0::DOUBLE, 64)) END,
                     6) AS inter_est,
               ROUND(CASE WHEN p.theta_pair IS NULL
                          THEN CAST(COALESCE(ca.ca, 0) + COALESCE(cb.cb, 0) - COALESCE(ci.ci, 0) AS DOUBLE)
                          ELSE CAST(COALESCE(ca.ca, 0) + COALESCE(cb.cb, 0) - COALESCE(ci.ci, 0) AS DOUBLE)
                               / (CAST(p.theta_pair AS DOUBLE) / pow(2.0::DOUBLE, 64)) END,
                     6) AS union_est
        FROM pairs p
        LEFT JOIN ca ON ca.type_a = p.type_a AND ca.type_b = p.type_b
        LEFT JOIN cb ON cb.type_a = p.type_a AND cb.type_b = p.type_b
        LEFT JOIN ci ON ci.type_a = p.type_a AND ci.type_b = p.type_b
      """)) { (spark, dir) =>
      Sketches.kmvSetOps(Tables(spark, dir).events, "event_type", "user_id", k = 128)
    },

    // Per-nation OLS revenue trend (TimeSeries.groupLinearTrend): slope +
    // intercept of daily supplier-nation revenue over the day index, from
    // exact integer/decimal moments in one aggregation — "is this segment
    // growing and how fast" without iteration. Double closed-form in a
    // fixed op order, intercept derived from the ROUNDED slope so both
    // surfaces agree past the last ulp.
    Q(
      "trend_nation_revenue",
      Some("""
        WITH daily AS (
          SELECT n_name,
                 datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS x,
                 ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS rev
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          GROUP BY 1, 2),
        g AS (SELECT n_name, x, CAST(rev AS DECIMAL(23,2)) AS y FROM daily),
        m AS (SELECT n_name, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx,
                     SUM(y) AS sy, SUM(CAST(x AS DECIMAL(6,0)) * y) AS sxy
              FROM g GROUP BY 1),
        s2 AS (SELECT n_name, n,
                      CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
                      CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
                      CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
               FROM m)
        SELECT n_name, n AS n_points,
               ROUND(CASE WHEN n >= 2 AND den <> 0 THEN num / den END, 6) AS slope,
               ROUND(CASE WHEN n >= 2 AND den <> 0
                          THEN (syd - ROUND(num / den, 6) * sxd) / CAST(n AS DOUBLE) END, 6) AS intercept
        FROM s2
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val daily = t.lineitem
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(t.nation, col("s_nationkey") === col("n_nationkey"))
        .groupBy(
          col("n_name"),
          datediff(to_date(col("l_shipdate")), lit("1992-01-01").cast("date")).as("x"))
        // revenue stays DECIMAL to the grid boundary: a scale-4 → double →
        // round-2 detour would split engines on exact .xx50 half values
        .agg(round(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))), 2).as("rev"))
      graft.operators.TimeSeries.groupLinearTrend(daily, "n_name", "x", "rev", yScale = 2)
    },

    // Pairwise Pearson correlations over the lineitem numeric columns in
    // ONE scan (DataQuality.correlationMatrix): the feature-redundancy /
    // leakage screen. Exact decimal moments; double closed form; round 6.
    Q("quality_correlations", Some(correlationOracle)) { (spark, dir) =>
      DataQuality.correlationMatrix(
        Tables(spark, dir).lineitem,
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        scale = 2)
    },

    // Kruskal-Wallis H across all returnflag groups on quantity
    // (DataQuality.kruskalWallis): ANOVA on pooled doubled ranks — the
    // identity H = 3/(n(n+1))·Σ(2R_j)²/n_j − 3(n+1) keeps every
    // aggregate exact; per-group terms snap at 1e-9, tie mass Σ(t³−t)
    // is exact integer, H and the tie-corrected H/C round at 6.
    Q(
      "quality_kruskal_wallis",
      Some("""
        WITH pool AS (SELECT l_returnflag AS g, l_quantity AS v FROM lineitem),
        cnts AS (SELECT v, COUNT(*) AS cnt FROM pool GROUP BY 1),
        rm AS (SELECT v, 2 * COALESCE(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      + cnt + 1 AS r2 FROM cnts),
        pg AS (SELECT g, COUNT(*) AS nj, CAST(SUM(r2) AS BIGINT) AS sr2
               FROM pool JOIN rm USING (v) GROUP BY 1),
        t AS (SELECT COUNT(*) AS n_groups, CAST(SUM(nj) AS BIGINT) AS n,
                     CAST(SUM(CAST(round(CAST(sr2 AS DOUBLE) * CAST(sr2 AS DOUBLE) / CAST(nj AS DOUBLE), 9)
                                   AS DECIMAL(30,9))) AS DECIMAL(30,9)) AS t9
              FROM pg),
        tm AS (SELECT CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_mass FROM cnts)
        SELECT n, n_groups,
               round(3.0 * CAST(t9 AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                     - 3.0 * (CAST(n AS DOUBLE) + 1.0), 6) AS h,
               round(CASE WHEN 1.0 - CAST(tie_mass AS DOUBLE)
                               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) > 0
                     THEN (3.0 * CAST(t9 AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                           - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                          / (1.0 - CAST(tie_mass AS DOUBLE)
                                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
                     END, 6) AS h_tie_corrected
        FROM t, tm
      """)) { (spark, dir) =>
      DataQuality.kruskalWallis(Tables(spark, dir).lineitem, "l_returnflag", "l_quantity")
    },

    // Jensen-Shannon drift between the first and second half-month of
    // the event-type mix (DataQuality.jsDivergence): the symmetric,
    // bounded drift measure beside PSI/chi2 — per-category contributions
    // snapped to 1e-12 (their exact-decimal sum IS the statistic).
    Q(
      "quality_drift_jsd",
      Some("""
        WITH a AS (SELECT event_type AS category, COUNT(*) AS n_a FROM events
                   WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
        b AS (SELECT event_type AS category, COUNT(*) AS n_b FROM events
              WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
        j AS (SELECT COALESCE(a.category, b.category) AS category,
                     COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
              FROM a FULL OUTER JOIN b ON b.category = a.category),
        t AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta, CAST(SUM(n_b) AS BIGINT) AS tb FROM j)
        SELECT category, n_a, n_b,
               round(CAST(n_a AS DOUBLE) / CAST(ta AS DOUBLE), 6) AS share_a,
               round(CAST(n_b AS DOUBLE) / CAST(tb AS DOUBLE), 6) AS share_b,
               CAST(CAST(round(
                 (CASE WHEN CAST(n_a AS DOUBLE) / CAST(ta AS DOUBLE) > 0
                       THEN (CAST(n_a AS DOUBLE) / CAST(ta AS DOUBLE))
                            * ln((CAST(n_a AS DOUBLE) / CAST(ta AS DOUBLE))
                                 / ((CAST(n_a AS DOUBLE) / CAST(ta AS DOUBLE)
                                     + CAST(n_b AS DOUBLE) / CAST(tb AS DOUBLE)) * 0.5))
                       ELSE 0.0 END
                  + CASE WHEN CAST(n_b AS DOUBLE) / CAST(tb AS DOUBLE) > 0
                         THEN (CAST(n_b AS DOUBLE) / CAST(tb AS DOUBLE))
                              * ln((CAST(n_b AS DOUBLE) / CAST(tb AS DOUBLE))
                                   / ((CAST(n_a AS DOUBLE) / CAST(ta AS DOUBLE)
                                       + CAST(n_b AS DOUBLE) / CAST(tb AS DOUBLE)) * 0.5))
                         ELSE 0.0 END) * 0.5, 12) AS DECIMAL(20,12)) AS DOUBLE) AS js_contrib
        FROM j, t
      """)) { (spark, dir) =>
      val ev = Tables(spark, dir).events
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      DataQuality.jsDivergence(
        ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut), "event_type")
    },

    // Gini concentration of customer revenue (DataQuality.giniCoefficient):
    // the revenue-concentration / source-imbalance signal. Money-grid
    // exact totals, exact-decimal rank-weighted sum, one fixed-order
    // double formula under round(·, 6); ties rank by custkey.
    Q(
      "quality_gini_revenue",
      Some("""
        WITH per AS (SELECT o_custkey AS e, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
                     FROM orders GROUP BY 1),
        r AS (SELECT x, row_number() OVER (ORDER BY x, e) AS i FROM per),
        m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * i) AS six FROM r)
        SELECT n AS n_entities, CAST(sx AS DOUBLE) AS total,
               round(2.0 * CAST(six AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
                     - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
        FROM m
      """)) { (spark, dir) =>
      DataQuality.giniCoefficient(Tables(spark, dir).orders, "o_custkey", "o_totalprice")
    },

    // Spearman rank-correlation matrix (DataQuality.spearmanMatrix):
    // Pearson on doubled average ranks — exact integers even under ties
    // (2r = 2·cnt_less + cnt_eq + 1) — the outlier-immune monotone
    // association screen beside quality_correlations. Low-cardinality
    // grid columns; rank maps broadcast.
    Q("quality_spearman", Some(spearmanOracle)) { (spark, dir) =>
      DataQuality.spearmanMatrix(
        Tables(spark, dir).lineitem, Seq("l_quantity", "l_discount", "l_tax"))
    },

    // Mann-Whitney U for every returnflag pair on quantity
    // (DataQuality.mannWhitneyPairs): pooled doubled ranks exact under
    // ties, 2U1 an exact integer, the common-language effect size
    // U1/(n1*n2) under round(·, 6) — 0.5 = stochastically equal.
    Q(
      "quality_mann_whitney",
      Some(mannWhitneyOracle(Seq("A", "N", "R"), "l_quantity", "l_returnflag"))) { (spark, dir) =>
      DataQuality.mannWhitneyPairs(Tables(spark, dir).lineitem, "l_returnflag", "l_quantity")
    },

    // Per-group 5% trimmed mean (DataQuality.trimmedMean): the robust
    // location estimate between mean and median — rank-select the kept
    // middle (ties interchangeable), exact integer sum, one division.
    Q(
      "quality_trimmed_mean",
      Some("""
        WITH v AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v FROM lineitem),
        r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
                     COUNT(*) OVER (PARTITION BY g) AS n
              FROM v),
        k AS (SELECT g, v, rn, n, CAST(floor(n * 0.05) AS BIGINT) AS k FROM r)
        SELECT g AS group_key, MIN(n) AS n, MIN(k) AS n_trimmed_each, COUNT(*) AS n_kept,
               round(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS trimmed_mean
        FROM k WHERE rn > k AND rn <= n - k
        GROUP BY g ORDER BY g
      """)) { (spark, dir) =>
      DataQuality.trimmedMean(Tables(spark, dir).lineitem, "l_returnflag", "l_quantity", trimPct = 0.05)
    },

    // Cramér's V effect size (DataQuality.cramersV): the [0,1] strength
    // number beside the chi-square tests — exact contingency counts
    // (absent cells are real zeros), grid-9 terms, round-6 chi2, one
    // fixed-order sqrt; degenerate 1-category axes yield NULL.
    Q(
      "quality_cramers_v",
      Some("""
        WITH cells AS (SELECT l_returnflag AS a, l_linestatus AS b, COUNT(*) AS o
                       FROM lineitem GROUP BY 1, 2),
        rt AS (SELECT a, SUM(o) AS row_t FROM cells GROUP BY 1),
        ct AS (SELECT b, SUM(o) AS col_t FROM cells GROUP BY 1),
        nt AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
        f AS (SELECT rt.a, ct.b, rt.row_t, ct.col_t, nt.n FROM rt, ct, nt),
        t AS (SELECT f.n,
                     CAST(round((CAST(COALESCE(cells.o, 0) AS DOUBLE)
                                 - CAST(f.row_t AS DOUBLE) * CAST(f.col_t AS DOUBLE) / CAST(f.n AS DOUBLE))
                                * (CAST(COALESCE(cells.o, 0) AS DOUBLE)
                                   - CAST(f.row_t AS DOUBLE) * CAST(f.col_t AS DOUBLE) / CAST(f.n AS DOUBLE))
                                / (CAST(f.row_t AS DOUBLE) * CAST(f.col_t AS DOUBLE) / CAST(f.n AS DOUBLE)),
                                9) AS DECIMAL(20,9)) AS term
              FROM f LEFT JOIN cells ON cells.a = f.a AND cells.b = f.b),
        c2 AS (SELECT n, CAST(round(SUM(term), 6) AS DOUBLE) AS chi2 FROM t GROUP BY 1),
        sh AS (SELECT (SELECT COUNT(*) FROM rt) AS r, (SELECT COUNT(*) FROM ct) AS c)
        SELECT c2.n, sh.r AS n_rows_cat, sh.c AS n_cols_cat, c2.chi2,
               CASE WHEN LEAST(sh.r, sh.c) > 1
                    THEN round(sqrt(c2.chi2 / (CAST(c2.n AS DOUBLE) * CAST(LEAST(sh.r, sh.c) - 1 AS DOUBLE))), 6)
               END AS cramers_v
        FROM c2, sh
      """)) { (spark, dir) =>
      DataQuality.cramersV(Tables(spark, dir).lineitem, "l_returnflag", "l_linestatus")
    },

    // All-pairs Mann-Whitney battery with Benjamini-Hochberg FDR control
    // (DataQuality.bhFdrMannWhitney): 300 nation pairs on customer account
    // balance — exact-integer 2U from one (group,value) count + a
    // values×groups cumulative frame (no per-pair jobs), fixed-order
    // z / A&S-7.1.26 p formulas on the 1e-6/1e-9 grids, BH step-up as a
    // rank window + running MIN from the bottom clamped at 1.
    Q(
      "quality_fdr_bh",
      Some("""
        WITH pts AS (SELECT CAST(c_nationkey AS VARCHAR) AS g, c_acctbal AS v FROM customer),
        cnt AS (SELECT g, v, COUNT(*) AS c FROM pts GROUP BY 1, 2),
        grp AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
        vals AS (SELECT DISTINCT v FROM cnt),
        frame AS (SELECT grp.g, vals.v, COALESCE(cnt.c, 0) AS c
                  FROM grp CROSS JOIN vals LEFT JOIN cnt ON cnt.g = grp.g AND cnt.v = vals.v),
        cum AS (SELECT g, v, c,
                       COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v
                                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_below
                FROM frame),
        u2 AS (SELECT a.g AS ga, b.g AS gb,
                      CAST(SUM(2 * a.c * b.cum_below + a.c * b.c) AS BIGINT) AS u2_a
               FROM cnt a JOIN cum b ON a.v = b.v AND a.g < b.g
               GROUP BY 1, 2),
        sc AS (SELECT ga, gb, na.n AS n_a, nb.n AS n_b, u2_a,
                      round((CAST(u2_a AS DOUBLE) - CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE))
                            / sqrt(CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)
                                   * CAST(na.n + nb.n + 1 AS DOUBLE) / 3.0), 6) AS z
               FROM u2 JOIN grp na ON na.g = u2.ga JOIN grp nb ON nb.g = u2.gb),
        xt AS (SELECT sc.*, abs(z) / sqrt(2.0) AS x,
                      1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
               FROM sc),
        pv AS (SELECT *, round(((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
                                 - 0.284496736) * t + 0.254829592) * t * exp(-x * x), 9) AS p_value
               FROM xt),
        rk AS (SELECT *, row_number() OVER (ORDER BY p_value ASC, ga ASC, gb ASC) AS p_rank,
                      (SELECT COUNT(*) FROM pv) AS m
               FROM pv),
        qv AS (SELECT *, round(CAST(m AS DOUBLE) * p_value / CAST(p_rank AS DOUBLE), 9) AS q_raw FROM rk),
        bh AS (SELECT *, LEAST(MIN(q_raw) OVER (ORDER BY p_rank DESC
                                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1.0) AS q_value
               FROM qv)
        SELECT ga AS group_a, gb AS group_b, n_a, n_b, u2_a, z, p_value, p_rank, q_value,
               (q_value <= 0.05) AS reject
        FROM bh ORDER BY group_a, group_b
      """)) { (spark, dir) =>
      DataQuality.bhFdrMannWhitney(Tables(spark, dir).customer, "c_nationkey", "c_acctbal", alpha = 0.05)
    },

    // Two-sample Kolmogorov-Smirnov for every returnflag pair on quantity
    // (DataQuality.ksTestPairs): binning-free distribution-shape drift —
    // the sup-CDF-gap numerator |n_b*Ca - n_a*Cb| is an exact integer
    // (hash-checked as d_num), D is one division under round(., 6), and
    // the asymptotic statistic multiplies the ROUNDED D by an IEEE-exact
    // sqrt, so both engines agree bit-for-bit.
    Q(
      "quality_ks_test",
      Some("""
        WITH v AS (SELECT l_returnflag AS g, l_quantity AS v FROM lineitem),
        pairs(ga, gb) AS (VALUES ('A', 'N'), ('A', 'R'), ('N', 'R')),
        counts AS (SELECT ga, gb, v.v,
                          SUM(CASE WHEN v.g = ga THEN 1 ELSE 0 END) AS ca,
                          SUM(CASE WHEN v.g = gb THEN 1 ELSE 0 END) AS cb
                   FROM pairs JOIN v ON v.g IN (ga, gb) GROUP BY 1, 2, 3),
        cum AS (SELECT ga, gb,
                       CAST(SUM(ca) OVER w AS BIGINT) AS fa,
                       CAST(SUM(cb) OVER w AS BIGINT) AS fb
                FROM counts
                WINDOW w AS (PARTITION BY ga, gb ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        tot AS (SELECT ga, gb, CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
                FROM counts GROUP BY 1, 2),
        d AS (SELECT c.ga, c.gb, MAX(abs(c.fa * t.nb - c.fb * t.na)) AS dnum
              FROM cum c JOIN tot t USING (ga, gb) GROUP BY 1, 2),
        kd AS (SELECT d.ga, d.gb, t.na, t.nb, d.dnum,
                      round(CAST(d.dnum AS DOUBLE) / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)), 6) AS ks_d
               FROM d JOIN tot t USING (ga, gb))
        SELECT ga AS group_a, gb AS group_b, na AS n_a, nb AS n_b, dnum AS d_num, ks_d,
               round(ks_d * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                                 / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))), 6) AS ks_stat
        FROM kd ORDER BY group_a, group_b
      """)) { (spark, dir) =>
      DataQuality.ksTestPairs(Tables(spark, dir).lineitem, "l_returnflag", "l_quantity")
    },

    // GBDT histogram split search (Boosting.histSplitGains): the XGBoost/
    // LightGBM core — ONE map-side-combined (feature, bin) gradient
    // aggregation over the data, then every split candidate scored from
    // the tiny bin table. Labels: is-return flag; features pre-binned
    // (quantity is integral, discount/tax live on the 0.01 grid). Exact
    // integer sums; each gain is three fixed-order double divisions under
    // round(·, 6); is_best replays the (gain desc, bin asc) argmax.
    Q(
      "ml_hist_split",
      Some("""
        WITH m AS (
          SELECT 'quantity' AS feature, CAST(l_quantity AS BIGINT) AS bin,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END AS s FROM lineitem
          UNION ALL
          SELECT 'discount', CAST(round(l_discount * 100) AS BIGINT),
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END FROM lineitem
          UNION ALL
          SELECT 'tax', CAST(round(l_tax * 100) AS BIGINT),
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END FROM lineitem),
        g AS (SELECT feature, bin, CAST(SUM(s) AS BIGINT) AS sb, COUNT(*) AS nb FROM m GROUP BY 1, 2),
        c AS (SELECT feature, bin,
                     CAST(SUM(sb) OVER w AS BIGINT) AS sl,
                     CAST(SUM(nb) OVER w AS BIGINT) AS nl
              FROM g WINDOW w AS (PARTITION BY feature ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        t AS (SELECT feature, CAST(SUM(sb) AS BIGINT) AS st, CAST(SUM(nb) AS BIGINT) AS nt FROM g GROUP BY 1),
        sc AS (SELECT c.feature, c.bin, c.nl AS n_left, t.nt - c.nl AS n_right,
                      round((CAST(c.sl AS DOUBLE) * CAST(c.sl AS DOUBLE) / CAST(c.nl AS DOUBLE)
                           + CAST(t.st - c.sl AS DOUBLE) * CAST(t.st - c.sl AS DOUBLE) / CAST(t.nt - c.nl AS DOUBLE))
                           - CAST(t.st AS DOUBLE) * CAST(t.st AS DOUBLE) / CAST(t.nt AS DOUBLE), 6) AS gain
               FROM c JOIN t USING (feature) WHERE c.nl < t.nt)
        SELECT feature, bin AS split_bin, n_left, n_right, gain,
               row_number() OVER (PARTITION BY feature ORDER BY gain DESC, bin) = 1 AS is_best
        FROM sc
      """)) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
        .withColumn("is_return", (col("l_returnflag") === "R").cast("int"))
      graft.operators.Boosting.histSplitGains(
        li,
        "is_return",
        Seq(
          "quantity" -> col("l_quantity").cast("long"),
          "discount" -> round(col("l_discount") * 100).cast("long"),
          "tax"      -> round(col("l_tax") * 100).cast("long")))
    },

    // Per-group simple OLS in closed form (Features.olsFit): price-vs-
    // quantity slope/intercept/r2 per returnflag from one exact-moment
    // pass (money pre-scaled to integer cents). num/den/vary are exact
    // 128-bit integers on both sides (Spark DECIMAL(38,0) sums + driver
    // BigDecimal, DuckDB HUGEINT); slope and r2 are fixed-order double
    // formulas from those integers, intercept uses the ROUNDED slope.
    Q(
      "ml_ols_fit",
      Some("""
        WITH m AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS y FROM lineitem),
        a AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
                     CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
                     SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(x AS HUGEINT) * y) AS sxy,
                     SUM(CAST(y AS HUGEINT) * y) AS syy
              FROM m GROUP BY 1),
        d AS (SELECT g, n, sx, sy, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den,
                     n * syy - sy * sy AS vary
              FROM a),
        b AS (SELECT g, n, sx, sy, num, den, vary,
                     CASE WHEN den = 0 THEN NULL
                          ELSE round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS slope
              FROM d)
        SELECT g AS group_key, CAST(n AS BIGINT) AS n, slope,
               CASE WHEN slope IS NULL THEN NULL
                    ELSE round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                               / CAST(n AS DOUBLE), 6) END AS intercept,
               CASE WHEN den = 0 OR vary = 0 THEN NULL
                    ELSE round((CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
                               / (CAST(den AS DOUBLE) * CAST(vary AS DOUBLE)), 6) END AS r2
        FROM b ORDER BY group_key
      """)) { (spark, dir) =>
      Features.olsFit(
        Tables(spark, dir).lineitem,
        "l_returnflag",
        col("l_quantity"),
        round(col("l_extendedprice") * 100))
    },

    // Full GBDT stump training, 3 rounds (Boosting.trainStumps): per
    // round one residual-histogram pass + one residual update; residuals
    // live on the 1e-12 decimal grid from birth, cumulative sums snap to
    // 1e-6 before the fixed-order gain formula, leaves snap back to
    // 1e-12 — the unrolled-CTE oracle replays the whole trajectory, and
    // the per-round Σ|residual| witness pins every row's residual, not
    // just the model. eta = 0.5 (exact binary).
    Q(
      "ml_boosted_stumps",
      Some(stumpsSql(rounds = 3))) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
        .withColumn("is_return", (col("l_returnflag") === "R").cast("int"))
      graft.operators.Boosting.trainStumps(
        li,
        "is_return",
        Seq(
          "quantity" -> col("l_quantity").cast("long"),
          "discount" -> round(col("l_discount") * 100).cast("long"),
          "tax"      -> round(col("l_tax") * 100).cast("long")),
        rounds = 3,
        eta = 0.5)
    },

    // K-fold leakage-safe target encoding (Features.targetEncode): each
    // fold's encoding for a category is the label mean over the OTHER
    // folds — no row's label reaches its own feature value. Deterministic
    // integer folds (orderkey % 5), exact integer sums, one division per
    // cell under round(·, 6); the output is the encoding TABLE.
    Q(
      "ml_target_encode",
      Some("""
        WITH b AS (SELECT o_orderpriority AS category, o_orderkey % 5 AS fold,
                          CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
                   FROM orders),
        cf AS (SELECT category, fold, COUNT(*) AS n_cf, CAST(SUM(y) AS BIGINT) AS s_cf
               FROM b GROUP BY 1, 2),
        pc AS (SELECT category, CAST(SUM(n_cf) AS BIGINT) AS n_c, CAST(SUM(s_cf) AS BIGINT) AS s_c
               FROM cf GROUP BY 1),
        pf AS (SELECT fold, CAST(SUM(n_cf) AS BIGINT) AS n_f, CAST(SUM(s_cf) AS BIGINT) AS s_f
               FROM cf GROUP BY 1),
        g AS (SELECT CAST(SUM(n_cf) AS BIGINT) AS n, CAST(SUM(s_cf) AS BIGINT) AS s FROM cf)
        SELECT pc.category, pf.fold,
               pc.n_c - COALESCE(cf.n_cf, 0) AS n_oof,
               round(CASE WHEN pc.n_c - COALESCE(cf.n_cf, 0) > 0
                     THEN CAST(pc.s_c - COALESCE(cf.s_cf, 0) AS DOUBLE)
                          / CAST(pc.n_c - COALESCE(cf.n_cf, 0) AS DOUBLE)
                     ELSE CAST(g.s - pf.s_f AS DOUBLE) / CAST(g.n - pf.n_f AS DOUBLE) END, 6) AS enc
        FROM pc CROSS JOIN pf LEFT JOIN cf ON cf.category = pc.category AND cf.fold = pf.fold, g
      """)) { (spark, dir) =>
      val o = Tables(spark, dir).orders
        .withColumn("y", (col("o_orderstatus") === "F").cast("int"))
      graft.operators.Features.targetEncode(o, "o_orderpriority", "y", "o_orderkey", folds = 5)
    },

    // Chi-square feature-label association (Features.chi2Features): the
    // filter-selection ranking over the same binned lineitem features vs
    // the is-return label. Observed counts and margins are exact
    // integers; each cell's (O−E)²/E snaps to the 1e-9 grid so the
    // cross-cell sum is an order-free exact decimal, round(·, 6) last.
    Q(
      "ml_chi2_features",
      Some("""
        WITH m AS (
          SELECT 'quantity' AS feature, CAST(l_quantity AS BIGINT) AS bin,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM lineitem
          UNION ALL
          SELECT 'discount', CAST(round(l_discount * 100) AS BIGINT),
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END FROM lineitem
          UNION ALL
          SELECT 'tax', CAST(round(l_tax * 100) AS BIGINT),
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END FROM lineitem),
        cells AS (SELECT feature, bin, y, COUNT(*) AS o FROM m GROUP BY 1, 2, 3),
        bt AS (SELECT feature, bin, CAST(SUM(o) AS BIGINT) AS row_t FROM cells GROUP BY 1, 2),
        lt AS (SELECT feature, y, CAST(SUM(o) AS BIGINT) AS col_t FROM cells GROUP BY 1, 2),
        nt AS (SELECT feature, CAST(SUM(o) AS BIGINT) AS n FROM cells GROUP BY 1),
        fr AS (SELECT bt.feature, bt.bin, lt.y, bt.row_t, lt.col_t, nt.n
               FROM bt JOIN lt ON lt.feature = bt.feature JOIN nt ON nt.feature = bt.feature),
        t0 AS (SELECT fr.feature,
                      CAST(COALESCE(c.o, 0) AS DOUBLE) AS o,
                      CAST(fr.row_t AS DOUBLE) * CAST(fr.col_t AS DOUBLE) / CAST(fr.n AS DOUBLE) AS e
               FROM fr LEFT JOIN cells c
                 ON c.feature = fr.feature AND c.bin = fr.bin AND c.y = fr.y),
        t AS (SELECT feature, CAST(round((o - e) * (o - e) / e, 9) AS DECIMAL(20,9)) AS term FROM t0),
        st AS (SELECT feature, CAST(round(SUM(term), 6) AS DOUBLE) AS chi2 FROM t GROUP BY 1),
        sh AS (SELECT f1.feature, f1.n_bins, (f1.n_bins - 1) * (f2.n_labels - 1) AS dof
               FROM (SELECT feature, COUNT(*) AS n_bins FROM bt GROUP BY 1) f1
               JOIN (SELECT feature, COUNT(*) AS n_labels FROM lt GROUP BY 1) f2
                 ON f2.feature = f1.feature)
        SELECT st.feature, sh.n_bins, sh.dof, st.chi2
        FROM st JOIN sh ON sh.feature = st.feature
        ORDER BY st.chi2 DESC, st.feature
      """)) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
        .withColumn("is_return", (col("l_returnflag") === "R").cast("int"))
      graft.operators.Features.chi2Features(
        li,
        "is_return",
        Seq(
          "quantity" -> col("l_quantity").cast("long"),
          "discount" -> round(col("l_discount") * 100).cast("long"),
          "tax"      -> round(col("l_tax") * 100).cast("long")))
    },

    // k-anonymity / l-diversity audit over customer quasi-identifiers —
    // the pre-release privacy gate: QI groups below k are re-identifiable,
    // single-sensitive-value groups leak the attribute even when large.
    // One aggregation, exact integers + boolean flags.
    Q(
      "privacy_k_anonymity",
      Some("""
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS group_size,
               COUNT(DISTINCT c_acctbal) AS l_diversity,
               COUNT(*) < 10 AS k_violation,
               COUNT(DISTINCT c_acctbal) < 2 AS l_violation
        FROM customer GROUP BY 1, 2
      """)) { (spark, dir) =>
      DataQuality.kAnonymityAudit(
        Tables(spark, dir).customer, Seq("c_mktsegment", "c_nationkey"), "c_acctbal", k = 10L, l = 2L)
    },

    // Z-order vs lexicographic zone-map pruning audit (Layout.zoneMapAudit):
    // the storage-layout lever behind 100 TB scan skipping — Morton-
    // interleave (custkey, order-day) as a statically unrolled codegen'd
    // OR-chain, bucket by the top 10 key bits, and count the buckets a
    // 2-D range predicate must touch from min/max zone stats under each
    // layout. Exact integer counts; read amplification falls out as
    // rows_in_touched / rows_matching.
    Q(
      "layout_zorder_prune",
      Some(zorderPruneSql(bits = 14, bucketBits = 10, x0 = 50L, x1 = 2000L, y0 = 300L, y1 = 1500L))) {
      (spark, dir) =>
        val prepared = Tables(spark, dir).orders.select(
          col("o_custkey").as("ck"),
          datediff(col("o_orderdate"), to_date(lit("1992-01-01"))).as("dayn"))
        graft.operators.Layout.zoneMapAudit(
          prepared, "ck", "dayn", bits = 14, bucketBits = 10,
          x0 = 50L, x1 = 2000L, y0 = 300L, y1 = 1500L)
    },

    // t-closeness audit (DataQuality.tClosenessAudit): the third rung of
    // the release-privacy ladder — ordered earth-mover's distance between
    // each (segment, nation) group's order-priority distribution and the
    // global one, cross-multiplied cumulative counts exact to the last
    // term, one division under round(., 6).
    Q(
      "privacy_t_closeness",
      Some("""
        WITH j AS (SELECT c_mktsegment, c_nationkey, o_orderpriority AS sv
                   FROM orders JOIN customer ON o_custkey = c_custkey),
        gv AS (SELECT c_mktsegment, c_nationkey, sv, COUNT(*) AS pc FROM j GROUP BY 1, 2, 3),
        qv AS (SELECT sv, CAST(SUM(pc) AS BIGINT) AS qc FROM gv GROUP BY 1),
        keys AS (SELECT DISTINCT c_mktsegment, c_nationkey FROM gv),
        frame AS (SELECT k.c_mktsegment, k.c_nationkey, qv.sv, qv.qc, COALESCE(gv.pc, 0) AS pc
                  FROM keys k CROSS JOIN qv
                  LEFT JOIN gv ON gv.c_mktsegment = k.c_mktsegment
                              AND gv.c_nationkey = k.c_nationkey AND gv.sv = qv.sv),
        cum AS (SELECT *,
                       SUM(pc) OVER (PARTITION BY c_mktsegment, c_nationkey ORDER BY sv
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_p,
                       SUM(qc) OVER (PARTITION BY c_mktsegment, c_nationkey ORDER BY sv
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_q,
                       SUM(pc) OVER (PARTITION BY c_mktsegment, c_nationkey) AS n_g,
                       SUM(qc) OVER (PARTITION BY c_mktsegment, c_nationkey) AS n_tot
                FROM frame),
        agg AS (SELECT c_mktsegment, c_nationkey,
                       CAST(MIN(n_g) AS BIGINT) AS group_size,
                       CAST(MIN(n_tot) AS BIGINT) AS n_total,
                       COUNT(*) AS k_cats,
                       SUM(abs(CAST(n_tot AS HUGEINT) * cum_p - CAST(n_g AS HUGEINT) * cum_q)) AS s_num
                FROM cum GROUP BY 1, 2)
        SELECT c_mktsegment, c_nationkey, group_size, k_cats,
               round(CASE WHEN k_cats > 1
                          THEN CAST(s_num AS DOUBLE)
                               / (CAST(group_size AS DOUBLE) * CAST(n_total AS DOUBLE) * CAST(k_cats - 1 AS DOUBLE))
                     END, 6) AS emd_t,
               round(CASE WHEN k_cats > 1
                          THEN CAST(s_num AS DOUBLE)
                               / (CAST(group_size AS DOUBLE) * CAST(n_total AS DOUBLE) * CAST(k_cats - 1 AS DOUBLE))
                     END, 6) > 0.05 AS t_violation
        FROM agg
      """)) { (spark, dir) =>
      val tb = Tables(spark, dir)
      val j = tb.orders
        .join(tb.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("c_nationkey"), col("o_orderpriority"))
      DataQuality.tClosenessAudit(j, Seq("c_mktsegment", "c_nationkey"), "o_orderpriority", t = 0.05)
    },

    // Cochran-Armitage trend test (DataQuality.cochranArmitage): is the
    // urgent-order rate trending across order YEARS? The ordered-category
    // test chi-square independence ignores — cross-multiplied exact
    // integer numerator/spread through DECIMAL(38,0), one fixed-order z,
    // the shared A&S two-sided p.
    Q(
      "quality_trend_test",
      Some("""
        WITH b AS (SELECT CAST(year(o_orderdate) - 1992 AS BIGINT) AS w,
                          CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS s
                   FROM orders),
        cat AS (SELECT w, COUNT(*) AS n, CAST(SUM(s) AS BIGINT) AS r FROM b GROUP BY 1),
        tot AS (SELECT COUNT(*) AS k, CAST(SUM(n) AS BIGINT) AS n_total,
                       CAST(SUM(r) AS BIGINT) AS r_total,
                       SUM(CAST(w AS HUGEINT) * n) AS swn,
                       SUM(CAST(w AS HUGEINT) * w * n) AS sw2n
                FROM cat),
        ag AS (SELECT (SELECT k FROM tot) AS k,
                      (SELECT n_total FROM tot) AS n_total,
                      (SELECT r_total FROM tot) AS r_total,
                      CAST(SUM(CAST(w AS HUGEINT)
                        * (CAST((SELECT n_total FROM tot) AS HUGEINT) * r
                           - CAST(n AS HUGEINT) * (SELECT r_total FROM tot))) AS BIGINT) AS a_num,
                      CAST((SELECT CAST(n_total AS HUGEINT) * sw2n - swn * swn FROM tot) AS BIGINT) AS b_num
               FROM cat),
        fin AS (SELECT k, n_total, r_total, a_num, b_num,
                       round(CASE WHEN r_total > 0 AND r_total < n_total AND b_num > 0
                             THEN CAST(a_num AS DOUBLE)
                                  * sqrt(CAST(n_total AS DOUBLE)
                                         / (CAST(r_total AS DOUBLE) * CAST(n_total - r_total AS DOUBLE)
                                            * CAST(b_num AS DOUBLE)))
                             END, 6) AS z
                FROM ag),
        pv AS (SELECT fin.*, abs(z) / sqrt(2.0) AS x,
                      1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt
               FROM fin)
        SELECT k, n_total, r_total, a_num, b_num, z,
               CASE WHEN z IS NOT NULL
                    THEN round(((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
                                 - 0.284496736) * tt + 0.254829592) * tt * exp(-x * x), 9)
               END AS p_value,
               CASE WHEN z IS NOT NULL
                    THEN round(((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
                                 - 0.284496736) * tt + 0.254829592) * tt * exp(-x * x), 9) <= 0.05
               END AS significant
        FROM pv
      """)) { (spark, dir) =>
      DataQuality.cochranArmitage(
        Tables(spark, dir).orders.select(
          (year(col("o_orderdate")) - 1992).cast("long").as("yr"),
          col("o_orderpriority")),
        "yr", col("o_orderpriority") === "1-URGENT", alphaSig = 0.05)
    },

    // Quantile normalization (DataQuality.quantileNormalize): map every
    // segment's account-balance distribution onto the pooled reference by
    // interpolated quantile at the within-group rank position — the
    // batch-effect correction. Exact integer ranks, grid-9 fraction, one
    // interpolation under round(., 6).
    Q(
      "quality_quantile_normalize",
      Some("""
        WITH pts AS (SELECT c_mktsegment AS g, CAST(c_acctbal AS DOUBLE) AS v FROM customer),
        rk AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS r,
                      COUNT(*) OVER (PARTITION BY g) AS ng FROM pts),
        nn AS (SELECT COUNT(*) AS n FROM pts),
        pool AS (SELECT v AS pv, row_number() OVER (ORDER BY v) AS idx FROM pts),
        wt AS (SELECT g, v,
                      CAST(floor((CAST(r AS DOUBLE) - 0.5) / CAST(ng AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS BIGINT) AS k,
                      round((CAST(r AS DOUBLE) - 0.5) / CAST(ng AS DOUBLE) * CAST(n - 1 AS DOUBLE)
                            - floor((CAST(r AS DOUBLE) - 0.5) / CAST(ng AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 9) AS frac
               FROM rk CROSS JOIN nn)
        SELECT wt.g AS c_mktsegment, wt.v AS c_acctbal,
               round(lo.pv + wt.frac * (COALESCE(hi.pv, lo.pv) - lo.pv), 6) AS qn_value
        FROM wt JOIN pool lo ON lo.idx = wt.k + 1
        LEFT JOIN pool hi ON hi.idx = wt.k + 2
      """)) { (spark, dir) =>
      DataQuality.quantileNormalize(Tables(spark, dir).customer, "c_mktsegment", "c_acctbal")
    },

    // Cohen's kappa (DataQuality.cohensKappa): chance-corrected agreement
    // between two automated document-quality raters (char-length vs
    // word-count gates) — exact integer contingency/margins, kappa from
    // the cross-multiplied form in ONE division, never from rounded p's.
    Q(
      "quality_cohens_kappa",
      Some("""
        WITH r AS (SELECT CASE WHEN length(text) >= 150 THEN 'long' ELSE 'short' END AS a,
                          CASE WHEN len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) >= 30
                               THEN 'long' ELSE 'short' END AS b
                   FROM documents),
        cells AS (SELECT a, b, COUNT(*) AS o FROM r GROUP BY 1, 2),
        ma AS (SELECT a AS c, SUM(o) AS na FROM cells GROUP BY 1),
        mb AS (SELECT b AS c, SUM(o) AS nb FROM cells GROUP BY 1),
        marg AS (SELECT COALESCE(ma.c, mb.c) AS c, COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
                 FROM ma FULL OUTER JOIN mb ON ma.c = mb.c),
        agg AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                       CAST(SUM(CASE WHEN a = b THEN o ELSE 0 END) AS BIGINT) AS agree
                FROM cells),
        ex AS (SELECT COUNT(*) AS n_categories,
                      SUM(CAST(na AS HUGEINT) * nb) AS pe_num
               FROM marg)
        SELECT n, n_categories,
               round(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_observed,
               round(CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS p_expected,
               round(CASE WHEN CAST(n AS HUGEINT) * n <> pe_num
                          THEN CAST(CAST(n AS HUGEINT) * agree - pe_num AS DOUBLE)
                               / CAST(CAST(n AS HUGEINT) * n - pe_num AS DOUBLE)
                     END, 6) AS kappa
        FROM agg, ex
      """)) { (spark, dir) =>
      val toksN = size(filter(split(col("text"), "\\s+"), t => length(t) > 0))
      val rated = Tables(spark, dir).documents.select(
        when(length(col("text")) >= 150, "long").otherwise("short").as("rater_a"),
        when(toksN >= 30, "long").otherwise("short").as("rater_b"))
      DataQuality.cohensKappa(rated, "rater_a", "rater_b")
    },

    // Seeded Poisson bootstrap CI (DataQuality.bootstrapMeanCi): error
    // bars for the mean order value from ONE pass — 64 replicates ride a
    // B-way explode with Poisson(1) weights drawn by inverse CDF from the
    // exact dyadic splitmix u, replicate means are exact decimal sums
    // with one division each, the interval is a pure rank selection.
    Q(
      "ml_bootstrap_ci",
      Some(bootstrapCiSql(b = 64, alpha = 0.05))) { (spark, dir) =>
      DataQuality.bootstrapMeanCi(
        Tables(spark, dir).orders, "o_orderkey", "o_totalprice", b = 64, alpha = 0.05)
    },

    // Mondrian k-anonymization (DataQuality.mondrianAnonymize): the
    // GENERALIZER behind the k-anonymity audit — greedy median
    // partitioning of (balance cents, nation) until no split keeps both
    // sides >= 25, records released as class [lo, hi] ranges. The oracle
    // unrolls all 6 rounds; post-fixpoint rounds are no-ops so engine
    // early-stopping and the padded replay agree.
    Q(
      "privacy_mondrian",
      Some(mondrianSql(k = 25L, rounds = 6))) { (spark, dir) =>
      val prepped = Tables(spark, dir).customer.select(
        round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"),
        col("c_nationkey").cast("long").as("nat"))
      DataQuality.mondrianAnonymize(prepped, Seq("bal_cents", "nat"), k = 25L, rounds = 6)
    },

    // Seeded randomized response (DataQuality.randomizedResponse): the
    // local-DP primitive — each customer reports acctbal>0 truthfully
    // with p=0.75 (flip decided by splitmix64(custkey ^ seed), exact
    // dyadic u), and the per-segment unbiased estimator recovers the true
    // fraction from reported counts alone; the true fraction rides along
    // for the audit. The oracle replays hash, u, flips, and both
    // single-division formulas bit-for-bit.
    Q(
      "privacy_randomized_response",
      Some(randomizedResponseSql(seed = 20260814L))) { (spark, dir) =>
      DataQuality.randomizedResponse(
        Tables(spark, dir).customer, "c_mktsegment", "c_custkey",
        col("c_acctbal") > 0, seed = 20260814L, p = 0.75)
    },

    // Seeded ε-DP count release (Laplace, sensitivity 1, b = 1/ε = 2):
    // daily event counts plus noise derived deterministically from
    // (day ⊕ seed) through splitmix64 inverse-CDF sampling — the
    // reproducible-release pattern (re-derivable, auditable; a fresh seed
    // is a fresh release). The oracle replays the hash, the exact dyadic
    // u, the grid-12 ln, and the decimal sum; round(·, 6).
    Q(
      "privacy_dp_counts",
      Some(dpCountsSql(seed = 20240814L, b = 2))) { (spark, dir) =>
      DataQuality.dpNoisyCounts(
        Tables(spark, dir).events,
        unix_date(to_date(col("ts"))).cast("long"),
        "day",
        seed = 20240814L,
        noiseScale = 2)
    },

    // Behavioral path mining: counts of length-3 consecutive event-type
    // sequences per user (lead pairs in total (ts, event_id) order) — the
    // "what do users actually do" funnel-discovery primitive the Markov
    // matrix below summarizes to first order. All-integer; the path
    // universe is |event_types|³-bounded, so the aggregation is tiny
    // regardless of event volume.
    Q(
      "events_paths",
      Some("""
        WITH seq AS (SELECT event_type AS e1,
                            lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
                            lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
                     FROM events)
        SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n_paths
        FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        GROUP BY 1
      """)) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(spark, dir).events
        .select(
          col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
        .agg(count(lit(1)).as("n_paths"))
    },

    // First-order Markov transition matrix over per-user event sequences:
    // P(next|prev) from lag pairs in total (ts, event_id) order — the
    // behavior model behind next-action prediction; improbable transitions
    // are the anomaly signal. Exact count ratios rounded to 6.
    Q(
      "events_markov",
      Some("""
        WITH seq AS (SELECT user_id, event_type AS next_type,
                            lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
                     FROM events),
        p AS (SELECT prev_type, next_type, COUNT(*) AS n_transitions
              FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        t AS (SELECT prev_type, CAST(SUM(n_transitions) AS BIGINT) AS n_from FROM p GROUP BY 1)
        SELECT p.prev_type, p.next_type, p.n_transitions,
               ROUND(CAST(p.n_transitions AS DOUBLE) / t.n_from, 6) AS prob
        FROM p JOIN t USING (prev_type)
      """)) { (spark, dir) =>
      Funnel.markovTransitions(Tables(spark, dir).events, "user_id", "ts", "event_type", "event_id")
    },

    // --------------------------------------------- Wald SPRT (daily)
    // The always-valid sequential test beside events_ab_ztest: is the
    // purchase share of the event mix drifting to p1 = 0.22 or holding
    // at p0 = 0.18? LLR has the closed form c·ln(p1/p0) +
    // (n−c)·ln((1−p1)/(1−p0)) over cumulative counts, so daily
    // checkpoints need only a count rollup; ln literals/thresholds on
    // the 1e-12 grid, exact decimal compares.
    Q(
      "events_sprt",
      Some(sprtSql(p0 = 0.18, p1 = 0.22, alpha = 0.05, beta = 0.05, convType = "purchase"))) {
      (spark, dir) =>
        graft.operators.Funnel.sprtDaily(
          Tables(spark, dir).events, "ts", "event_type", "purchase",
          p0 = 0.18, p1 = 0.22, alpha = 0.05, beta = 0.05)
    },

    // ------------------------------------ position-based attribution
    // The U-shaped leg of the attribution trio: converted journeys give
    // first/last touches 40% each, middles split 20% (1-touch 100%,
    // 2-touch 50/50). Weights snap to 1e-9; per-channel credit is an
    // exact decimal sum under round(·, 6).
    Q(
      "events_position_attribution",
      Some("""
        WITH seq AS (SELECT user_id AS u, event_type AS t,
                            row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                     FROM events),
        conv AS (SELECT u, MIN(rn) AS crn FROM seq WHERE t = 'purchase' GROUP BY 1),
        touches AS (SELECT s.u, s.t, s.rn FROM seq s JOIN conv c ON c.u = s.u
                    WHERE s.t <> 'purchase' AND s.rn < c.crn),
        pos AS (SELECT u, t, row_number() OVER (PARTITION BY u ORDER BY rn) AS pos,
                       COUNT(*) OVER (PARTITION BY u) AS n
                FROM touches),
        wt AS (SELECT t AS channel,
                      CAST(round(CASE WHEN n = 1 THEN 1.0
                                      WHEN n = 2 THEN 0.5
                                      WHEN pos = 1 OR pos = n THEN 0.4
                                      ELSE 0.2 / CAST(n - 2 AS DOUBLE) END, 9) AS DECIMAL(20,9)) AS w
               FROM pos)
        SELECT channel, COUNT(*) AS n_touches,
               CAST(round(SUM(w), 6) AS DOUBLE) AS credit
        FROM wt GROUP BY 1 ORDER BY 1
      """)) { (spark, dir) =>
      graft.operators.Funnel.positionAttribution(
        Tables(spark, dir).events, "user_id", "ts", "event_id", "event_type", "purchase")
    },

    // ------------------------------------- Shapley-value attribution
    // The game-theoretic leg completing the attribution quartet (Zhao et
    // al. 2018 coalition method): journeys collapse to their exposure
    // coalition, v(S) = conversion rate of journeys with coalition ⊆ S
    // (inclusive — what converts when only S exists; the convention
    // under which a never-touched channel is an exact null player), and
    // each channel's credit is its factorial-weighted average marginal
    // contribution. The oracle enumerates all 2^n coalitions as a
    // bit-cross-join, snaps v to the 1e-9 grid, sums exact decimals and
    // divides by n! once — the same arithmetic the driver-side
    // BigDecimal fold performs.
    Q(
      "events_shapley_attribution",
      Some(shapleySql(
        channels = Seq("click", "error", "signup", "view"),
        convType = "purchase"))) { (spark, dir) =>
      graft.operators.Funnel.shapleyAttribution(
        Tables(spark, dir).events, "user_id", "ts", "event_type",
        convType = "purchase",
        channels = Seq("click", "error", "signup", "view"))
    },

    // -------------------------------- Markov removal-effect attribution
    // The data-driven alternative to last-touch (Anderl et al. 2016):
    // journeys as START → touches → CONV/DROP, each channel credited by
    // the conversion-probability drop when its state is removed (mass
    // flows to DROP — no renormalization). The chain is model-bounded so
    // value iteration runs driver-side in exact BigDecimal; the oracle
    // unrolls 12 JOIN-steps per run (full + one per channel), products
    // on the 1e-9 grid, exact decimal sums — bit-equal trajectories.
    Q(
      "events_markov_attribution",
      Some(markovAttributionSql(
        channels = Seq("click", "error", "signup", "view"),
        convType = "purchase",
        steps = 12))) { (spark, dir) =>
      graft.operators.Funnel.markovRemovalAttribution(
        Tables(spark, dir).events, "user_id", "ts", "event_id", "event_type",
        convType = "purchase", steps = 12)
    },

    // ------------------------------------------------- map-type functions
    // JSON props parsed to a real MapType, then map_keys/size — scalar
    // string/int outputs keep the cross-engine compare exact.
    Q(
      "map_funcs_events",
      Some("""
        SELECT event_id,
               array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
               len(json_keys(props)) AS n_keys
        FROM events
      """)) { (spark, dir) =>
      val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))
      Tables(spark, dir).events
        .select(
          col("event_id"),
          concat_ws(",", array_sort(map_keys(m))).as("keys_csv"),
          size(map_keys(m)).as("n_keys"))
    },

    // ------------------------------------------- corrupt-record quarantine
    // PERMISSIVE parsing with an explicit _corrupt_record column: at 100 TB
    // some rows ARE malformed, and the job must quarantine and count them,
    // not die (FAILFAST) or silently null them out. The query plants
    // deterministic corruption (every 7th event loses its last two JSON
    // bytes), parses with columnNameOfCorruptRecord, and audits per type:
    // totals, corrupt counts, and the valid-only sum. DuckDB replays via
    // json_valid + TRY_CAST.
    Q(
      "json_corrupt_audit",
      Some("""
        WITH c AS (
          SELECT event_type,
                 CASE WHEN event_id % 7 = 0
                      THEN substring(props, 1, CAST(length(props) AS INT) - 2)
                      ELSE props END AS props
          FROM events),
        p AS (
          SELECT event_type, json_valid(props) AS ok,
                 CASE WHEN json_valid(props)
                      THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
          FROM c)
        SELECT event_type,
               COUNT(*) AS n,
               CAST(COUNT(CASE WHEN NOT ok THEN 1 END) AS BIGINT) AS n_corrupt,
               CAST(SUM(k) AS BIGINT) AS sum_k_valid
        FROM p GROUP BY event_type
      """)) { (spark, dir) =>
      import org.apache.spark.sql.types.{LongType, StringType, StructType}
      val corrupted = when(
        pmod(col("event_id"), lit(7)) === 0,
        expr("substring(props, 1, length(props) - 2)")).otherwise(col("props"))
      val schema = new StructType().add("k", LongType).add("_corrupt_record", StringType)
      val parsed = from_json(
        corrupted,
        schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record"))
      Tables(spark, dir).events
        .select(col("event_type"), parsed.as("p"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          count(when(col("p._corrupt_record").isNotNull, 1)).as("n_corrupt"),
          sum(when(col("p._corrupt_record").isNull, col("p.k"))).as("sum_k_valid"))
    },

    // ------------------------------------------------------- VARIANT type
    // Spark 4's semi-structured VARIANT: props parse ONCE into the binary
    // variant encoding (parse_json), typed extraction via variant_get, and
    // a per-type rollup — the open-schema ingestion path that replaces
    // per-query string re-parsing at scale (parse once, extract many).
    // Exact integer outputs; DuckDB replays through its JSON reader.
    Q(
      "json_variant_agg",
      Some("""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
               CAST(COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS BIGINT) AS n_hot
        FROM events GROUP BY event_type
      """)) { (spark, dir) =>
      val k = variant_get(parse_json(col("props")), "$.k", "long")
      Tables(spark, dir).events
        .select(col("event_type"), k.as("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"),
          count(when(col("k") > 50, 1)).as("n_hot"))
    },

    // ----------------------------------------------- array-type functions
    // Order-free exact reductions over the embedding arrays (min/max are
    // copies of stored floats — no arithmetic, no FP divergence).
    Q(
      "array_funcs_embeddings",
      Some("""
        SELECT vec_id,
               len(embedding) AS dims,
               CAST(list_min(embedding) AS DOUBLE) AS mn,
               CAST(list_max(embedding) AS DOUBLE) AS mx
        FROM embeddings
      """)) { (spark, dir) =>
      Tables(spark, dir).embeddings
        .select(
          col("vec_id"),
          size(col("embedding")).as("dims"),
          array_min(col("embedding")).cast("double").as("mn"),
          array_max(col("embedding")).cast("double").as("mx"))
    }
  )

  /** Replay of [[graft.operators.DataQuality.dpNoisyCounts]] over daily
    * event counts: splitmix64 of (day ⊕ seed), u = top-53 bits / 2⁵³,
    * Laplace inverse CDF with the ln on the 1e-12 grid, exact decimal
    * sum, round 6 → double. */
  /** Oracle for events_sprt: the ln literals and thresholds are computed
    * with the SAME BigDecimal snap the operator uses, so the decimal
    * linear combination replays exactly. */
  private def sprtSql(p0: Double, p1: Double, alpha: Double, beta: Double, convType: String): String = {
    def s12(x: Double) =
      java.math.BigDecimal.valueOf(math.log(x)).setScale(12, java.math.RoundingMode.HALF_UP).toPlainString
    val l1 = s12(p1 / p0)
    val l0 = s12((1 - p1) / (1 - p0))
    val hi = s12((1 - beta) / alpha)
    val lo = s12(beta / (1 - alpha))
    val llr = s"c_cum * CAST($l1 AS DECIMAL(13,12)) + (n_cum - c_cum) * CAST($l0 AS DECIMAL(13,12))"
    s"""
      WITH daily AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_day,
                            CAST(SUM(CASE WHEN event_type = '$convType' THEN 1 ELSE 0 END) AS BIGINT) AS c_day
                     FROM events GROUP BY 1),
      cum AS (SELECT day, CAST(SUM(n_day) OVER w AS BIGINT) AS n_cum,
                     CAST(SUM(c_day) OVER w AS BIGINT) AS c_cum
              FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT CAST(day AS VARCHAR) AS day, n_cum, c_cum AS conv_cum,
             CAST(round($llr, 6) AS DOUBLE) AS llr,
             CASE WHEN $llr >= CAST($hi AS DECIMAL(13,12)) THEN 'accept_h1'
                  WHEN $llr <= CAST($lo AS DECIMAL(13,12)) THEN 'accept_h0'
                  ELSE 'continue' END AS decision
      FROM cum ORDER BY day
    """
  }

  /** Unrolled replay of Funnel.markovRemovalAttribution: journey CTEs
    * build the transition matrix (probabilities on the 1e-9 grid), then
    * one value-iteration chain per run (full + one per removed channel),
    * each `steps` JOIN-steps deep with round(p·v, 9) products and exact
    * decimal sums — the driver's BigDecimal fold, move for move. */
  private def markovAttributionSql(channels: Seq[String], convType: String, steps: Int): String = {
    def runCtes(r: Int, filter: String): String = {
      val first =
        s"""w${r}_1 AS MATERIALIZED (
          SELECT f AS state, CAST(SUM(CAST(round(CAST(p AS DOUBLE) * 1.0, 9) AS DECIMAL(20,9))) AS DECIMAL(20,9)) AS val
          FROM tr WHERE tgt = 'CONV' $filter GROUP BY 1)"""
      val rest = (2 to steps).map { k =>
        s"""w${r}_$k AS MATERIALIZED (
          SELECT tr.f AS state,
                 CAST(SUM(CAST(round(CAST(tr.p AS DOUBLE) * CAST(w.val AS DOUBLE), 9) AS DECIMAL(20,9))) AS DECIMAL(20,9)) AS val
          FROM tr JOIN (SELECT state, val FROM w${r}_${k - 1}
                        UNION ALL SELECT 'CONV', CAST(1 AS DECIMAL(20,9))) w
            ON w.state = tr.tgt
          WHERE TRUE $filter GROUP BY 1)"""
      }
      (first +: rest).mkString(",\n")
    }
    val runs = runCtes(0, "") +: channels.zipWithIndex.map { case (c, i) =>
      runCtes(i + 1, s"AND tr.f <> '$c' AND tr.tgt <> '$c'")
    }
    val resRows = channels.zipWithIndex.map { case (c, i) =>
      s"""SELECT '$c' AS channel,
             COALESCE((SELECT val FROM w0_$steps WHERE state = 'START'), CAST(0 AS DECIMAL(20,9))) AS pc,
             COALESCE((SELECT val FROM w${i + 1}_$steps WHERE state = 'START'), CAST(0 AS DECIMAL(20,9))) AS pr"""
    }.mkString("\nUNION ALL\n")
    s"""
      WITH seq AS MATERIALIZED (
        SELECT user_id AS u, event_type AS t,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
      conv AS MATERIALIZED (SELECT u, MIN(rn) AS crn FROM seq WHERE t = '$convType' GROUP BY 1),
      touches AS MATERIALIZED (
        SELECT s.u, s.t, s.rn, c.crn FROM seq s LEFT JOIN conv c ON c.u = s.u
        WHERE s.t <> '$convType' AND (c.crn IS NULL OR s.rn < c.crn)),
      mid AS (SELECT t AS f,
                     COALESCE(lead(t) OVER (PARTITION BY u ORDER BY rn),
                              CASE WHEN crn IS NOT NULL THEN 'CONV' ELSE 'DROP' END) AS tgt
              FROM touches),
      ft AS (SELECT u, arg_min(t, rn) AS ftype FROM touches GROUP BY 1),
      start AS (SELECT 'START' AS f,
                       COALESCE(ft.ftype, CASE WHEN c.crn IS NOT NULL THEN 'CONV' ELSE 'DROP' END) AS tgt
                FROM (SELECT DISTINCT u FROM seq) au
                LEFT JOIN ft ON ft.u = au.u LEFT JOIN conv c ON c.u = au.u),
      cnt AS (SELECT f, tgt, COUNT(*) AS n
              FROM (SELECT f, tgt FROM mid UNION ALL SELECT f, tgt FROM start) GROUP BY 1, 2),
      tot AS (SELECT f, CAST(SUM(n) AS BIGINT) AS nf FROM cnt GROUP BY 1),
      tr AS MATERIALIZED (
        SELECT cnt.f, cnt.tgt,
               CAST(round(CAST(cnt.n AS DOUBLE) / CAST(tot.nf AS DOUBLE), 9) AS DECIMAL(20,9)) AS p
        FROM cnt JOIN tot ON tot.f = cnt.f),
      ${runs.mkString(",\n")},
      res AS ($resRows),
      re AS (SELECT channel, pc, pr,
                    CASE WHEN pc <> 0
                         THEN CAST(round(CAST(pc - pr AS DOUBLE) / CAST(pc AS DOUBLE), 9) AS DECIMAL(20,9))
                    END AS re9
             FROM res),
      tre AS (SELECT CAST(SUM(re9) AS DECIMAL(20,9)) AS s FROM re)
      SELECT channel,
             CAST(round(pc, 6) AS DOUBLE) AS p_conv,
             CAST(round(pr, 6) AS DOUBLE) AS p_removed,
             CAST(round(re9, 6) AS DOUBLE) AS removal_effect,
             CASE WHEN s <> 0 THEN round(CAST(re9 AS DOUBLE) / CAST(s AS DOUBLE), 6) END AS attribution
      FROM re, tre ORDER BY channel
    """
  }

  /** Unrolled-round replay of Boosting.trainStumps (the BPE/k-core CTE
    * discipline): each round re-derives the residual histogram from the
    * previous round's MATERIALIZED residual table, picks the (gain desc,
    * feature, bin) argmax, and applies the grid-snapped leaves — so the
    * model rows AND the Σ|residual| witnesses replay bit-for-bit.
    * eta = 0.5 baked in (exact binary). */
  private def stumpsSql(rounds: Int): String = {
    val base =
      """r0 AS MATERIALIZED (
        SELECT CAST(l_quantity AS BIGINT) AS bq,
               CAST(round(l_discount * 100) AS BIGINT) AS bd,
               CAST(round(l_tax * 100) AS BIGINT) AS bt,
               CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS DECIMAL(20,12)) AS r
        FROM lineitem)"""
    val roundCtes = (1 to rounds).map { k =>
      val prev = s"r${k - 1}"
      s"""m$k AS MATERIALIZED (
        WITH melt AS (SELECT 'quantity' AS feature, bq AS bin, r FROM $prev
                      UNION ALL SELECT 'discount', bd, r FROM $prev
                      UNION ALL SELECT 'tax', bt, r FROM $prev),
        g AS (SELECT feature, bin, SUM(r) AS sb, COUNT(*) AS nb FROM melt GROUP BY 1, 2),
        c AS (SELECT feature, bin, SUM(sb) OVER w AS rl, CAST(SUM(nb) OVER w AS BIGINT) AS nl
              FROM g WINDOW w AS (PARTITION BY feature ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        t AS (SELECT feature, SUM(sb) AS rt, CAST(SUM(nb) AS BIGINT) AS nt FROM g GROUP BY 1),
        cand AS (SELECT c.feature, c.bin, c.nl, t.nt - c.nl AS nr, t.nt,
                        round(c.rl, 6) AS rl6, round(t.rt - c.rl, 6) AS rr6, round(t.rt, 6) AS rt6
                 FROM c JOIN t USING (feature) WHERE c.nl < t.nt),
        sc AS (SELECT feature, bin, nl, nr,
                      round((CAST(rl6 AS DOUBLE) * CAST(rl6 AS DOUBLE) / CAST(nl AS DOUBLE)
                           + CAST(rr6 AS DOUBLE) * CAST(rr6 AS DOUBLE) / CAST(nr AS DOUBLE))
                           - CAST(rt6 AS DOUBLE) * CAST(rt6 AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS gain,
                      CAST(round(0.5 * (CAST(rl6 AS DOUBLE) / CAST(nl AS DOUBLE)), 12) AS DECIMAL(20,12)) AS vl,
                      CAST(round(0.5 * (CAST(rr6 AS DOUBLE) / CAST(nr AS DOUBLE)), 12) AS DECIMAL(20,12)) AS vr
               FROM cand)
        SELECT * FROM sc ORDER BY gain DESC, feature, bin LIMIT 1),
      r$k AS MATERIALIZED (
        SELECT p.bq, p.bd, p.bt,
               CAST(p.r - CASE WHEN (m.feature = 'quantity' AND p.bq <= m.bin)
                                 OR (m.feature = 'discount' AND p.bd <= m.bin)
                                 OR (m.feature = 'tax' AND p.bt <= m.bin)
                           THEN m.vl ELSE m.vr END AS DECIMAL(20,12)) AS r
        FROM $prev p, m$k m),
      a$k AS (SELECT CAST(round(SUM(ABS(r)), 6) AS DOUBLE) AS s FROM r$k)"""
    }
    val sel = (1 to rounds)
      .map { k =>
        s"""SELECT $k AS round, m.feature, m.bin AS split_bin, m.nl AS n_left, m.nr AS n_right,
               m.gain, CAST(round(m.vl, 6) AS DOUBLE) AS leaf_left,
               CAST(round(m.vr, 6) AS DOUBLE) AS leaf_right, a.s AS resid_abs_sum
           FROM m$k m, a$k a"""
      }
      .mkString("\nUNION ALL\n")
    s"WITH $base,\n${roundCtes.mkString(",\n")}\n$sel"
  }

  /** DuckDB replay of [[graft.operators.Layout.zoneMapAudit]]: the Morton
    * interleave as the same statically-unrolled shift/mask OR-chain, both
    * bucketings, zone maps, and the intersect-the-rectangle touch rule —
    * generated so the 2·bits terms stay mechanically identical to the
    * Spark fold. */
  private def zorderPruneSql(
      bits: Int, bucketBits: Int, x0: Long, x1: Long, y0: Long, y1: Long): String = {
    val mask  = (1L << bits) - 1
    val shift = 2 * bits - bucketBits
    val inter = ((0 until bits).map(i => s"(((x >> $i) & 1) << ${2 * i})") ++
      (0 until bits).map(i => s"(((y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
    def arm(src: String, name: String) =
      s"""SELECT '$name' AS layout, COUNT(*) AS n_buckets,
            CAST(SUM(CASE WHEN min_x <= $x1 AND max_x >= $x0 AND min_y <= $y1 AND max_y >= $y0
                          THEN 1 ELSE 0 END) AS BIGINT) AS buckets_touched,
            CAST(SUM(CASE WHEN min_x <= $x1 AND max_x >= $x0 AND min_y <= $y1 AND max_y >= $y0
                          THEN n_rows ELSE 0 END) AS BIGINT) AS rows_in_touched,
            CAST(SUM(n_hit) AS BIGINT) AS rows_matching
          FROM $src"""
    s"""WITH base AS (SELECT (o_custkey & $mask) AS x,
                             (date_diff('day', DATE '1992-01-01', o_orderdate) & $mask) AS y
                      FROM orders),
       keyed AS (SELECT x, y,
                        (($inter) >> $shift) AS b_zorder,
                        (((x << $bits) | y) >> $shift) AS b_lex,
                        (x BETWEEN $x0 AND $x1 AND y BETWEEN $y0 AND $y1) AS hit
                 FROM base),
       az AS (SELECT b_zorder AS b, MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y,
                     MAX(y) AS max_y, COUNT(*) AS n_rows,
                     SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS n_hit
              FROM keyed GROUP BY 1),
       al AS (SELECT b_lex AS b, MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y,
                     MAX(y) AS max_y, COUNT(*) AS n_rows,
                     SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS n_hit
              FROM keyed GROUP BY 1)
       SELECT * FROM (${arm("az", "zorder")} UNION ALL ${arm("al", "lex")})
       ORDER BY layout DESC"""
  }

  /** DuckDB replay of [[graft.operators.DataQuality.bootstrapMeanCi]] on
    * orders.o_totalprice: the splitmix64 chain per (row, replicate), the
    * exact dyadic u, the shared Poisson(1) CDF ladder, decimal replicate
    * means, and the rank-selected interval. */
  private def bootstrapCiSql(b: Int, alpha: Double): String = {
    def mulmod(a: String, c: String): String =
      s"""CAST((( ($a & 4294967295)::HUGEINT * $c::HUGEINT
         | + ((( ($a) >> 32)::HUGEINT * $c::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
         | ) % 18446744073709551616::HUGEINT) AS UBIGINT)""".stripMargin
    val salts = (0 until b)
      .map(j =>
        s"($j, ${java.lang.Long.toUnsignedString(Sketches.BloomGolden * (j + 1).toLong)}::UBIGINT)")
      .mkString(", ")
    val ladder = DataQuality.Poisson1Cdf.zipWithIndex
      .map { case (c, k) => s"WHEN u < $c THEN $k" }
      .mkString(" ")
    val loRank = math.max(1, math.ceil(alpha / 2.0 * b).toInt)
    val hiRank = b + 1 - loRank
    s"""WITH r AS (SELECT CAST(o_orderkey AS UBIGINT) AS key,
                          CAST(o_totalprice AS DECIMAL(28,2)) AS x
                   FROM orders),
       salts(b, salt) AS (VALUES $salts),
       f AS (SELECT r.x, s.b, xor(r.key, s.salt) AS y FROM r CROSS JOIN salts s),
       a1 AS (SELECT x, b, xor(y, y >> 30) AS a FROM f),
       b1 AS (SELECT x, b, ${mulmod("a", "13787848793156543929")} AS z FROM a1),
       c1 AS (SELECT x, b, xor(z, z >> 27) AS a FROM b1),
       d1 AS (SELECT x, b, ${mulmod("a", "10723151780598845931")} AS z FROM c1),
       e1 AS (SELECT x, b, xor(z, z >> 31) AS h FROM d1),
       uu AS (SELECT x, b, CAST(h >> 11 AS DOUBLE) / 9007199254740992.0 AS u FROM e1),
       ww AS (SELECT x, b, CASE $ladder ELSE ${DataQuality.Poisson1Cdf.size} END AS w FROM uu),
       reps AS (SELECT b, round(CAST(SUM(x * w) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 9) AS m
                FROM ww GROUP BY b HAVING SUM(w) > 0),
       ranked AS (SELECT m, row_number() OVER (ORDER BY m ASC, b ASC) AS rn FROM reps),
       ci AS (SELECT MAX(CASE WHEN rn = $loRank THEN m END) AS ci_lo,
                     MAX(CASE WHEN rn = $hiRank THEN m END) AS ci_hi
              FROM ranked),
       tot AS (SELECT COUNT(*) AS n, SUM(x) AS sx FROM r)
       SELECT n, $b AS n_replicates,
              round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 9) AS mean,
              round(ci_lo, 6) AS ci_lo, round(ci_hi, 6) AS ci_hi
       FROM tot, ci"""
  }

  /** DuckDB replay of [[graft.operators.DataQuality.mondrianAnonymize]]
    * on customer (balance cents, nation) at a fixed round budget: each
    * unrolled round recomputes per-partition stats, the strict-> widest
    * dimension, the lower-median rank selection, and the both-sides-≥-k
    * split rule — rounds past the fixpoint are no-ops, so engine
    * early-stopping and the padded replay agree exactly. */
  private def mondrianSql(k: Long, rounds: Int): String = {
    val roundCtes = (0 until rounds).map { r =>
      s"""s${r}s AS MATERIALIZED (SELECT pid, COUNT(*) AS n,
         |      MIN(q0) AS lo0, MAX(q0) AS hi0, MIN(q1) AS lo1, MAX(q1) AS hi1
         |      FROM p$r GROUP BY pid),
         |s${r}d AS (SELECT pid, n,
         |      CASE WHEN (hi1 - lo1) > (hi0 - lo0) THEN 1 ELSE 0 END AS dim FROM s${r}s),
         |s${r}v AS (SELECT p.q0, p.q1, p.pid, s.n, s.dim,
         |      CASE WHEN s.dim = 0 THEN p.q0 ELSE p.q1 END AS v
         |      FROM p$r p JOIN s${r}d s USING (pid)),
         |s${r}r AS (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY v) AS rn FROM s${r}v),
         |s${r}m AS (SELECT pid, MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) AS med
         |      FROM s${r}r GROUP BY pid),
         |s${r}x AS (SELECT r.q0, r.q1, r.pid, r.n, r.v, m.med,
         |      SUM(CASE WHEN r.v <= m.med THEN 1 ELSE 0 END) OVER (PARTITION BY r.pid) AS n_left
         |      FROM s${r}r r JOIN s${r}m m USING (pid)),
         |p${r + 1} AS MATERIALIZED (SELECT q0, q1,
         |      CASE WHEN n_left >= $k AND (n - n_left) >= $k
         |           THEN pid || (CASE WHEN v <= med THEN 'L' ELSE 'R' END)
         |           ELSE pid END AS pid
         |      FROM s${r}x)""".stripMargin
    }.mkString(",\n")
    s"""WITH p0 AS MATERIALIZED (
         SELECT CAST(round(c_acctbal * 100, 0) AS BIGINT) AS q0, CAST(c_nationkey AS BIGINT) AS q1,
                'r' AS pid
         FROM customer),
       $roundCtes
       SELECT pid AS class_id, COUNT(*) AS n,
              MIN(q0) AS bal_cents_lo, MAX(q0) AS bal_cents_hi,
              MIN(q1) AS nat_lo, MAX(q1) AS nat_hi
       FROM p$rounds GROUP BY pid ORDER BY class_id"""
  }

  /** DuckDB replay of [[graft.operators.DataQuality.randomizedResponse]]
    * on customer/(acctbal>0) at p = 0.75: the splitmix64 chain on
    * custkey ⊕ seed, the exact dyadic u, the u < p flip, and both
    * one-division formulas. */
  private def randomizedResponseSql(seed: Long): String = {
    def mulmod(a: String, c: String): String =
      s"""CAST((( ($a & 4294967295)::HUGEINT * $c::HUGEINT
         | + ((( ($a) >> 32)::HUGEINT * $c::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
         | ) % 18446744073709551616::HUGEINT) AS UBIGINT)""".stripMargin
    s"""
    WITH g AS (SELECT c_mktsegment AS seg, (c_acctbal > 0) AS t,
                      xor(CAST(c_custkey AS UBIGINT), $seed::UBIGINT) AS x
               FROM customer),
    a1 AS (SELECT seg, t, xor(x, x >> 30) AS a FROM g),
    a2 AS (SELECT seg, t, ${mulmod("a", "13787848793156543929")} AS z FROM a1),
    a3 AS (SELECT seg, t, xor(z, z >> 27) AS a FROM a2),
    a4 AS (SELECT seg, t, ${mulmod("a", "10723151780598845931")} AS z FROM a3),
    hx AS (SELECT seg, t, xor(z, z >> 31) AS h FROM a4),
    uu AS (SELECT seg, t, CAST(h >> 11 AS DOUBLE) / 9007199254740992.0 AS u FROM hx),
    rp AS (SELECT seg, t, (t = (u < 0.75)) AS rep FROM uu),
    ag AS (SELECT seg, COUNT(*) AS n,
                  CAST(SUM(CASE WHEN rep THEN 1 ELSE 0 END) AS BIGINT) AS n_yes_reported,
                  CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_yes_true
           FROM rp GROUP BY 1)
    SELECT seg AS c_mktsegment, n, n_yes_reported,
           round((CAST(n_yes_reported AS DOUBLE) / CAST(n AS DOUBLE) + (-0.25)) / 0.5, 6) AS pi_hat,
           round(CAST(n_yes_true AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pi_true
    FROM ag ORDER BY c_mktsegment"""
  }

  private def dpCountsSql(seed: Long, b: Int): String = {
    def mulmod(a: String, c: String): String =
      s"""CAST((( ($a & 4294967295)::HUGEINT * $c::HUGEINT
         | + ((( ($a) >> 32)::HUGEINT * $c::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
         | ) % 18446744073709551616::HUGEINT) AS UBIGINT)""".stripMargin
    s"""
    WITH g AS (SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM events GROUP BY 1),
    k0 AS (SELECT day, cnt, xor(CAST(day AS UBIGINT), $seed::UBIGINT) AS x FROM g),
    a1 AS (SELECT day, cnt, xor(x, x >> 30) AS a FROM k0),
    a2 AS (SELECT day, cnt, ${mulmod("a", "13787848793156543929")} AS z FROM a1),
    a3 AS (SELECT day, cnt, xor(z, z >> 27) AS a FROM a2),
    a4 AS (SELECT day, cnt, ${mulmod("a", "10723151780598845931")} AS z FROM a3),
    hx AS (SELECT day, cnt, xor(z, z >> 31) AS h FROM a4),
    uu AS (SELECT day, cnt, CAST(h >> 11 AS DOUBLE) / 9007199254740992.0 AS u FROM hx),
    nz AS (SELECT day, cnt,
                  CASE WHEN u - 0.5 < 0 THEN -1 ELSE 1 END AS s,
                  greatest(1.0 - 2.0 * abs(u - 0.5), 1.1102230246251565e-16) AS a
           FROM uu),
    nv AS (SELECT day, cnt, CAST(round(ln(a), 12) AS DECIMAL(20,12)) * (-$b) * s AS noise FROM nz)
    SELECT day, CAST(round(CAST(cnt AS DECIMAL(20,12)) + noise, 6) AS DOUBLE) AS noisy_count FROM nv"""
  }

  /** Full relational replay of [[graft.operators.Sketches.bloomMembership]]
    * over the events gate fixture: the splitmix64 finalizer twice per key
    * (h1, and h2 from x ⊕ φ with the low bit forced), the Kirsch-
    * Mitzenmacher j-progression mod 2⁶⁴, top-`logBits` bit indices, the
    * member bit-set as a DISTINCT projection, and probe = all `nHashes`
    * bits present. Same HUGEINT mulmod machinery as the portable-HLL
    * oracle. */
  /** DuckDB replay of [[graft.operators.Sketches.cmsCounts]]: per hash
    * row, the splitmix64 chain over key ⊕ seed_r (HUGEINT mulmod — the
    * Bloom/HLL machinery), counters as a per-(row, bucket) SUM, point
    * estimates as LEAST over the row lookups. */
  /** DuckDB replay of [[graft.operators.Sketches.amsF2]]: ONE splitmix64
    * HUGEINT chain over the (key-count × salts) frame, sign sums, squared
    * group sums, the medians-of-means rank selection, and the single
    * division — all bit-for-bit. */
  private def amsF2Sql(groups: Int, perGroup: Int): String = {
    def mulmod(a: String, c: String): String =
      s"""CAST((( ($a & 4294967295)::HUGEINT * $c::HUGEINT
         | + ((( ($a) >> 32)::HUGEINT * $c::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
         | ) % 18446744073709551616::HUGEINT) AS UBIGINT)""".stripMargin
    val salts = (0 until groups * perGroup)
      .map(j =>
        s"($j, ${java.lang.Long.toUnsignedString(Sketches.BloomGolden * (j + 1).toLong)}::UBIGINT)")
      .mkString(", ")
    val shift = Integer.numberOfTrailingZeros(perGroup)
    s"""WITH n AS (SELECT CAST(user_id AS UBIGINT) AS x, COUNT(*) AS cnt FROM events GROUP BY 1),
       salts(j, salt) AS (VALUES $salts),
       f AS (SELECT n.cnt, salts.j, xor(n.x, salts.salt) AS y FROM n CROSS JOIN salts),
       a1 AS (SELECT cnt, j, xor(y, y >> 30) AS a FROM f),
       b1 AS (SELECT cnt, j, ${mulmod("a", "13787848793156543929")} AS z FROM a1),
       c1 AS (SELECT cnt, j, xor(z, z >> 27) AS a FROM b1),
       d1 AS (SELECT cnt, j, ${mulmod("a", "10723151780598845931")} AS z FROM c1),
       e1 AS (SELECT cnt, j, xor(z, z >> 31) AS h FROM d1),
       sj AS (SELECT j, CAST(SUM(cnt * (1 - 2 * CAST(h & 1 AS BIGINT))) AS BIGINT) AS s
              FROM e1 GROUP BY 1),
       gs AS (SELECT (j >> $shift) AS g, SUM((s::HUGEINT) * s) AS gsum FROM sj GROUP BY 1),
       mid AS (SELECT SUM(gsum) AS midsum, COUNT(*) AS nmid FROM (
                 SELECT gsum, g, row_number() OVER (ORDER BY gsum ASC, g ASC) AS rn FROM gs)
               WHERE rn = ${(groups + 1) / 2} OR rn = ${groups / 2 + 1}),
       ex AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_distinct,
                     CAST(SUM((cnt::HUGEINT) * cnt) AS BIGINT) AS f2_exact FROM n)
       SELECT n_rows, n_distinct, f2_exact,
              round(CAST(midsum AS DOUBLE) / CAST(nmid * $perGroup AS DOUBLE), 6) AS f2_est,
              round(abs(round(CAST(midsum AS DOUBLE) / CAST(nmid * $perGroup AS DOUBLE), 6)
                        - CAST(f2_exact AS DOUBLE)) / CAST(f2_exact AS DOUBLE), 6) AS rel_err
       FROM ex, mid"""
  }

  /** DuckDB replay of [[graft.operators.Sketches.amsJoinSize]] on
    * (events.user_id, orders.o_custkey): two sign-sum chains off one
    * shared salt table, per-estimator products, the medians-of-means rank
    * selection, one division — plus the exact join size for the audit. */
  private def amsJoinSql(groups: Int, perGroup: Int): String = {
    def mulmod(a: String, c: String): String =
      s"""CAST((( ($a & 4294967295)::HUGEINT * $c::HUGEINT
         | + ((( ($a) >> 32)::HUGEINT * $c::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
         | ) % 18446744073709551616::HUGEINT) AS UBIGINT)""".stripMargin
    def chain(tag: String, src: String): String =
      s"""f$tag AS (SELECT $src.cnt, salts.j, xor($src.x, salts.salt) AS y FROM $src CROSS JOIN salts),
         |a$tag AS (SELECT cnt, j, xor(y, y >> 30) AS a FROM f$tag),
         |b$tag AS (SELECT cnt, j, ${mulmod("a", "13787848793156543929")} AS z FROM a$tag),
         |c$tag AS (SELECT cnt, j, xor(z, z >> 27) AS a FROM b$tag),
         |d$tag AS (SELECT cnt, j, ${mulmod("a", "10723151780598845931")} AS z FROM c$tag),
         |e$tag AS (SELECT cnt, j, xor(z, z >> 31) AS h FROM d$tag),
         |sj$tag AS (SELECT j, CAST(SUM(cnt * (1 - 2 * CAST(h & 1 AS BIGINT))) AS BIGINT) AS s
         |           FROM e$tag GROUP BY 1)""".stripMargin
    val salts = (0 until groups * perGroup)
      .map(j =>
        s"($j, ${java.lang.Long.toUnsignedString(Sketches.BloomGolden * (j + 1).toLong)}::UBIGINT)")
      .mkString(", ")
    val shift = Integer.numberOfTrailingZeros(perGroup)
    val est   = s"round(CAST(midsum AS DOUBLE) / CAST(nmid * $perGroup AS DOUBLE), 6)"
    s"""WITH na AS (SELECT CAST(user_id AS UBIGINT) AS x, COUNT(*) AS cnt FROM events GROUP BY 1),
       nb AS (SELECT CAST(o_custkey AS UBIGINT) AS x, COUNT(*) AS cnt FROM orders GROUP BY 1),
       salts(j, salt) AS (VALUES $salts),
       ${chain("a", "na")},
       ${chain("b", "nb")},
       prod AS (SELECT sja.j, (sja.s::HUGEINT) * sjb.s AS p FROM sja JOIN sjb USING (j)),
       gs AS (SELECT (j >> $shift) AS g, SUM(p) AS gsum FROM prod GROUP BY 1),
       mid AS (SELECT SUM(gsum) AS midsum, COUNT(*) AS nmid FROM (
                 SELECT gsum, g, row_number() OVER (ORDER BY gsum ASC, g ASC) AS rn FROM gs)
               WHERE rn = ${(groups + 1) / 2} OR rn = ${groups / 2 + 1}),
       ex AS (SELECT COALESCE(CAST(SUM((na.cnt::HUGEINT) * nb.cnt) AS BIGINT), 0) AS join_exact
              FROM na JOIN nb USING (x)),
       sza AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_a, COUNT(*) AS distinct_a FROM na),
       szb AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_b, COUNT(*) AS distinct_b FROM nb)
       SELECT n_a, n_b, distinct_a, distinct_b, join_exact, $est AS join_est,
              round(CASE WHEN join_exact > 0
                         THEN abs($est - CAST(join_exact AS DOUBLE)) / CAST(join_exact AS DOUBLE)
                    END, 6) AS rel_err
       FROM sza, szb, ex, mid"""
  }

  /** DuckDB replay of [[graft.operators.Sketches.cmsHeavyChange]]: the
    * integer-midpoint split, one splitmix64 bucket chain per depth row
    * over the distinct keys, per-(row, bucket, half) cell sums, the
    * min-over-rows estimates for both halves, and the
    * (|delta| desc, key) mover ranking. */
  private def cmsHeavyChangeSql(logW: Int, depth: Int, topK: Int): String = {
    def mulmod(a: String, c: String): String =
      s"""CAST((( ($a & 4294967295)::HUGEINT * $c::HUGEINT
         | + ((( ($a) >> 32)::HUGEINT * $c::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
         | ) % 18446744073709551616::HUGEINT) AS UBIGINT)""".stripMargin
    val chains = (0 until depth).map { r =>
      val seed = java.lang.Long.toUnsignedString(Sketches.BloomGolden * (r + 1).toLong)
      s"""r${r}y AS (SELECT x, xor(x, $seed::UBIGINT) AS y FROM keys),
         |r${r}a AS (SELECT x, xor(y, y >> 30) AS a FROM r${r}y),
         |r${r}b AS (SELECT x, ${mulmod("a", "13787848793156543929")} AS z FROM r${r}a),
         |r${r}c AS (SELECT x, xor(z, z >> 27) AS a FROM r${r}b),
         |r${r}d AS (SELECT x, ${mulmod("a", "10723151780598845931")} AS z FROM r${r}c),
         |r${r}e AS (SELECT x, xor(z, z >> 31) >> ${64 - logW} AS b FROM r${r}d),
         |r${r}cell AS (SELECT e.b, n.h, CAST(SUM(n.cnt) AS BIGINT) AS cell
         |              FROM r${r}e e JOIN n ON n.x = e.x GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val joins = (0 until depth).map { r =>
      s"""JOIN r${r}e ON r${r}e.x = keys.x
         |LEFT JOIN r${r}cell p${r}0 ON p${r}0.b = r${r}e.b AND p${r}0.h = 0
         |LEFT JOIN r${r}cell p${r}1 ON p${r}1.b = r${r}e.b AND p${r}1.h = 1""".stripMargin
    }.mkString("\n")
    val lo = (0 until depth).map(r => s"COALESCE(p${r}0.cell, 0)").mkString("LEAST(", ", ", ")")
    val hi = (0 until depth).map(r => s"COALESCE(p${r}1.cell, 0)").mkString("LEAST(", ", ", ")")
    s"""WITH mm AS (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events),
       n AS (SELECT CAST(user_id AS UBIGINT) AS x,
                    CASE WHEN epoch_us(ts) <= (SELECT (mn + mx) // 2 FROM mm) THEN 0 ELSE 1 END AS h,
                    COUNT(*) AS cnt
             FROM events GROUP BY 1, 2),
       keys AS (SELECT DISTINCT x FROM n),
       $chains,
       est AS (SELECT keys.x, $lo AS est_before, $hi AS est_after
               FROM keys
               $joins),
       ex AS (SELECT x, CAST(SUM(CASE WHEN h = 0 THEN cnt ELSE 0 END) AS BIGINT) AS x0,
                     CAST(SUM(CASE WHEN h = 1 THEN cnt ELSE 0 END) AS BIGINT) AS x1
              FROM n GROUP BY 1),
       fin AS (SELECT est.x, est.est_before, est.est_after,
                      est.est_after - est.est_before AS delta_est,
                      ex.x1 - ex.x0 AS delta_exact,
                      row_number() OVER (ORDER BY abs(est.est_after - est.est_before) DESC, est.x ASC) AS rk
               FROM est JOIN ex ON ex.x = est.x)
       SELECT CAST(x AS BIGINT) AS user_id, est_before, est_after, delta_est, delta_exact, rk
       FROM fin WHERE rk <= $topK ORDER BY rk"""
  }

  private def cmsSql(logW: Int, depth: Int): String = {
    def mulmod(a: String, c: String): String =
      s"""CAST((( ($a & 4294967295)::HUGEINT * $c::HUGEINT
         | + ((( ($a) >> 32)::HUGEINT * $c::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
         | ) % 18446744073709551616::HUGEINT) AS UBIGINT)""".stripMargin
    val chains = (0 until depth).map { r =>
      val seed = java.lang.Long.toUnsignedString(Sketches.BloomGolden * (r + 1).toLong)
      s"""r${r}y AS (SELECT x, cnt, xor(x, $seed::UBIGINT) AS y FROM n),
         |r${r}a AS (SELECT x, cnt, xor(y, y >> 30) AS a FROM r${r}y),
         |r${r}b AS (SELECT x, cnt, ${mulmod("a", "13787848793156543929")} AS z FROM r${r}a),
         |r${r}c AS (SELECT x, cnt, xor(z, z >> 27) AS a FROM r${r}b),
         |r${r}d AS (SELECT x, cnt, ${mulmod("a", "10723151780598845931")} AS z FROM r${r}c),
         |r${r}e AS (SELECT x, cnt, xor(z, z >> 31) >> ${64 - logW} AS b FROM r${r}d),
         |r${r}ctr AS (SELECT b, CAST(SUM(cnt) AS BIGINT) AS c FROM r${r}e GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val joins = (0 until depth)
      .map(r => s"JOIN r${r}e ON r${r}e.x = n.x JOIN r${r}ctr ON r${r}ctr.b = r${r}e.b")
      .mkString("\n")
    val least = (0 until depth).map(r => s"r${r}ctr.c").mkString("LEAST(", ", ", ")")
    s"""
    WITH n AS (SELECT CAST(user_id AS UBIGINT) AS x, COUNT(*) AS cnt FROM events GROUP BY 1),
    $chains
    SELECT CAST(n.x AS BIGINT) AS user_id, n.cnt AS n_exact, $least AS cms_est
    FROM n
    $joins"""
  }

  /** DuckDB replay of [[graft.operators.Funnel.shapleyAttribution]]:
    * coalition flags (distinct strictly-pre-conversion touches per user),
    * a 2ⁿ bit-cross-join enumerating every subset, INCLUSIVE v(S) over
    * journeys with coalition ⊆ S on the 1e-9 grid, per-channel
    * factorial-weighted exact decimal sums, one double division by n!
    * under round(·, 6). */
  private def shapleySql(channels: Seq[String], convType: String): String = {
    val chans = channels.sorted
    val n     = chans.size
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)
    val nFact    = fact(n)
    val bitsFrom = chans.indices.map(i => s"(VALUES (0), (1)) b$i(${chans(i)}_b)").mkString(", ")
    val flagCols = chans
      .map(c => s"MAX(CASE WHEN touch.t = '$c' THEN 1 ELSE 0 END) AS ${c}_b")
      .mkString(",\n                 ")
    val coalBits = chans.map(c => s"${c}_b").mkString(", ")
    val subsetOn = chans.map(c => s"coal.${c}_b <= subs.${c}_b").mkString(" AND ")
    val subsBits = chans.map(c => s"subs.${c}_b").mkString(", ")
    val szExpr   = chans.map(c => s"${c}_b").mkString(" + ")
    val wCase = (0 until n).map(s => s"WHEN $s THEN ${fact(s) * fact(n - 1 - s)}")
      .mkString("CASE v0.sz ", " ", " END")
    val arms = chans.map { ch =>
      val otherEq = chans.filterNot(_ == ch).map(c => s"v0.${c}_b = v1.${c}_b").mkString(" AND ")
      s"""SELECT '$ch' AS channel,
         |       CAST($wCase AS DECIMAL(6,0)) * (v1.v - v0.v) AS term
         |FROM v v0 JOIN v v1 ON $otherEq AND v0.${ch}_b = 0 AND v1.${ch}_b = 1""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""
    WITH ev AS (SELECT user_id AS u, event_type AS t, ts FROM events),
    conv AS (SELECT u, MIN(ts) AS cts FROM ev WHERE t = '$convType' GROUP BY 1),
    touch AS (SELECT DISTINCT e.u, e.t FROM ev e LEFT JOIN conv c USING (u)
              WHERE e.t IN (${chans.map("'" + _ + "'").mkString(", ")})
                AND (c.cts IS NULL OR e.ts < c.cts)),
    users AS (SELECT DISTINCT u FROM ev),
    flags AS (SELECT users.u,
                 $flagCols
              FROM users LEFT JOIN touch ON touch.u = users.u GROUP BY users.u),
    j AS (SELECT flags.*, CASE WHEN conv.u IS NULL THEN 0 ELSE 1 END AS cv
          FROM flags LEFT JOIN conv ON flags.u = conv.u),
    coal AS (SELECT $coalBits, COUNT(*) AS nj, SUM(cv) AS nc FROM j GROUP BY ${(1 to n).mkString(", ")}),
    subs AS (SELECT $coalBits, $szExpr AS sz FROM $bitsFrom),
    v AS (SELECT $subsBits, subs.sz,
                 COALESCE(CAST(round(CAST(SUM(coal.nc) AS DOUBLE) / CAST(SUM(coal.nj) AS DOUBLE), 9) AS DECIMAL(20,9)),
                          CAST(0 AS DECIMAL(20,9))) AS v
          FROM subs LEFT JOIN coal ON $subsetOn
          GROUP BY $subsBits, subs.sz),
    contrib AS ($arms),
    agg AS (SELECT channel, SUM(term) AS s FROM contrib GROUP BY 1)
    SELECT channel, round(CAST(s AS DOUBLE) / ${nFact}.0, 6) AS credit FROM agg ORDER BY channel
    """
  }

  private def bloomMembershipSql(logBits: Int, nHashes: Int): String = {
    def mulmod(a: String, c: String): String =
      s"""CAST((( ($a & 4294967295)::HUGEINT * $c::HUGEINT
         | + ((( ($a) >> 32)::HUGEINT * $c::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
         | ) % 18446744073709551616::HUGEINT) AS UBIGINT)""".stripMargin
    s"""
    WITH ks AS (SELECT DISTINCT CAST(event_id AS UBIGINT) AS x FROM events),
    a1 AS (SELECT x, xor(x, x >> 30) AS a FROM ks),
    a2 AS (SELECT x, ${mulmod("a", "13787848793156543929")} AS z FROM a1),
    a3 AS (SELECT x, xor(z, z >> 27) AS a FROM a2),
    a4 AS (SELECT x, ${mulmod("a", "10723151780598845931")} AS z FROM a3),
    h1t AS (SELECT x, xor(z, z >> 31) AS h1 FROM a4),
    b0 AS (SELECT x, xor(x, 11400714819323198485::UBIGINT) AS y FROM ks),
    b1 AS (SELECT x, xor(y, y >> 30) AS a FROM b0),
    b2 AS (SELECT x, ${mulmod("a", "13787848793156543929")} AS z FROM b1),
    b3 AS (SELECT x, xor(z, z >> 27) AS a FROM b2),
    b4 AS (SELECT x, ${mulmod("a", "10723151780598845931")} AS z FROM b3),
    h2t AS (SELECT x, xor(z, z >> 31) | 1::UBIGINT AS h2 FROM b4),
    hh AS (SELECT h1t.x, h1, h2 FROM h1t JOIN h2t USING (x)),
    bitsq AS (SELECT x, CAST(((h1::HUGEINT + (j::HUGEINT * h2::HUGEINT) % 18446744073709551616::HUGEINT)
                       % 18446744073709551616::HUGEINT) AS UBIGINT) >> ${64 - logBits} AS b
              FROM hh, LATERAL (SELECT unnest(range(0, $nHashes)) AS j) u),
    mem AS (SELECT DISTINCT CAST(event_id AS UBIGINT) AS x FROM events WHERE event_type = 'error'),
    setb AS (SELECT DISTINCT b FROM bitsq JOIN mem USING (x)),
    probe AS (SELECT x, COUNT(*) FILTER (WHERE setb.b IS NOT NULL) AS nhit
              FROM bitsq LEFT JOIN setb USING (b) GROUP BY x)
    SELECT CAST(p.x AS BIGINT) AS event_id, p.nhit = $nHashes AS in_filter, m.x IS NOT NULL AS is_member
    FROM probe p LEFT JOIN mem m USING (x)"""
  }
}
