package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{DataQuality, Features, Graph, Retrieval, TimeSeries}
import graft.sources.Tables

/** Round-13 inference battery: the classical-statistics tests, model fits
  * and structure audits a data pipeline leans on once the descriptive
  * screens (drift, skew, outliers) have fired — "are these sources the SAME
  * distribution" (ANOVA / Welch / Brown–Forsythe), "is this metric even
  * Gaussian" (Jarque–Bera), "does the quality classifier rank at all"
  * (ROC AUC), "is the series random / periodic" (runs test / epoch
  * folding), plus ridge fits, BLEU pairs, entropy ℓ-diversity and directed
  * SCC. All §2e extension family; every oracle replays the exact integer /
  * decimal-grid moment chain of its operator.
  */
object StatsQueries {

  /** Shared erfc-polynomial p-value arm (Abramowitz–Stegun 7.1.26), the SQL
    * twin of [[graft.operators.DataQuality.normalTwoSidedP]]: identical
    * Horner chain on both engines, round(·, 9). `z` must already be a
    * grid-6 double expression. */
  private def pNormalSql(z: String): String = {
    val x = s"(abs($z) / sqrt(2.0))"
    val t = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"""round(((((1.061405429 * $t - 1.453152027) * $t + 1.421413741) * $t
       - 0.284496736) * $t + 0.254829592) * $t * exp(-$x * $x), 9)"""
  }

  /** One-way ANOVA moment chain over a (g, x BIGINT) relation named `src`:
    * exposes CTE `t` with n, n_groups, s, sxx, t9 — the SQL twin of
    * [[graft.operators.DataQuality.anovaF]]'s aggregation pass. */
  private def anovaMomentsSql(src: String): String =
    s"""pg AS (SELECT g, COUNT(*) AS nj, CAST(SUM(x) AS HUGEINT) AS sj,
                  SUM(CAST(x AS HUGEINT) * x) AS sxxj
           FROM $src GROUP BY 1),
    t AS (SELECT COUNT(*) AS n_groups, CAST(SUM(nj) AS BIGINT) AS n,
                 CAST(SUM(sj) AS HUGEINT) AS s, CAST(SUM(sxxj) AS HUGEINT) AS sxx,
                 CAST(SUM(CAST(round(CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE)
                                     / CAST(nj AS DOUBLE), 9) AS DECIMAL(30,9)))
                      AS DECIMAL(30,9)) AS t9
          FROM pg)"""

  /** The F-statistic select over [[anovaMomentsSql]]'s `t`, with the same
    * fixed-order double chain as the Spark side. `fName` lets the
    * Brown–Forsythe variant rename F to W. */
  private def anovaSelectSql(fName: String): String = {
    val grand = "CAST(CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 9) AS DECIMAL(30,9)) AS DOUBLE)"
    val ssb   = s"(CAST(t9 AS DOUBLE) - $grand)"
    val ssw   = "(CAST(sxx AS DOUBLE) - CAST(t9 AS DOUBLE))"
    s"""SELECT n, n_groups, n_groups - 1 AS df1, n - n_groups AS df2,
           round($ssb, 6) AS ssb, round($ssw, 6) AS ssw,
           round(CASE WHEN $ssw > 0.0 AND CAST(n_groups AS DOUBLE) > 1.0
                 THEN ($ssb / (CAST(n_groups AS DOUBLE) - 1.0))
                      / ($ssw / (CAST(n AS DOUBLE) - CAST(n_groups AS DOUBLE))) END, 6) AS $fName
    FROM t"""
  }

  /** The event-type transition graph both directed-graph gates run on:
    * distinct (previous type → type) edges per user journey, self-loops
    * dropped. */
  private def transitionEdges(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(spark, dir).events
      .select(col("event_type").as("v"), lag(col("event_type"), 1).over(w).as("u"))
      .filter(col("u").isNotNull && col("u") =!= col("v"))
      .distinct()
  }

  /** Shared SCC oracle prefix: the transition edge set, 3 unrolled
    * reachability-doubling rounds (radius 8 ≥ the state-graph diameter)
    * and the mutual-reachability min-label map — exposes CTEs `dir` and
    * `scc` (the SQL replay of
    * [[graft.operators.Graph.stronglyConnectedComponents]]). */
  private def sccSql: String = {
    def dbl(k: Int): String =
      s"""r$k AS (SELECT x.u AS u, y.v AS v FROM r${k - 1} x JOIN r${k - 1} y ON y.u = x.v
          UNION SELECT u, v FROM r${k - 1})"""
    s"""
    WITH seq AS (SELECT event_type AS v,
                        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS u
                 FROM events),
    dir AS (SELECT DISTINCT u, v FROM seq WHERE u IS NOT NULL AND u <> v),
    nodes AS (SELECT u AS id FROM dir UNION SELECT v FROM dir),
    r0 AS (SELECT id AS u, id AS v FROM nodes UNION SELECT u, v FROM dir),
    ${dbl(1)}, ${dbl(2)}, ${dbl(3)},
    scc AS (SELECT f.u AS id, MIN(f.v) AS scc
            FROM r3 f JOIN r3 b ON b.u = f.v AND b.v = f.u
            GROUP BY 1)"""
  }

  /** DuckDB replay of [[graft.operators.Layout.zoneMapAuditHilbert]]: the
    * Morton OR-chain and lex key as in the zorder oracle, plus the Hilbert
    * index as `bits` unrolled state-machine CTE levels — each level reads
    * the previous level's (st, d) and the ORIGINAL x/y bits, exactly like
    * the operator's linear fold; digit/next tables are the same literal
    * lists, 1-indexed on both engines. */
  private def hilbertPruneSql(
      bits: Int, bucketBits: Int, x0: Long, x1: Long, y0: Long, y1: Long): String = {
    val mask  = (1L << bits) - 1
    val shift = 2 * bits - bucketBits
    val dTab  = "[0,1,3,2,2,3,1,0,0,3,1,2,2,1,3,0]"
    val nTab  = "[2,0,3,0,1,2,1,3,0,1,2,2,3,3,0,1]"
    val inter = ((0 until bits).map(i => s"(((x >> $i) & 1) << ${2 * i})") ++
      (0 until bits).map(i => s"(((y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
    val levels = (bits - 1 to 0 by -1).zipWithIndex.map { case (i, k) =>
      val key = s"CAST(st * 4 + (((x >> $i) & 1) * 2 + ((y >> $i) & 1)) + 1 AS INTEGER)"
      s"""h${k + 1} AS (SELECT x, y, hit, b_zorder, b_lex,
            d * 4 + ($dTab)[$key] AS d, ($nTab)[$key] AS st FROM h$k)"""
    }.mkString(",\n")
    def grp(bCol: String, alias: String) =
      s"""$alias AS (SELECT $bCol AS b, MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y,
             MAX(y) AS max_y, COUNT(*) AS n_rows,
             SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS n_hit
          FROM hk GROUP BY 1)"""
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
       h0 AS (SELECT x, y,
                     (($inter) >> $shift) AS b_zorder,
                     (((x << $bits) | y) >> $shift) AS b_lex,
                     (x BETWEEN $x0 AND $x1 AND y BETWEEN $y0 AND $y1) AS hit,
                     CAST(0 AS BIGINT) AS st, CAST(0 AS BIGINT) AS d
              FROM base),
       $levels,
       hk AS (SELECT x, y, hit, b_zorder, b_lex, (d >> $shift) AS b_hilbert FROM h$bits),
       ${grp("b_hilbert", "ah")},
       ${grp("b_zorder", "az")},
       ${grp("b_lex", "al")}
       SELECT * FROM (${arm("ah", "hilbert")} UNION ALL ${arm("az", "zorder")}
                      UNION ALL ${arm("al", "lex")})
       ORDER BY layout"""
  }

  val all: Seq[Q] = Seq(

    // ------------------------------------------ Hilbert zone-map pruning
    // The three-way read-amplification shoot-out (hilbert vs zorder vs
    // lex) on the same (custkey, order-day) instance as
    // layout_zorder_prune: Hilbert's adjacent-step property keeps bucket
    // bounding boxes tighter, so a 2-D range predicate touches fewer
    // zone-map buckets — the clustering-key decision a 100 TB lake owner
    // actually faces. Exact integer counts end to end; the Hilbert index
    // is a 4-state machine over quadrant digits (linear-size codegen'd
    // expression; LayoutSpec pins it exhaustively against textbook xy2d).
    Q(
      "layout_hilbert_prune",
      Some(hilbertPruneSql(bits = 14, bucketBits = 10, x0 = 50L, x1 = 2000L, y0 = 300L, y1 = 1500L))) {
      (spark, dir) =>
        val prepared = Tables(spark, dir).orders.select(
          col("o_custkey").as("ck"),
          datediff(col("o_orderdate"), to_date(lit("1992-01-01"))).as("dayn"))
        graft.operators.Layout.zoneMapAuditHilbert(
          prepared, "ck", "dayn", bits = 14, bucketBits = 10,
          x0 = 50L, x1 = 2000L, y0 = 300L, y1 = 1500L)
    },

    // ------------------------------------------------- one-way ANOVA F
    // Mean-shift screen across the returnflag segments on quantity — the
    // parametric sibling of quality_kruskal_wallis, sharing its exact
    // decimal-moment discipline (each Sⱼ²/nⱼ term snaps to the 1e-9 grid
    // before the exact sum; F is one fixed-order double under round 6).
    Q(
      "quality_anova_f",
      Some(s"""
        WITH m AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x FROM lineitem),
        ${anovaMomentsSql("m")}
        ${anovaSelectSql("f_stat")}
      """)) { (spark, dir) =>
      DataQuality.anovaF(Tables(spark, dir).lineitem, "l_returnflag", "l_quantity")
    },

    // --------------------------------------------------- Welch's t-test
    // Unequal-variance two-sample mean comparison (returned vs accepted
    // lines on price cents): exact HUGEINT moments, one fixed-order double
    // chain for t and the Welch–Satterthwaite df, erfc-polynomial normal
    // p — the A/B read that doesn't assume pooled variance.
    Q(
      "quality_welch_ttest",
      Some {
        def nD(t: String)   = s"CAST(n_$t AS DOUBLE)"
        def mean(t: String) = s"(s_$t / ${nD(t)})"
        def vr(t: String)   = s"((sxx_$t - s_$t * s_$t / ${nD(t)}) / (${nD(t)} - 1.0))"
        val sea = s"(${vr("a")} / ${nD("a")})"
        val seb = s"(${vr("b")} / ${nD("b")})"
        val se2 = s"($sea + $seb)"
        val tE  = s"((${mean("a")} - ${mean("b")}) / sqrt($se2))"
        val dfW = s"($se2 * $se2 / ($sea * $sea / (${nD("a")} - 1.0) + $seb * $seb / (${nD("b")} - 1.0)))"
        s"""
        WITH m AS (SELECT l_returnflag AS g, CAST(round(l_extendedprice * 100) AS BIGINT) AS x
                   FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        s AS (SELECT g, COUNT(*) AS n, CAST(SUM(x) AS HUGEINT) AS s,
                     SUM(CAST(x AS HUGEINT) * x) AS sxx
              FROM m GROUP BY 1),
        a AS (SELECT n AS n_a, CAST(s AS DOUBLE) AS s_a, CAST(sxx AS DOUBLE) AS sxx_a FROM s WHERE g = 'A'),
        b AS (SELECT n AS n_b, CAST(s AS DOUBLE) AS s_b, CAST(sxx AS DOUBLE) AS sxx_b FROM s WHERE g = 'R')
        SELECT n_a, n_b,
               round(${mean("a")}, 6) AS mean_a, round(${mean("b")}, 6) AS mean_b,
               round(${vr("a")}, 6) AS var_a, round(${vr("b")}, 6) AS var_b,
               round($tE, 6) AS t_stat, round($dfW, 6) AS df_welch,
               ${pNormalSql(s"round($tE, 6)")} AS p_normal
        FROM a, b
      """
      }) { (spark, dir) =>
      val prep = Tables(spark, dir).lineitem.select(
        col("l_returnflag").as("g"),
        round(col("l_extendedprice") * 100).as("cents"))
      DataQuality.welchTTest(prep, "g", "cents", "A", "R")
    },

    // ---------------------------------------- Brown–Forsythe variance test
    // "Are these sources equally NOISY" (not just equally centered):
    // ANOVA-F on |x − group median|, median picked by the total
    // cumulative-count definition so the centers — and hence every
    // deviation — are exact integers on both engines.
    Q(
      "quality_brown_forsythe",
      Some(s"""
        WITH pool AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x FROM lineitem),
        cnt AS (SELECT g, x, COUNT(*) AS c FROM pool GROUP BY 1, 2),
        cum AS (SELECT g, x, c,
                       SUM(c) OVER (PARTITION BY g ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                       SUM(c) OVER (PARTITION BY g) AS nj
                FROM cnt),
        med AS (SELECT g, MIN(x) AS med FROM cum WHERE cum >= (nj + 1) / 2 GROUP BY 1),
        dev AS (SELECT pool.g AS g, abs(x - med) AS x FROM pool JOIN med USING (g)),
        ${anovaMomentsSql("dev")}
        ${anovaSelectSql("w_stat")}
      """)) { (spark, dir) =>
      DataQuality.brownForsythe(Tables(spark, dir).lineitem, "l_returnflag", "l_quantity")
    },

    // ------------------------------------- Cramér–von Mises two-sample
    // The L2 sibling of quality_ks_test: KS sees only the worst ECDF gap,
    // CvM integrates every gap over the pooled distinct-value axis (exact
    // under ties by construction) — the broad-mild-shift detector. Per-
    // value terms on the 1e-12 grid, exact decimal sum, round-6 T.
    Q(
      "quality_cramer_von_mises",
      Some("""
        WITH pool AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
                      FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        cnt AS (SELECT v, CAST(SUM(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                       CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c2
                FROM pool GROUP BY 1),
        cum AS (SELECT c1, c2,
                       SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
                       SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
                       SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
                FROM cnt),
        a AS (SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
                     CAST(SUM(CAST(round(CAST(c1 + c2 AS DOUBLE)
                       * (CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(cum2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                       * (CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(cum2 AS DOUBLE) / CAST(n2 AS DOUBLE)), 12)
                       AS DECIMAL(24,12))) AS DECIMAL(24,12)) AS s12
              FROM cum)
        SELECT n1, n2,
               round(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                     / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                     * CAST(s12 AS DOUBLE), 6) AS t_stat
        FROM a
      """)) { (spark, dir) =>
      DataQuality.cramerVonMises(
        Tables(spark, dir).lineitem, "l_returnflag", "l_quantity", "A", "R")
    },

    // ------------------------------------------------ Jarque–Bera normality
    // "Is this metric even Gaussian-ish" — the gate before any z-score
    // outlier rule is trusted. Exact HUGEINT power sums Σx..Σx⁴, one
    // fixed-order central-moment chain, and the CLOSED-form χ²(2) p-value
    // exp(−JB/2) on the grid-6 statistic.
    Q(
      "quality_jarque_bera",
      Some {
        val mu = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
        val m2 = s"(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - $mu * $mu)"
        val m3 = s"(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) - 3.0 * $mu * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) + 2.0 * $mu * $mu * $mu)"
        val m4 = s"(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) - 4.0 * $mu * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)) + 6.0 * $mu * $mu * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) - 3.0 * $mu * $mu * $mu * $mu)"
        val sk = s"($m3 / ($m2 * sqrt($m2)))"
        val ku = s"($m4 / ($m2 * $m2))"
        val jb = s"round(CAST(n AS DOUBLE) / 6.0 * ($sk * $sk + ($ku - 3.0) * ($ku - 3.0) / 4.0), 6)"
        s"""
        WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS x FROM lineitem),
        m AS (SELECT COUNT(*) AS n,
                     CAST(SUM(x) AS HUGEINT) AS s1,
                     SUM(CAST(x AS HUGEINT) * x) AS s2,
                     SUM(CAST(x AS HUGEINT) * x * x) AS s3,
                     SUM(CAST(x AS HUGEINT) * x * x * x) AS s4
              FROM v)
        SELECT n, round($mu, 6) AS mean, round($m2, 6) AS m2,
               round(CASE WHEN $m2 > 0.0 THEN $sk END, 6) AS skewness,
               round(CASE WHEN $m2 > 0.0 THEN $ku END, 6) AS kurtosis,
               CASE WHEN $m2 > 0.0 THEN $jb END AS jb_stat,
               round(CASE WHEN $m2 > 0.0 THEN exp(-($jb) / 2.0) END, 9) AS p_chi2
        FROM m
      """
      }) { (spark, dir) =>
      DataQuality.jarqueBera(Tables(spark, dir).lineitem, "l_quantity")
    },

    // ------------------------------------------------------- ROC AUC
    // Threshold-free eval of the length-proxy quality score against the
    // lang=en label (the same score/label pairing as
    // quality_isotonic_calibrate, read as a ranking): doubled-midrank
    // Mann–Whitney form — Σ2R⁺ is an exact integer even at ties, AUC and
    // Gini are ONE exact division away, round 6.
    Q(
      "ml_roc_auc",
      Some {
        val auc = """((CAST(sr2_pos AS DOUBLE) - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0))
                     / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))"""
        s"""
        WITH pool AS (SELECT n_chars % 1000 AS s, CAST(lang = 'en' AS BIGINT) AS y FROM documents),
        cnt AS (SELECT s, COUNT(*) AS c, CAST(SUM(y) AS BIGINT) AS pos FROM pool GROUP BY 1),
        rk AS (SELECT pos, c,
                      2 * COALESCE(SUM(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        + c + 1 AS r2
               FROM cnt),
        a AS (SELECT CAST(SUM(pos) AS BIGINT) AS n_pos, CAST(SUM(c - pos) AS BIGINT) AS n_neg,
                     CAST(SUM(CAST(pos AS HUGEINT) * r2) AS HUGEINT) AS sr2_pos
              FROM rk)
        SELECT n_pos, n_neg,
               round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN $auc END, 6) AS auc,
               round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN 2.0 * $auc - 1.0 END, 6) AS gini
        FROM a
      """
      }) { (spark, dir) =>
      val scored = Tables(spark, dir).documents.select(
        (col("n_chars") % 1000).as("score"),
        (col("lang") === "en").cast("long").as("y"))
      DataQuality.rocAuc(scored, "score", "y")
    },

    // ------------------------------------------------------ ridge fit
    // L2-regularized two-feature regression per returnflag (price cents on
    // quantity + discount cents, λ=1000, intercept unpenalized) — the
    // stable fit when features correlate. Nine exact HUGEINT moments per
    // group, then four fixed-order 3×3 Cramer determinants; βs round at 6.
    Q(
      "ml_ridge_fit",
      Some {
        val lam = "1000.0"
        def det3(m: Seq[String]): String =
          s"""(${m(0)} * (${m(4)} * ${m(8)} - ${m(5)} * ${m(7)})
             - ${m(1)} * (${m(3)} * ${m(8)} - ${m(5)} * ${m(6)})
             + ${m(2)} * (${m(3)} * ${m(7)} - ${m(4)} * ${m(6)}))"""
        val a = Seq(
          "CAST(n AS DOUBLE)", "CAST(sx1 AS DOUBLE)", "CAST(sx2 AS DOUBLE)",
          s"CAST(sx1 AS DOUBLE)", s"(CAST(sx11 AS DOUBLE) + $lam)", "CAST(sx12 AS DOUBLE)",
          "CAST(sx2 AS DOUBLE)", "CAST(sx12 AS DOUBLE)", s"(CAST(sx22 AS DOUBLE) + $lam)")
        val b   = Seq("CAST(sy AS DOUBLE)", "CAST(sx1y AS DOUBLE)", "CAST(sx2y AS DOUBLE)")
        val det = det3(a)
        def rep(i: Int) = det3(a.zipWithIndex.map { case (v, j) => if (j % 3 == i) b(j / 3) else v })
        s"""
        WITH m AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x1,
                          CAST(round(l_discount * 100) AS BIGINT) AS x2,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS y
                   FROM lineitem),
        mom AS (SELECT g, COUNT(*) AS n,
                       CAST(SUM(x1) AS HUGEINT) AS sx1, CAST(SUM(x2) AS HUGEINT) AS sx2,
                       SUM(CAST(x1 AS HUGEINT) * x1) AS sx11, SUM(CAST(x1 AS HUGEINT) * x2) AS sx12,
                       SUM(CAST(x2 AS HUGEINT) * x2) AS sx22,
                       CAST(SUM(y) AS HUGEINT) AS sy,
                       SUM(CAST(x1 AS HUGEINT) * y) AS sx1y, SUM(CAST(x2 AS HUGEINT) * y) AS sx2y
                FROM m GROUP BY 1)
        SELECT g AS group_key, n,
               CASE WHEN $det <> 0.0 THEN round(${rep(0)} / $det, 6) END AS beta0,
               CASE WHEN $det <> 0.0 THEN round(${rep(1)} / $det, 6) END AS beta1,
               CASE WHEN $det <> 0.0 THEN round(${rep(2)} / $det, 6) END AS beta2
        FROM mom ORDER BY group_key
      """
      }) { (spark, dir) =>
      Features.ridgeFit(
        Tables(spark, dir).lineitem,
        "l_returnflag",
        col("l_quantity"),
        round(col("l_discount") * 100),
        round(col("l_extendedprice") * 100),
        lambda = 1000.0)
    },

    // ----------------------------------------------- entropy ℓ-diversity
    // The refinement k-anonymity misses: a (event_type, day) class can be
    // k-large yet leak when nearly all rows share one subject bucket —
    // entropy-ℓ = exp(−Σp ln p) is the effective number of sensitive
    // values an observer faces. 1e-12-grid p·ln p terms, exact decimal
    // sums, round-6 entropy.
    Q(
      "privacy_l_diversity",
      Some("""
        WITH base AS (SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                             CAST(user_id % 50 AS VARCHAR) AS sv
                      FROM events),
        cells AS (SELECT event_type, day, sv, COUNT(*) AS c FROM base GROUP BY 1, 2, 3),
        tot AS (SELECT event_type, day, CAST(SUM(c) AS BIGINT) AS class_n, COUNT(*) AS distinct_l
                FROM cells GROUP BY 1, 2),
        wp AS (SELECT cells.event_type, cells.day,
                      CAST(round((CAST(c AS DOUBLE) / CAST(class_n AS DOUBLE))
                                 * ln(CAST(c AS DOUBLE) / CAST(class_n AS DOUBLE)), 12)
                           AS DECIMAL(20,12)) AS plogp
               FROM cells JOIN tot USING (event_type, day)),
        ent AS (SELECT event_type, day, CAST(SUM(plogp) AS DECIMAL(20,12)) AS hsum
                FROM wp GROUP BY 1, 2)
        SELECT t.event_type, t.day, class_n, distinct_l,
               round(exp(-CAST(hsum AS DOUBLE)), 6) AS entropy_l,
               distinct_l < 20 AS below_distinct_l,
               round(exp(-CAST(hsum AS DOUBLE)), 6) < 20.0 AS below_entropy_l
        FROM tot t JOIN ent USING (event_type, day)
      """)) { (spark, dir) =>
      val ev = Tables(spark, dir).events.select(
        col("event_type"),
        to_date(col("ts")).cast("string").as("day"),
        (col("user_id") % 50).cast("string").as("sv"))
      DataQuality.lDiversityAudit(ev, Seq("event_type", "day"), "sv", minL = 20)
    },

    // -------------------------------------------------- runs test
    // Wald–Wolfowitz serial-randomness gate on the hourly count series:
    // exact integer signs/runs against the cumulative-count median,
    // fixed-order E[R]/Var[R]/z, erfc-polynomial p.
    Q(
      "events_runs_test",
      Some {
        val n1 = "CAST(n_above AS DOUBLE)"
        val n2 = "CAST(n_below AS DOUBLE)"
        val nT = s"($n1 + $n2)"
        val er = s"(2.0 * $n1 * $n2 / $nT + 1.0)"
        val vr = s"(2.0 * $n1 * $n2 * (2.0 * $n1 * $n2 - $n1 - $n2) / ($nT * $nT * ($nT - 1.0)))"
        val z  = s"round((CAST(runs AS DOUBLE) - $er) / sqrt($vr), 6)"
        s"""
        WITH hx AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x FROM events GROUP BY 1),
        cnt AS (SELECT x, COUNT(*) AS c FROM hx GROUP BY 1),
        cum AS (SELECT x, c,
                       SUM(c) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                       SUM(c) OVER () AS n_all
                FROM cnt),
        med AS (SELECT MIN(x) AS med FROM cum WHERE cum >= (n_all + 1) / 2),
        sgn AS (SELECT h, CAST(x > med AS INT) AS s FROM hx, med WHERE x <> med),
        fl AS (SELECT s, lag(s) OVER (ORDER BY h) AS prev FROM sgn),
        a AS (SELECT CAST(SUM(s) AS BIGINT) AS n_above,
                     CAST(SUM(1 - s) AS BIGINT) AS n_below,
                     CAST(SUM(CASE WHEN prev IS NOT NULL AND s <> prev THEN 1 ELSE 0 END) + 1 AS BIGINT) AS runs
              FROM fl)
        SELECT n_above, n_below, runs, round($er, 6) AS expected_runs,
               CASE WHEN $vr > 0.0 THEN $z END AS z,
               CASE WHEN $vr > 0.0 THEN ${pNormalSql(z)} END AS p_value
        FROM a
      """
      }) { (spark, dir) =>
      TimeSeries.runsTest(Tables(spark, dir).events, "ts")
    },

    // --------------------------------------------- epoch-folding period scan
    // Periodicity detection with NO trigonometry (sin/cos libm parity
    // across engines is not a thing): fold hours by t mod T and score each
    // candidate period by Stellingwerf's phase-dispersion statistic
    // θ = SSW/SST — the variance share the fold FAILS to explain, minimal
    // (0 at a perfect period, where ANOVA F would degenerate to ∞) at the
    // true period. Candidate list is literal-sized; each arm is one
    // phase-keyed aggregation over the compressed hourly series.
    Q(
      "events_period_fold",
      Some {
        val periods = Seq(5, 7, 12, 24)
        val grand = "CAST(CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 9) AS DECIMAL(30,9)) AS DOUBLE)"
        val ssb   = s"round(CAST(t9 AS DOUBLE) - $grand, 6)"
        val ssw   = "round(CAST(sxx AS DOUBLE) - CAST(t9 AS DOUBLE), 6)"
        val f = s"""round(CASE WHEN (CAST(sxx AS DOUBLE) - CAST(t9 AS DOUBLE)) > 0.0 AND CAST(n_groups AS DOUBLE) > 1.0
                   THEN ((CAST(t9 AS DOUBLE) - $grand) / (CAST(n_groups AS DOUBLE) - 1.0))
                        / ((CAST(sxx AS DOUBLE) - CAST(t9 AS DOUBLE))
                           / (CAST(n AS DOUBLE) - CAST(n_groups AS DOUBLE))) END, 6)"""
        val arms = periods.map { p =>
          s"""a$p AS (
            WITH m AS (SELECT CAST(t % $p AS VARCHAR) AS g, x FROM hx),
            ${anovaMomentsSql("m")}
            SELECT CAST($p AS INTEGER) AS period, n_groups - 1 AS df1, n - n_groups AS df2,
                   round(CASE WHEN $ssb + $ssw > 0.0 THEN $ssw / ($ssb + $ssw) END, 6) AS theta,
                   $f AS f_stat
            FROM t)"""
        }.mkString(",\n")
        val union = periods.map(p => s"SELECT * FROM a$p").mkString(" UNION ALL ")
        s"""
        WITH hx AS MATERIALIZED (
          SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS BIGINT) AS t, x
          FROM (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x FROM events GROUP BY 1)),
        $arms,
        u AS (SELECT * FROM ($union)),
        mx AS (SELECT MIN(theta) AS tm FROM u)
        SELECT period, df1, df2, theta, f_stat, theta = tm AS is_best
        FROM u, mx ORDER BY period
      """
      }) { (spark, dir) =>
      TimeSeries.periodFold(Tables(spark, dir).events, "ts", Seq(5, 7, 12, 24))
    },

    // ------------------------------------------------------ BLEU pairs
    // The precision-side generation eval beside eval_rouge_pairs (same
    // even-vs-odd corpus self-pairing): clipped n-gram precisions as exact
    // integer counts, geometric mean as an IEEE-exact sqrt, brevity
    // penalty's one exp on an exact integer ratio, round 6.
    Q(
      "eval_bleu_pairs",
      Some {
        def gramSide(side: String, n: Int): String =
          s"""SELECT pair_id, unnest(list_transform(range(1, len($side) - $n + 2),
                 i -> array_to_string($side[CAST(i AS INT):CAST(i AS INT)+$n-1], ' '))) AS g
                 FROM p WHERE len($side) >= $n"""
        def clipJoin(n: Int): String =
          s"""SELECT cn.pair_id, CAST(SUM(least(cn.c, rn.c)) AS BIGINT) AS clip
              FROM (SELECT pair_id, g, COUNT(*) AS c FROM (${gramSide("ct", n)}) GROUP BY 1, 2) cn
              JOIN (SELECT pair_id, g, COUNT(*) AS c FROM (${gramSide("rt", n)}) GROUP BY 1, 2) rn
                ON cn.pair_id = rn.pair_id AND cn.g = rn.g
              GROUP BY cn.pair_id"""
        val p1 = "(CAST(clip1 AS DOUBLE) / CAST(c_len AS DOUBLE))"
        val p2 = "(CAST(clip2 AS DOUBLE) / CAST(c2_len AS DOUBLE))"
        val bp = "(CASE WHEN c_len >= r_len THEN 1.0 ELSE exp(1.0 - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE)) END)"
        s"""
        WITH c AS (SELECT doc_id // 2 AS pair_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ct FROM documents WHERE doc_id % 2 = 0),
        r AS (SELECT (doc_id - 1) // 2 AS pair_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS rt FROM documents WHERE doc_id % 2 = 1),
        p AS MATERIALIZED (SELECT c.pair_id, c.ct, r.rt FROM c JOIN r USING (pair_id)),
        base AS (SELECT pair_id, CAST(len(ct) AS BIGINT) AS c_len, CAST(len(rt) AS BIGINT) AS r_len,
                        CAST(greatest(len(ct) - 1, 0) AS BIGINT) AS c2_len
                 FROM p),
        cl1 AS (${clipJoin(1)}),
        cl2 AS (${clipJoin(2)}),
        w AS (SELECT base.pair_id, c_len, r_len, c2_len,
                     COALESCE(cl1.clip, 0) AS clip1, COALESCE(cl2.clip, 0) AS clip2
              FROM base LEFT JOIN cl1 ON cl1.pair_id = base.pair_id
                        LEFT JOIN cl2 ON cl2.pair_id = base.pair_id)
        SELECT pair_id, c_len, r_len, clip1, clip2,
               round(CASE WHEN c_len > 0 THEN $p1 ELSE 0.0 END, 6) AS p1,
               round(CASE WHEN c2_len > 0 THEN $p2 ELSE 0.0 END, 6) AS p2,
               round(CASE WHEN c_len > 0 AND c2_len > 0 AND clip1 > 0 AND clip2 > 0
                     THEN $bp * sqrt($p1 * $p2) ELSE 0.0 END, 6) AS bleu2
        FROM w
      """
      }) { (spark, dir) =>
      val d = Tables(spark, dir).documents
      val pairs = d
        .filter(col("doc_id") % 2 === 0)
        .select(expr("CAST(doc_id DIV 2 AS BIGINT)").as("pair_id"), col("text").as("cand"))
        .join(
          d.filter(col("doc_id") % 2 === 1)
            .select(expr("CAST((doc_id - 1) DIV 2 AS BIGINT)").as("pair_id"), col("text").as("ref")),
          "pair_id")
      Retrieval.bleuPairs(pairs, "pair_id", "cand", "ref")
    },

    // ------------------------------------------- directed SCC
    // Mutual-reachability structure of the event-type transition graph
    // (which journey states can RETURN to each other — the cycle read
    // undirected components cannot express): reachability doubling to the
    // fix-point, scc = min mutually-reachable id. The oracle unrolls 3
    // doubling rounds (reach radius 8 ≥ the state-graph diameter); the
    // Spark side stops at the same fix-point by row-count convergence.
    Q(
      "graph_scc",
      Some(s"""
        $sccSql
        SELECT id, scc FROM scc
      """)) { (spark, dir) =>
      Graph.stronglyConnectedComponents(transitionEdges(spark, dir), "u", "v")
    },

    // ------------------------------------------- directed SCC, FW–BW regime
    // The SAME mutual-reachability answer computed by the billion-node
    // algorithm: forward–backward peeling with trim, node-sized state, no
    // reach-pair closure (Graph.sccFwBw documents which regime each SCC
    // variant serves). The oracle is shared with graph_scc — semantics are
    // identical, only the execution strategy differs, which is exactly
    // what the twin gate rows pin.
    Q(
      "graph_scc_fwbw",
      Some(s"""
        $sccSql
        SELECT id, scc FROM scc
      """)) { (spark, dir) =>
      Graph.sccFwBw(transitionEdges(spark, dir), "u", "v")
    },

    // ------------------------------------------- SCC condensation DAG
    // Collapse each mutually-reachable state cluster to one node and
    // count the edges between distinct clusters — the acyclic summary a
    // topological read of the journey graph actually needs (no topo order
    // exists on the raw cyclic graph). The instance is the PRE-CONVERSION
    // funnel (transitions before a user's first purchase): purchase keeps
    // its incoming edges but none outgoing, so it condenses to a sink
    // component fed by the browsing cycle — a non-trivial DAG where the
    // full journey graph is one giant SCC.
    Q(
      "graph_scc_condense",
      Some {
        def dbl(k: Int): String =
          s"""r$k AS (SELECT x.u AS u, y.v AS v FROM r${k - 1} x JOIN r${k - 1} y ON y.u = x.v
              UNION SELECT u, v FROM r${k - 1})"""
        s"""
        WITH seq AS (SELECT event_type AS v,
                            lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS u,
                            COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                              OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_purchases
                     FROM events),
        dir AS (SELECT DISTINCT u, v FROM seq
                WHERE u IS NOT NULL AND u <> v AND prior_purchases = 0),
        nodes AS (SELECT u AS id FROM dir UNION SELECT v FROM dir),
        r0 AS (SELECT id AS u, id AS v FROM nodes UNION SELECT u, v FROM dir),
        ${dbl(1)}, ${dbl(2)}, ${dbl(3)},
        scc AS (SELECT f.u AS id, MIN(f.v) AS scc
                FROM r3 f JOIN r3 b ON b.u = f.v AND b.v = f.u
                GROUP BY 1)
        SELECT sa.scc AS scc_src, sb.scc AS scc_dst, COUNT(*) AS n_edges
        FROM dir JOIN scc sa ON sa.id = dir.u JOIN scc sb ON sb.id = dir.v
        WHERE sa.scc <> sb.scc
        GROUP BY 1, 2
      """
      }) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val edges = Tables(spark, dir).events
        .select(
          col("event_type").as("v"),
          lag(col("event_type"), 1).over(w).as("u"),
          coalesce(
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .over(w.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)).as("prior_purchases"))
        .filter(col("u").isNotNull && col("u") =!= col("v") && col("prior_purchases") === 0L)
        .select(col("u"), col("v"))
        .distinct()
      Graph.sccCondense(edges, "u", "v")
    },

    // --------------------------------------------------- Friedman test
    // Repeated-measures rank test: do the event types keep the same ORDER
    // across day blocks? Doubled midranks within each complete block keep
    // ties exact; χ²_F and its tie correction are fixed-order doubles from
    // exact HUGEINT rank sums.
    Q(
      "quality_friedman",
      Some("""
        WITH pool AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS b, event_type AS t, COUNT(*) AS x
                      FROM events GROUP BY 1, 2),
        kk AS (SELECT COUNT(DISTINCT t) AS k FROM pool),
        complete AS (SELECT b FROM pool GROUP BY b HAVING COUNT(*) = (SELECT k FROM kk)),
        rws AS (SELECT pool.* FROM pool JOIN complete USING (b)),
        cnt AS (SELECT b, x, COUNT(*) AS c FROM rws GROUP BY 1, 2),
        rmap AS (SELECT b, x,
                        2 * COALESCE(SUM(c) OVER (PARTITION BY b ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                          + c + 1 AS r2
                 FROM cnt),
        pt AS (SELECT t, CAST(SUM(r2) AS HUGEINT) AS r2j FROM rws JOIN rmap USING (b, x) GROUP BY 1),
        terms AS (SELECT CAST(SUM(r2j * r2j) AS HUGEINT) AS sr2sq FROM pt),
        nb AS (SELECT COUNT(*) AS n FROM complete),
        ties AS (SELECT CAST(SUM(c * c * c - c) AS HUGEINT) AS tie_mass FROM cnt)
        SELECT n AS n_blocks, k, k - 1 AS df,
               round(CASE WHEN CAST(n AS DOUBLE) > 0.0
                     THEN 3.0 * CAST(sr2sq AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))
                          - 3.0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0) END, 6) AS chi2,
               round(CASE WHEN CAST(n AS DOUBLE) > 0.0
                          AND 1.0 - CAST(tie_mass AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)) > 0.0
                     THEN (3.0 * CAST(sr2sq AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))
                           - 3.0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))
                          / (1.0 - CAST(tie_mass AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0))) END, 6) AS chi2_tie_corrected
        FROM terms, nb, kk, ties
      """)) { (spark, dir) =>
      val daily = Tables(spark, dir).events
        .groupBy(to_date(col("ts")).cast("string").as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      DataQuality.friedmanTest(daily, "day", "event_type", "cnt")
    },

    // -------------------------------------------------- term burstiness
    // Church & Gale: content words arrive in bursts (VMR >> 1), function
    // words arrive evenly (VMR ~ 1) — the stopword/keyword/spam-template
    // separator. Exact integer (term, doc) counts; both ratios one
    // fixed-order division each.
    Q(
      "text_burstiness",
      Some("""
        WITH t AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS term FROM documents),
        pd AS (SELECT term, doc_id, COUNT(*) AS c FROM t GROUP BY 1, 2),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        pt AS (SELECT term, COUNT(*) AS df, CAST(SUM(c) AS HUGEINT) AS cf,
                      SUM(CAST(c AS HUGEINT) * c) AS s2
               FROM pd GROUP BY 1 HAVING COUNT(*) >= 5)
        SELECT term, df, CAST(cf AS BIGINT) AS cf,
               round(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE), 6) AS burstiness,
               round((CAST(s2 AS DOUBLE) - CAST(cf AS DOUBLE) * CAST(cf AS DOUBLE) / CAST(n_docs AS DOUBLE))
                     / CAST(cf AS DOUBLE), 6) AS vmr
        FROM pt, n
      """)) { (spark, dir) =>
      graft.operators.Corpus.termBurstiness(Tables(spark, dir).documents, "doc_id", "text", minDf = 5)
    },

    // ---------------------------------------------- association rules
    // Market-basket over (user, day) baskets of event types: support /
    // confidence / lift per ordered pair — the cross-sell / journey read.
    // Distinct presence, exact integer counts, one division per metric.
    Q(
      "events_assoc_rules",
      Some("""
        WITH b AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day, event_type AS t FROM events),
        nb AS (SELECT COUNT(*) AS n_baskets FROM (SELECT DISTINCT u, day FROM b)),
        nt AS (SELECT t, COUNT(*) AS n_t FROM b GROUP BY 1),
        co AS (SELECT a.t AS ta, b2.t AS tb, COUNT(*) AS n_ab
               FROM b a JOIN b b2 ON b2.u = a.u AND b2.day = a.day AND a.t < b2.t
               GROUP BY 1, 2),
        d AS (SELECT ta AS antecedent, tb AS consequent, n_ab FROM co
              UNION ALL SELECT tb AS antecedent, ta AS consequent, n_ab FROM co)
        SELECT antecedent, consequent, n_ab, na.n_t AS n_ante, nc.n_t AS n_cons,
               round(CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6) AS support,
               round(CAST(n_ab AS DOUBLE) / CAST(na.n_t AS DOUBLE), 6) AS confidence,
               round(CAST(n_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE)
                     / (CAST(na.n_t AS DOUBLE) * CAST(nc.n_t AS DOUBLE)), 6) AS lift
        FROM d JOIN nt na ON na.t = d.antecedent JOIN nt nc ON nc.t = d.consequent, nb
      """)) { (spark, dir) =>
      graft.operators.Funnel.assocRules(Tables(spark, dir).events, "user_id", "ts", "event_type")
    },

    // ------------------------------------------------ Granger causality
    // Does yesterday's click count improve today's purchase forecast
    // beyond purchase's own history? F of restricted-vs-unrestricted lag-1
    // OLS, every moment exact, βs/RSS one fixed-order chain (the ridge
    // Cramer machinery with λ=0 on the unrestricted side).
    Q(
      "events_granger",
      Some {
        def det3(m: Seq[String]): String =
          s"""(${m(0)} * (${m(4)} * ${m(8)} - ${m(5)} * ${m(7)})
             - ${m(1)} * (${m(3)} * ${m(8)} - ${m(5)} * ${m(6)})
             + ${m(2)} * (${m(3)} * ${m(7)} - ${m(4)} * ${m(6)}))"""
        def D(x: String)  = s"CAST($x AS DOUBLE)"
        val a = Seq(
          D("n"), D("syl"), D("sxl"),
          D("syl"), D("sylyl"), D("sylxl"),
          D("sxl"), D("sylxl"), D("sxlxl"))
        val bv   = Seq(D("sy"), D("syyl"), D("syxl"))
        val det  = det3(a)
        def rep(i: Int) = det3(a.zipWithIndex.map { case (v, j) => if (j % 3 == i) bv(j / 3) else v })
        val denR = s"(${D("n")} * ${D("sylyl")} - ${D("syl")} * ${D("syl")})"
        val br   = s"((${D("n")} * ${D("syyl")} - ${D("sy")} * ${D("syl")}) / $denR)"
        val ar   = s"((${D("sy")} - $br * ${D("syl")}) / ${D("n")})"
        val rssR = s"(${D("syy")} - $ar * ${D("sy")} - $br * ${D("syyl")})"
        val rssU = s"(${D("syy")} - ((${rep(0)} / $det) * ${D("sy")} + (${rep(1)} / $det) * ${D("syyl")} + (${rep(2)} / $det) * ${D("syxl")}))"
        val ok   = s"$denR <> 0.0 AND $det <> 0.0"
        s"""
        WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type AS t, COUNT(*) AS c FROM events GROUP BY 1, 2),
        days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
        ys AS (SELECT days.day, COALESCE(q.c, 0) AS y FROM days
               LEFT JOIN (SELECT day, c FROM daily WHERE t = 'purchase') q USING (day)),
        xs AS (SELECT days.day, COALESCE(q.c, 0) AS x FROM days
               LEFT JOIN (SELECT day, c FROM daily WHERE t = 'click') q USING (day)),
        r AS (SELECT ys.y, lag(ys.y) OVER (ORDER BY ys.day) AS yl, lag(xs.x) OVER (ORDER BY ys.day) AS xl
              FROM ys JOIN xs ON xs.day = ys.day),
        rr AS (SELECT * FROM r WHERE yl IS NOT NULL),
        m AS (SELECT COUNT(*) AS n,
                     CAST(SUM(y) AS HUGEINT) AS sy, CAST(SUM(yl) AS HUGEINT) AS syl, CAST(SUM(xl) AS HUGEINT) AS sxl,
                     SUM(CAST(y AS HUGEINT) * y) AS syy, SUM(CAST(yl AS HUGEINT) * yl) AS sylyl,
                     SUM(CAST(xl AS HUGEINT) * xl) AS sxlxl, SUM(CAST(yl AS HUGEINT) * xl) AS sylxl,
                     SUM(CAST(y AS HUGEINT) * yl) AS syyl, SUM(CAST(y AS HUGEINT) * xl) AS syxl
              FROM rr)
        SELECT n AS t_obs,
               CASE WHEN $ok THEN round($rssR, 6) END AS rss_restricted,
               CASE WHEN $ok THEN round($rssU, 6) END AS rss_unrestricted,
               CASE WHEN $ok AND $rssU > 0.0 AND ${D("n")} > 3.0
                    THEN round(($rssR - $rssU) / ($rssU / (${D("n")} - 3.0)), 6) END AS f_stat
        FROM m
      """
      }) { (spark, dir) =>
      TimeSeries.grangerTest(Tables(spark, dir).events, "ts", "event_type",
        causeType = "click", effectType = "purchase")
    },

    // ---------------------------------------------- classification report
    // Per-class precision/recall/F1 from the NB language classifier's
    // self-predictions — the eval every filtering model needs beside its
    // confusion matrix. Exact integer tp/fp/fn from the matrix; three
    // divisions, round 6. The oracle extends the proven NB replay prefix.
    Q(
      "ml_confusion_metrics",
      Some(s"""${graft.queries.TextQueries.nbScoresSql},
        pred AS (SELECT doc_id, cls AS predicted
                 FROM (SELECT doc_id, cls, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, cls) AS rk FROM sc)
                 WHERE rk = 1),
        cm AS (SELECT d.lang AS actual, p.predicted, COUNT(*) AS n
               FROM pred p JOIN documents d ON d.doc_id = p.doc_id
               GROUP BY 1, 2),
        ba AS (SELECT actual AS cls, CAST(SUM(n) AS BIGINT) AS n_actual FROM cm GROUP BY 1),
        bp AS (SELECT predicted AS cls, CAST(SUM(n) AS BIGINT) AS n_pred FROM cm GROUP BY 1),
        tp AS (SELECT actual AS cls, CAST(n AS BIGINT) AS tp FROM cm WHERE actual = predicted)
        SELECT COALESCE(ba.cls, bp.cls) AS cls,
               COALESCE(n_actual, 0) AS n_actual,
               COALESCE(n_pred, 0) AS n_pred,
               COALESCE(tp, 0) AS tp,
               round(CASE WHEN COALESCE(n_pred, 0) > 0
                     THEN CAST(COALESCE(tp, 0) AS DOUBLE) / CAST(n_pred AS DOUBLE) END, 6) AS precision,
               round(CASE WHEN COALESCE(n_actual, 0) > 0
                     THEN CAST(COALESCE(tp, 0) AS DOUBLE) / CAST(n_actual AS DOUBLE) END, 6) AS recall,
               round(CASE WHEN COALESCE(n_pred, 0) > 0 AND COALESCE(n_actual, 0) > 0
                          AND (CAST(COALESCE(tp, 0) AS DOUBLE) / CAST(n_pred AS DOUBLE)
                               + CAST(COALESCE(tp, 0) AS DOUBLE) / CAST(n_actual AS DOUBLE)) > 0.0
                     THEN 2.0 * (CAST(COALESCE(tp, 0) AS DOUBLE) / CAST(n_pred AS DOUBLE))
                              * (CAST(COALESCE(tp, 0) AS DOUBLE) / CAST(n_actual AS DOUBLE))
                          / (CAST(COALESCE(tp, 0) AS DOUBLE) / CAST(n_pred AS DOUBLE)
                             + CAST(COALESCE(tp, 0) AS DOUBLE) / CAST(n_actual AS DOUBLE)) END, 6) AS f1
        FROM ba FULL OUTER JOIN bp ON bp.cls = ba.cls
        LEFT JOIN tp ON tp.cls = COALESCE(ba.cls, bp.cls)
      """)) { (spark, dir) =>
      val d = Tables(spark, dir).documents
      // the class×class confusion matrix fans out into three aggregations;
      // eager-checkpoint it so the heavy NB-classify subtree runs ONCE
      val cm = graft.operators.LanguageModel
        .naiveBayesClassify(d, d, "doc_id", "text", "lang")
        .join(d.select(col("doc_id"), col("lang").as("actual")), Seq("doc_id"))
        .groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val byAct  = cm.groupBy(col("actual").as("cls")).agg(sum(col("n")).as("n_actual"))
      val byPred = cm.groupBy(col("predicted").as("cls")).agg(sum(col("n")).as("n_pred"))
      val tps = cm.filter(col("actual") === col("predicted"))
        .select(col("actual").as("cls"), col("n").as("tp"))
      val joined = byAct
        .join(byPred, Seq("cls"), "full_outer")
        .join(tps, Seq("cls"), "left")
        .select(
          col("cls"),
          coalesce(col("n_actual"), lit(0L)).as("n_actual"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"),
          coalesce(col("tp"), lit(0L)).as("tp"))
      val p = col("tp").cast("double") / col("n_pred").cast("double")
      val r = col("tp").cast("double") / col("n_actual").cast("double")
      joined.select(
        col("cls"),
        col("n_actual"),
        col("n_pred"),
        col("tp"),
        round(when(col("n_pred") > 0, p), 6).as("precision"),
        round(when(col("n_actual") > 0, r), 6).as("recall"),
        round(when(col("n_pred") > 0 && col("n_actual") > 0 && (p + r) > 0.0,
          lit(2.0) * p * r / (p + r)), 6).as("f1"))
    },

    // ------------------------------------------------ A/B power analysis
    // "Could this experiment even have detected its own lift": observed
    // power of the ab_ztest design at α=0.05 and the per-arm sample size
    // an 80%-power rerun needs. Φ reuses the engine-wide erfc polynomial;
    // the ceil runs on a grid-9 snap so engines never straddle an integer.
    Q(
      "events_ab_power",
      Some {
        val pa = "(CAST(xa AS DOUBLE) / CAST(na AS DOUBLE))"
        val pb = "(CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE))"
        val se = s"sqrt($pa * (1.0 - $pa) / CAST(na AS DOUBLE) + $pb * (1.0 - $pb) / CAST(nb AS DOUBLE))"
        val u  = s"round(abs($pa - $pb) / $se - 1.959964, 6)"
        val pU = pNormalSql(u)
        val phi = s"(CASE WHEN $u >= 0.0 THEN 1.0 - $pU / 2.0 ELSE $pU / 2.0 END)"
        val nReq = s"""CAST(ceil(round((1.959964 + 0.841621) * (1.959964 + 0.841621)
                      * ($pa * (1.0 - $pa) + $pb * (1.0 - $pb))
                      / (($pa - $pb) * ($pa - $pb)), 9)) AS BIGINT)"""
        s"""
        WITH u AS (SELECT user_id % 2 AS variant,
                          CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15 THEN 1 ELSE 0 END AS converted
                   FROM events GROUP BY user_id),
        w AS (SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
                     CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS xa,
                     CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
                     CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS xb
              FROM u)
        SELECT na, xa, nb, xb,
               round($pa, 6) AS p_a, round($pb, 6) AS p_b,
               round(CASE WHEN $se > 0.0 THEN $phi END, 6) AS observed_power,
               CASE WHEN $se > 0.0 AND abs($pa - $pb) > 0.0 THEN $nReq END AS n_required_per_arm
        FROM w
      """
      }) { (spark, dir) =>
      val assignments = Tables(spark, dir).events
        .groupBy(col("user_id"))
        .agg(
          (sum(when(col("event_type") === "purchase", 1).otherwise(0)) >= 15)
            .cast("int").as("converted"))
        .select((col("user_id") % 2).as("variant"), col("converted"))
      graft.operators.Funnel.abPowerAnalysis(assignments, "variant", "converted")
    },

    // ------------------------------------------ Theil decomposition
    // Customer-revenue inequality split into between-nation and
    // within-nation parts — the additive decomposition Gini lacks (the
    // "is the imbalance across sources or inside them" read). Cent-grid
    // totals, 1e-12-grid terms, exact decimal sums.
    Q(
      "quality_theil_decompose",
      Some {
        val si = "(CAST(x AS DOUBLE) / CAST(xt AS DOUBLE))"
        val sg = "(CAST(xg AS DOUBLE) / CAST(xt AS DOUBLE))"
        s"""
        WITH ent AS (SELECT c.c_nationkey AS g, CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS x
                     FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
                     GROUP BY 1, o.o_custkey
                     HAVING SUM(CAST(round(o_totalprice * 100) AS BIGINT)) > 0),
        grp AS (SELECT g, COUNT(*) AS ng, CAST(SUM(x) AS HUGEINT) AS xg FROM ent GROUP BY 1),
        tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n, COUNT(*) AS n_groups, CAST(SUM(xg) AS HUGEINT) AS xt FROM grp),
        et AS (SELECT CAST(SUM(CAST(round($si * ln($si * CAST(n AS DOUBLE)), 12) AS DECIMAL(24,12))) AS DECIMAL(24,12)) AS t12,
                      CAST(SUM(CAST(round($si * ln(CAST(x AS DOUBLE) / CAST(xg AS DOUBLE) * CAST(ng AS DOUBLE)), 12) AS DECIMAL(24,12))) AS DECIMAL(24,12)) AS tw12
               FROM ent JOIN grp USING (g), tot),
        bt AS (SELECT CAST(SUM(CAST(round($sg * ln($sg * (CAST(n AS DOUBLE) / CAST(ng AS DOUBLE))), 12) AS DECIMAL(24,12))) AS DECIMAL(24,12)) AS tb12
               FROM grp, tot)
        SELECT n, n_groups,
               round(CAST(t12 AS DOUBLE), 6) AS theil_total,
               round(CAST(tb12 AS DOUBLE), 6) AS theil_between,
               round(CAST(tw12 AS DOUBLE), 6) AS theil_within
        FROM et, bt, tot
      """
      }) { (spark, dir) =>
      val t = Tables(spark, dir)
      val perCustomer = t.orders
        .join(t.customer, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey"), col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .select(col("c_nationkey"), col("cents"))
      DataQuality.theilDecompose(perCustomer, "c_nationkey", "cents")
    },

    // -------------------------------------- degree power-law fit
    // Clauset–Shalizi–Newman MLE over the co-purchase graph's degree
    // distribution — the heavy-tail audit (α ≲ 2.5 = hub-dominated: the
    // salting / broadcast-planning signal; α ≳ 3.5 = homogeneous).
    // Grid-12 ln terms, exact decimal sum, one edge pass.
    Q(
      "graph_degree_powerlaw",
      Some("""
        WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 25),
        e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b FROM li a JOIN li b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        deg AS (SELECT id, COUNT(*) AS d
                FROM (SELECT a AS id FROM e0 UNION ALL SELECT b AS id FROM e0) GROUP BY 1),
        al AS (SELECT COUNT(*) AS n_nodes, CAST(MAX(d) AS BIGINT) AS dmax FROM deg),
        tl AS (SELECT COUNT(*) AS n_tail,
                      CAST(SUM(CAST(round(ln(CAST(d AS DOUBLE) / 1.5), 12) AS DECIMAL(24,12))) AS DECIMAL(24,12)) AS slog12
               FROM deg WHERE d >= 2)
        SELECT n_nodes, n_tail, CAST(2 AS BIGINT) AS dmin,
               round(CASE WHEN CAST(slog12 AS DOUBLE) > 0.0
                     THEN 1.0 + CAST(n_tail AS DOUBLE) / CAST(slog12 AS DOUBLE) END, 6) AS alpha,
               round(CASE WHEN CAST(slog12 AS DOUBLE) > 0.0
                     THEN (1.0 + CAST(n_tail AS DOUBLE) / CAST(slog12 AS DOUBLE) - 1.0)
                          / sqrt(CAST(n_tail AS DOUBLE)) END, 6) AS sigma,
               dmax
        FROM al, tl
      """)) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
        .filter(col("l_quantity") >= 25)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") && col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        .distinct()
      Graph.degreePowerlawFit(edges, "pa", "pb", dmin = 2L)
    },

    // --------------------------------------------- mutual information
    // MI between returnflag and linestatus (nats) + the normalized
    // MI/min(H) — the dependence screen that sees the full joint where
    // Cramér's V only sees the quadratic deviation. One joint pass,
    // 1e-12-grid p·ln terms, exact decimal sums.
    Q(
      "quality_mutual_information",
      Some {
        def plogp(n: String, t: String) =
          s"-(CAST($n AS DOUBLE) / CAST($t AS DOUBLE)) * ln(CAST($n AS DOUBLE) / CAST($t AS DOUBLE))"
        s"""
        WITH joint AS (SELECT l_returnflag AS a, l_linestatus AS b, COUNT(*) AS nab
                       FROM lineitem GROUP BY 1, 2),
        ma AS (SELECT a, CAST(SUM(nab) AS BIGINT) AS na FROM joint GROUP BY 1),
        mb AS (SELECT b, CAST(SUM(nab) AS BIGINT) AS nb FROM joint GROUP BY 1),
        tot AS (SELECT CAST(SUM(nab) AS BIGINT) AS n FROM joint),
        wp AS (SELECT joint.a, joint.b, nab, na, nb, n
               FROM joint JOIN ma USING (a) JOIN mb USING (b), tot),
        mi AS (SELECT CAST(SUM(CAST(round((CAST(nab AS DOUBLE) / CAST(n AS DOUBLE))
                         * ln((CAST(nab AS DOUBLE) / CAST(n AS DOUBLE))
                              / ((CAST(na AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(nb AS DOUBLE) / CAST(n AS DOUBLE)))), 12)
                         AS DECIMAL(20,12))) AS DECIMAL(20,12)) AS mi12
               FROM wp),
        ha AS (SELECT CAST(SUM(CAST(round(${plogp("na", "n")}, 12) AS DECIMAL(20,12))) AS DECIMAL(20,12)) AS ha12
               FROM (SELECT DISTINCT a, na, n FROM wp)),
        hb AS (SELECT CAST(SUM(CAST(round(${plogp("nb", "n")}, 12) AS DECIMAL(20,12))) AS DECIMAL(20,12)) AS hb12
               FROM (SELECT DISTINCT b, nb, n FROM wp))
        SELECT n, round(CAST(mi12 AS DOUBLE), 6) AS mi,
               round(CAST(ha12 AS DOUBLE), 6) AS h_a,
               round(CAST(hb12 AS DOUBLE), 6) AS h_b,
               round(CASE WHEN CAST(least(ha12, hb12) AS DOUBLE) > 0.0
                     THEN CAST(mi12 AS DOUBLE) / CAST(least(ha12, hb12) AS DOUBLE) END, 6) AS mi_normalized
        FROM mi, ha, hb, tot
      """
      }) { (spark, dir) =>
      DataQuality.mutualInformation(Tables(spark, dir).lineitem, "l_returnflag", "l_linestatus")
    },

    // ------------------------------------------------ RFM segmentation
    // The classic recency/frequency/monetary quintile grid over purchase
    // events — NTILE(5) on total orders (metric, user id), 1 = best;
    // exact-cent spend; one row per occupied cell.
    Q(
      "events_rfm_segments",
      Some("""
        WITH pu AS (SELECT user_id AS u, MAX(CAST(ts AS DATE)) AS last_day, COUNT(*) AS freq,
                           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS cents
                    FROM events WHERE event_type = 'purchase' GROUP BY 1),
        sc AS (SELECT u, freq, cents,
                      NTILE(5) OVER (ORDER BY last_day DESC, u) AS r_seg,
                      NTILE(5) OVER (ORDER BY freq DESC, u) AS f_seg,
                      NTILE(5) OVER (ORDER BY cents DESC, u) AS m_seg
               FROM pu)
        SELECT r_seg, f_seg, m_seg, COUNT(*) AS n_users,
               round(CAST(SUM(cents) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 100.0), 6) AS avg_monetary
        FROM sc GROUP BY 1, 2, 3
      """)) { (spark, dir) =>
      graft.operators.Funnel.rfmSegments(
        Tables(spark, dir).events, "user_id", "ts", "value",
        purchaseType = col("event_type") === "purchase")
    },

    // ---------------------------------------- Witten–Bell bigram score
    // The fourth count-LM smoothing beside add-k/KN/Good–Turing: novel-
    // continuation mass estimated by each context's distinct-continuation
    // count, λ(w1) = c1/(c1+n1f), unigram backoff for unseen contexts.
    // Same shape and float discipline as lm_kneser_ney.
    Q(
      "lm_witten_bell",
      Some("""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks FROM documents),
        t2 AS (SELECT doc_id, toks, len(toks) AS len FROM t WHERE len(toks) >= 2),
        big0 AS (SELECT doc_id, unnest(list_transform(range(1, len), i -> {'pos': i, 'w1': toks[i], 'w2': toks[i + 1]})) AS u FROM t2),
        b AS (SELECT doc_id, u.pos AS pos, u.w1 AS w1, u.w2 AS w2 FROM big0),
        bic AS (SELECT w1, w2, COUNT(*) AS c2 FROM b GROUP BY 1, 2),
        ctx AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1, COUNT(*) AS n1f FROM bic GROUP BY 1),
        uni AS (SELECT w2, COUNT(*) AS cu FROM (SELECT unnest(toks) AS w2 FROM t) GROUP BY 1),
        tt AS (SELECT CAST(SUM(cu) AS BIGINT) AS ntok FROM uni),
        lp AS (SELECT b.doc_id, b.pos,
                      round(ln(greatest(
                        CASE WHEN COALESCE(c1, 0) > 0
                             THEN (CAST(COALESCE(c2, 0) AS DOUBLE)
                                   + CAST(n1f AS DOUBLE) * (CAST(COALESCE(cu, 0) AS DOUBLE) / CAST(ntok AS DOUBLE)))
                                  / (CAST(c1 AS DOUBLE) + CAST(n1f AS DOUBLE))
                             ELSE CAST(COALESCE(cu, 0) AS DOUBLE) / CAST(ntok AS DOUBLE) END,
                        1e-12)), 12) AS logp
               FROM b
               LEFT JOIN bic USING (w1, w2)
               LEFT JOIN ctx USING (w1)
               LEFT JOIN uni USING (w2)
               CROSS JOIN tt),
        agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
                       round(SUM(CAST(logp AS DECIMAL(20,12))), 9) AS s
                FROM lp GROUP BY doc_id)
        SELECT doc_id, n_bigrams,
               ROUND(CAST(s AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6) AS avg_logprob
        FROM agg
      """)) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
      graft.operators.LanguageModel.wittenBellScore(docs, docs, "doc_id", "text")
    },

    // ----------------------------------------------- drift timeline
    // One JSD per day against the first-week reference mix — the "when
    // did the event mix start moving" monitoring curve (the timeline
    // read of quality_drift_jsd's two-window snapshot). Scaffolded
    // (day × category) so absent categories contribute their exact
    // 0-side terms; 1e-12-grid contributions, exact decimal day sums.
    Q(
      "events_drift_timeline",
      Some("""
        WITH base AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type AS category FROM events),
        cnt AS (SELECT day, category, COUNT(*) AS n FROM base GROUP BY 1, 2),
        ref AS (SELECT category, CAST(SUM(n) AS BIGINT) AS n_ref FROM cnt WHERE day < '2024-01-08' GROUP BY 1),
        rt AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref FROM ref),
        sc AS (SELECT d.day, c.category FROM (SELECT DISTINCT day FROM cnt) d, (SELECT DISTINCT category FROM cnt) c),
        j AS (SELECT sc.day, sc.category, COALESCE(cnt.n, 0) AS n, COALESCE(ref.n_ref, 0) AS n_ref, t_ref
              FROM sc LEFT JOIN cnt ON cnt.day = sc.day AND cnt.category = sc.category
              LEFT JOIN ref ON ref.category = sc.category, rt),
        dt AS (SELECT day, CAST(SUM(n) AS BIGINT) AS t_day FROM j GROUP BY 1),
        terms AS (SELECT j.day, dt.t_day,
                         CAST(round((
                           CASE WHEN CAST(n AS DOUBLE) / CAST(t_day AS DOUBLE) > 0.0
                                THEN (CAST(n AS DOUBLE) / CAST(t_day AS DOUBLE))
                                     * ln((CAST(n AS DOUBLE) / CAST(t_day AS DOUBLE))
                                          / ((CAST(n AS DOUBLE) / CAST(t_day AS DOUBLE)
                                              + CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE)) * 0.5))
                                ELSE 0.0 END
                         + CASE WHEN CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE) > 0.0
                                THEN (CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE))
                                     * ln((CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE))
                                          / ((CAST(n AS DOUBLE) / CAST(t_day AS DOUBLE)
                                              + CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE)) * 0.5))
                                ELSE 0.0 END) * 0.5, 12) AS DECIMAL(20,12)) AS contrib12
                  FROM j JOIN dt ON dt.day = j.day)
        SELECT day, MAX(t_day) AS n_events,
               round(CAST(CAST(SUM(contrib12) AS DECIMAL(20,12)) AS DOUBLE), 6) AS jsd
        FROM terms GROUP BY 1
      """)) { (spark, dir) =>
      DataQuality.driftTimeline(Tables(spark, dir).events, "ts", "event_type", refEnd = "2024-01-08")
    },

    // -------------------------------------- split-conformal interval
    // Distribution-free prediction intervals around the quantity→price
    // OLS fit: q̂ = the ⌈(n+1)(1−α)⌉-th smallest calibration residual
    // (an exact order statistic over grid-6 values), realized coverage
    // reported on the held-out third — the uncertainty wrapper a served
    // model ships with, guarantee first, honesty check second.
    Q(
      "ml_conformal_interval",
      Some {
        val res = "round(abs(CAST(y AS DOUBLE) - (a + b * CAST(x AS DOUBLE))), 6)"
        s"""
        WITH base AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                             CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
                             (l_orderkey + l_linenumber) % 3 AS split
                      FROM lineitem),
        m AS (SELECT COUNT(*) AS n_train, CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
                     SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(x AS HUGEINT) * y) AS sxy
              FROM base WHERE split = 0),
        f AS (SELECT n_train,
                     round((CAST(n_train AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / (CAST(n_train AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS b,
                     sy, sx
              FROM m),
        f2 AS (SELECT n_train, b,
                      round((CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n_train AS DOUBLE), 9) AS a
               FROM f),
        cal AS (SELECT $res AS r FROM base, f2 WHERE split = 1),
        hist AS (SELECT r, COUNT(*) AS c FROM cal GROUP BY 1),
        cum AS (SELECT r,
                       SUM(c) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                       SUM(c) OVER () AS n_calib
                FROM hist),
        q AS (SELECT MIN(r) AS q_hat, MAX(n_calib) AS n_calib FROM cum
              WHERE cum >= ceil(CAST(n_calib + 1 AS DOUBLE) * 0.9)),
        t AS (SELECT COUNT(*) AS n_test,
                     CAST(SUM(CASE WHEN $res <= q_hat THEN 1 ELSE 0 END) AS BIGINT) AS n_cov,
                     MIN(f2.n_train) AS n_train, MIN(q.n_calib) AS n_calib,
                     MIN(a) AS a, MIN(b) AS b, MIN(q_hat) AS q_hat
              FROM base, f2, q WHERE split = 2)
        SELECT CAST(n_train AS BIGINT) AS n_train, CAST(n_calib AS BIGINT) AS n_calib, n_test,
               a AS intercept, b AS slope, q_hat,
               round(CAST(n_cov AS DOUBLE) / CAST(n_test AS DOUBLE), 6) AS coverage_test,
               round(2.0 * q_hat, 6) AS interval_width
        FROM t
      """
      }) { (spark, dir) =>
      Features.conformalInterval(
        Tables(spark, dir).lineitem,
        col("l_quantity"),
        round(col("l_extendedprice") * 100),
        col("l_orderkey") + col("l_linenumber"),
        alpha = 0.1)
    },

    // ------------------------------------------- Brier decomposition
    // Murphy's calibration-vs-sharpness split of the length-proxy score
    // against the lang=en label (the same pairing the isotonic and AUC
    // rows read): BS = REL − RES + UNC + WBV − 2·WBC (the coarse-bin
    // identity incl. both within-bin terms), raw BS as ONE exact integer
    // ratio, per-bin terms on the 1e-12 grid.
    Q(
      "ml_brier_decompose",
      Some {
        val fbar  = "(CAST(sb AS DOUBLE) / (CAST(nb AS DOUBLE) * 1000))"
        val ybarB = "(CAST(yb AS DOUBLE) / CAST(nb AS DOUBLE))"
        val ybar  = "(CAST(ytot AS DOUBLE) / CAST(n AS DOUBLE))"
        s"""
        WITH pool AS (SELECT n_chars % 1000 AS s, CAST(lang = 'en' AS BIGINT) AS y FROM documents),
        bins AS (SELECT s // 50 AS b, COUNT(*) AS nb, CAST(SUM(s) AS HUGEINT) AS sb,
                        CAST(SUM(y) AS BIGINT) AS yb,
                        SUM(CAST(s AS HUGEINT) * s) AS ssb, SUM(CAST(s AS HUGEINT) * y) AS syb
                 FROM pool GROUP BY 1),
        tot AS (SELECT CAST(SUM(nb) AS BIGINT) AS n, CAST(SUM(yb) AS BIGINT) AS ytot,
                       CAST(SUM(ssb) AS DOUBLE) - 2000.0 * CAST(SUM(syb) AS DOUBLE)
                         + 1000000.0 * CAST(SUM(yb) AS DOUBLE) AS sq_num
                FROM bins),
        trm AS (SELECT MIN(n) AS n, MIN(ytot) AS ytot, MIN(sq_num) AS sq_num,
                       CAST(SUM(CAST(round(CAST(nb AS DOUBLE) * ($fbar - $ybarB) * ($fbar - $ybarB), 12) AS DECIMAL(24,12))) AS DECIMAL(24,12)) AS rel12,
                       CAST(SUM(CAST(round(CAST(nb AS DOUBLE) * ($ybarB - $ybar) * ($ybarB - $ybar), 12) AS DECIMAL(24,12))) AS DECIMAL(24,12)) AS res12,
                       CAST(SUM(CAST(round((CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / (1000.0 * 1000), 12) AS DECIMAL(24,12))) AS DECIMAL(24,12)) AS wbv12,
                       CAST(SUM(CAST(round((CAST(syb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(yb AS DOUBLE) / CAST(nb AS DOUBLE)) / 1000.0, 12) AS DECIMAL(24,12))) AS DECIMAL(24,12)) AS wbc12,
                       COUNT(*) AS n_bins
                FROM bins, tot)
        SELECT n, n_bins,
               round(sq_num / (1000000.0 * CAST(n AS DOUBLE)), 6) AS brier,
               round(CAST(rel12 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS reliability,
               round(CAST(res12 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS resolution,
               round($ybar * (1.0 - $ybar), 6) AS uncertainty,
               round(CAST(wbv12 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS within_bin_var,
               round(CAST(wbc12 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS within_bin_cov
        FROM trm
      """
      }) { (spark, dir) =>
      val scored = Tables(spark, dir).documents.select(
        (col("n_chars") % 1000).as("score"),
        (col("lang") === "en").cast("long").as("y"))
      DataQuality.brierDecompose(scored, "score", "y", scale = 1000, binWidth = 50)
    },

    // -------------------------------------------------- McNemar's test
    // Paired comparison of the two quality classifiers the engine already
    // trains/serves (NB language model vs the linear surface-statistics
    // scorer) on identical rows: only the discordant cells carry signal;
    // χ²(1) = Z², so the p-value reuses the erfc polynomial on √χ².
    Q(
      "ml_mcnemar",
      Some(s"""${graft.queries.TextQueries.nbScoresSql},
        pred AS (SELECT doc_id, cls AS predicted
                 FROM (SELECT doc_id, cls, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, cls) AS rk FROM sc)
                 WHERE rk = 1),
        lin AS (SELECT doc_id,
                       round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(
                         -1.5
                         + 8.0 * (CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS DOUBLE)
                                  / GREATEST(LENGTH(text), 1))
                         + 3.0 * (CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> list_contains(['the','a','and','of','to'], x))) AS DOUBLE)
                                  / GREATEST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')), 1))
                         + (-4.0) * (CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS DOUBLE)
                                  / GREATEST(LENGTH(text), 1))
                         + 0.25 * ln(CAST(1.0 AS DOUBLE) + LENGTH(text))
                       ))), 6) AS quality_score
                FROM documents),
        paired AS (SELECT (p.predicted = 'en') AS pred_a,
                          (l.quality_score >= 0.5) AS pred_b,
                          (d.lang = 'en') AS label
                   FROM pred p JOIN lin l ON l.doc_id = p.doc_id
                   JOIN documents d ON d.doc_id = p.doc_id),
        cells AS (SELECT CAST(SUM(CASE WHEN pred_a = label AND pred_b = label THEN 1 ELSE 0 END) AS BIGINT) AS both_right,
                         CAST(SUM(CASE WHEN pred_a = label AND pred_b <> label THEN 1 ELSE 0 END) AS BIGINT) AS b_cell,
                         CAST(SUM(CASE WHEN pred_a <> label AND pred_b = label THEN 1 ELSE 0 END) AS BIGINT) AS c_cell,
                         CAST(SUM(CASE WHEN pred_a <> label AND pred_b <> label THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong
                  FROM paired)
        SELECT both_right, b_cell, c_cell, both_wrong,
               CASE WHEN b_cell + c_cell > 0
                    THEN round((abs(CAST(b_cell AS DOUBLE) - CAST(c_cell AS DOUBLE)) - 1.0)
                               * (abs(CAST(b_cell AS DOUBLE) - CAST(c_cell AS DOUBLE)) - 1.0)
                               / (CAST(b_cell AS DOUBLE) + CAST(c_cell AS DOUBLE)), 6) END AS chi2,
               CASE WHEN b_cell + c_cell > 0
                    THEN ${pNormalSql("""sqrt(round((abs(CAST(b_cell AS DOUBLE) - CAST(c_cell AS DOUBLE)) - 1.0)
                               * (abs(CAST(b_cell AS DOUBLE) - CAST(c_cell AS DOUBLE)) - 1.0)
                               / (CAST(b_cell AS DOUBLE) + CAST(c_cell AS DOUBLE)), 6))""")} END AS p_value
        FROM cells
      """)) { (spark, dir) =>
      val d = Tables(spark, dir).documents
      val nb = graft.operators.LanguageModel
        .naiveBayesClassify(d, d, "doc_id", "text", "lang")
        .select(col("doc_id"), (col("predicted") === "en").as("pred_a"))
      val lin = graft.operators.Corpus
        .linearQualityScore(d, "doc_id", "text",
          wTokensPerChar = 8.0, wStopwordRatio = 3.0, wPunctRatio = -4.0,
          wLogLen = 0.25, bias = -1.5)
        .select(col("doc_id"), (col("quality_score") >= 0.5).as("pred_b"))
      val paired = nb
        .join(lin, Seq("doc_id"))
        .join(d.select(col("doc_id"), (col("lang") === "en").as("label")), Seq("doc_id"))
      DataQuality.mcnemarTest(paired, "pred_a", "pred_b", "label")
    },

    // --------------------------------------- content-defined chunk dedup
    // LBFS-style CDC over the corpus text: boundaries where the md5 of an
    // 8-char window lands in the 1-in-32 mask, so edits shift only their
    // own chunk — then the duplicated-chunk table (the shared-content mass
    // a storage layer would single-instance). Row-local split, one
    // chunk-hash group-by.
    Q(
      "dedup_cdc_chunks",
      Some("""
        WITH base AS (SELECT doc_id AS doc, text AS txt FROM documents),
        cuts AS (SELECT doc, txt,
               list_concat(list_concat(
                 [CAST(1 AS BIGINT)],
                 CASE WHEN LENGTH(txt) >= 9
                      THEN list_filter(range(2, LENGTH(txt) - 8 + 2),
                             i -> substr(md5(substr(txt, CAST(i AS INTEGER), 8)), 1, 2)
                                  IN ('00','20','40','60','80','a0','c0','e0'))
                      ELSE CAST([] AS BIGINT[]) END),
                 [LENGTH(txt) + 1]) AS cs
             FROM base),
        chunks AS (SELECT doc, unnest(list_transform(range(1, len(cs)),
                     j -> substr(txt, CAST(cs[CAST(j AS INTEGER)] AS INTEGER),
                                 CAST(cs[CAST(j AS INTEGER) + 1] - cs[CAST(j AS INTEGER)] AS INTEGER)))) AS chunk
                   FROM cuts),
        nz AS (SELECT doc, chunk FROM chunks WHERE LENGTH(chunk) > 0)
        SELECT md5(chunk) AS chunk_hash,
               CAST(LENGTH(chunk) AS INTEGER) AS chunk_len,
               COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc) AS n_docs
        FROM nz GROUP BY 1, 2
        HAVING COUNT(*) >= 2
      """)) { (spark, dir) =>
      graft.operators.Dedup.cdcChunkDups(
        Tables(spark, dir).documents, "doc_id", "text", window = 8, minChunkOccurrences = 2)
    }
  )
}
