package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Funnel}
import graft.sources.Tables
import graft.streaming.EventStreams

/** Second-wave relational coverage: percentiles, statistical aggregates,
  * pivot, deterministic sampling, as-of join — operators beyond the
  * reference's surface (SURVEY.md §2e) that any engine replacement needs.
  */
object AdvancedQueries {

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------- percentiles
    // Exact interpolated percentiles: Spark `percentile` == DuckDB
    // quantile_cont on the same sorted data (both interpolate linearly).
    Q(
      "agg_percentiles",
      Some("""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS median_qty,
               round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
               round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
        FROM lineitem GROUP BY l_returnflag
      """)) { (spark, dir) =>
      // exact percentiles buffer every value per partial-agg task — spread
      // an under-split scan so the buffer build parallelizes (values are
      // merged sorted, so the result is partitioning-independent)
      graft.operators.Corpus
        .spreadSmallInput(Tables(spark, dir).lineitem, col("l_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
          round(percentile(col("l_extendedprice"), lit(0.25)), 4).as("p25_price"),
          round(percentile(col("l_extendedprice"), lit(0.75)), 4).as("p75_price"))
    },

    // ------------------------------------------------- statistical aggs
    // Order-dependent FP aggregates rounded to 6dp on both engines.
    Q(
      "agg_statistics",
      Some("""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 6) AS sd_qty,
               round(var_samp(l_quantity), 6) AS var_qty,
               round(corr(l_quantity, l_discount), 6) AS corr_qty_disc,
               round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
        FROM lineitem GROUP BY l_returnflag
      """)) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_discount")), 6).as("corr_qty_disc"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qty_disc"))
    },

    // ------------------------------------------------------------- pivot
    // Spark .pivot with a FIXED value list (scalable: no driver-side value
    // discovery pass); oracle = conditional aggregation.
    Q(
      "pivot_event_types",
      Some("""
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        FROM events GROUP BY user_id
      """)) { (spark, dir) =>
      Tables(spark, dir).events
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count()
        .na
        .fill(0L)
        .select(
          col("user_id"),
          col("click"),
          col("view"),
          col("purchase"),
          col("signup"),
          col("error"))
    },

    // ----------------------------------------- deterministic hash sample
    // Engine-portable sampling: md5-prefix predicate gives the SAME sample
    // in any engine (unlike TABLESAMPLE) and pushes down as a scan filter.
    Q(
      "sample_hash_orders",
      Some("""
        SELECT o_orderkey, o_custkey, o_orderstatus
        FROM orders
        WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
      """)) { (spark, dir) =>
      Tables(spark, dir).orders
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    },

    // ------------------------------------------------ stratified sampling
    // Deterministic per-stratum downsampling — the corpus-curation move
    // that rebalances a mixture WITHOUT a shuffle or an RNG: each stratum
    // (here: language) gets its own keep-rate, applied as a hex threshold
    // on md5(doc_id) so membership is a pure function of the row. English
    // keeps 8/16 of docs, every other language 4/16. At 100 TB this is a
    // narrow scan-side filter (zero exchanges — plan-asserted in
    // PlanSpec); reruns and incremental re-ingests select the SAME rows,
    // so downstream dedup/splits stay stable across pipeline versions.
    Q(
      "sample_stratified",
      Some("""
        SELECT doc_id, lang, source FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
              < CASE WHEN lang = 'en' THEN '8' ELSE '4' END
      """)) { (spark, dir) =>
      Tables(spark, dir).documents
        .filter(
          substring(md5(col("doc_id").cast("string")), 1, 1)
            < when(col("lang") === "en", lit("8")).otherwise(lit("4")))
        .select(col("doc_id"), col("lang"), col("source"))
    },

    // ------------------------------------------------- weighted sampling
    // Fixed-SIZE weighted sampling without replacement (Efraimidis-
    // Spirakis A-ES): key = u^(1/w) per row, keep the global top-k keys —
    // the complement of sample_stratified (exact sample size, weights
    // instead of rates; here: upweight target languages 4:2:1). Two
    // determinism moves make it oracle-exact: u is a dyadic rational from
    // pure integer hashing ((id % p) * 2654435761 mod 2^20, +0.5, / 2^20
    // — every step exact in IEEE), and weights are POWERS OF TWO so
    // u^(1/w) evaluates as nested sqrt, which IEEE-754 requires to be
    // correctly rounded — bit-identical across engines, unlike pow/exp.
    // At 100 TB: narrow projection + TakeOrderedAndProject (per-partition
    // top-k heaps, no global sort).
    Q(
      "sample_weighted",
      Some("""
        WITH k AS (
          SELECT doc_id, lang,
                 (CAST(((doc_id % 1048573) * 2654435761) % 1048576 AS DOUBLE) + 0.5) / 1048576.0 AS u,
                 CASE WHEN lang = 'en' THEN 4 WHEN lang IN ('de', 'fr') THEN 2 ELSE 1 END AS w
          FROM documents)
        SELECT doc_id, lang, w,
               CASE w WHEN 4 THEN sqrt(sqrt(u)) WHEN 2 THEN sqrt(u) ELSE u END AS wkey
        FROM k
        ORDER BY wkey DESC, doc_id
        LIMIT 200
      """)) { (spark, dir) =>
      val u = (((col("doc_id") % 1048573L) * 2654435761L % 1048576L).cast("double") + lit(0.5)) /
        lit(1048576.0)
      val w = when(col("lang") === "en", 4)
        .when(col("lang").isin("de", "fr"), 2)
        .otherwise(1)
      Tables(spark, dir).documents
        .select(
          col("doc_id"),
          col("lang"),
          w.as("w"),
          when(w === 4, sqrt(sqrt(u)))
            .when(w === 2, sqrt(u))
            .otherwise(u)
            .as("wkey"))
        .orderBy(col("wkey").desc, col("doc_id"))
        .limit(200)
    },

    // ------------------------------------------------------------ unpivot
    // Wide→long inversion of the pivot above: every (user, metric) pair
    // survives including zero counts — the melt step feature pipelines run
    // before per-metric modeling. DuckDB UNPIVOT replays it exactly.
    Q(
      "unpivot_event_counts",
      Some("""
        WITH p AS (SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        FROM events GROUP BY user_id)
        SELECT user_id, metric, n FROM p UNPIVOT (n FOR metric IN (click, view, purchase, signup, error))
      """)) { (spark, dir) =>
      val metrics = Seq("click", "view", "purchase", "signup", "error")
      Tables(spark, dir).events
        .groupBy(col("user_id"))
        .pivot("event_type", metrics)
        .count()
        .na.fill(0L)
        .unpivot(Array(col("user_id")), metrics.map(col).toArray, "metric", "n")
    },

    // ------------------------------------------------- time-series gap-fill
    // Per-user hourly resample: zero-filled counts + LOCF value between a
    // user's first and last observed hour. Single-pass gap-run explode
    // (lead over the key partition) — no grid×observations join.
    Q(
      "gapfill_hourly_events",
      Some("""
        WITH h AS (SELECT user_id AS key, date_trunc('hour', ts) AS hr,
                          COUNT(*) AS n,
                          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
                   FROM events GROUP BY 1, 2),
        r AS (SELECT key, hr, n, sum_value,
                     lead(hr) OVER (PARTITION BY key ORDER BY hr) AS next_hr
              FROM h),
        g AS (SELECT key, hr, n, sum_value,
                     unnest(generate_series(hr, COALESCE(next_hr - INTERVAL 1 HOUR, hr), INTERVAL 1 HOUR)) AS ghr
              FROM r)
        SELECT key AS user_id, strftime(ghr, '%Y-%m-%d %H:%M:%S') AS hour_start,
               CASE WHEN ghr = hr THEN n ELSE 0 END AS n,
               CASE WHEN ghr = hr THEN sum_value END AS sum_value,
               sum_value AS v_locf
        FROM g
      """)) { (spark, dir) =>
      graft.operators.TimeSeries.gapFill(Tables(spark, dir).events, "user_id", "ts", "value")
        .select(
          col("key").as("user_id"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("n"),
          col("sum_value"),
          col("v_locf"))
    },

    // --------------------------------------------- trailing z-score anomaly
    // Per-user outlier scoring against the previous 10 events (current row
    // excluded; operators/TimeSeries.trailingZScore). The frame's order key
    // (ts, event_id) is total, so ROWS-frame contents are engine-identical;
    // μ/σ snap to the 6-decimal grid BEFORE the division (1/σ would
    // amplify their ulp drift past the final round's grid), and the final
    // round(·, 6) absorbs division drift. The ≥2-history guard is
    // load-bearing: Spark's stddev_samp over one row is NaN and NaN ranks
    // above every double in its comparisons.
    Q(
      "events_anomaly_zscore",
      Some("""
        WITH s AS (
          SELECT event_id, user_id, CAST(value AS DOUBLE) AS v,
                 round(avg(CAST(value AS DOUBLE)) OVER w, 6) AS mu,
                 round(stddev_samp(CAST(value AS DOUBLE)) OVER w, 6) AS sd,
                 COUNT(*) OVER w AS hist_n
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
        SELECT event_id AS id, user_id AS key, round((v - mu) / sd, 6) AS z
        FROM s WHERE hist_n >= 2 AND sd > 0
      """)) { (spark, dir) =>
      graft.operators.TimeSeries
        .trailingZScore(Tables(spark, dir).events, "user_id", "ts", "value", "event_id", window = 10)
    },

    // ------------------------------------------------------- EWMA serving
    // Final exponentially-weighted state per user (TimeSeries.ewmaFinal):
    // s1 = v1, st = α·vt + (1−α)·st−1 folded in (ts, value) order. α =
    // 0.125 and 1−α = 0.875 are exact binary doubles, every step is two
    // correctly-rounded mults + one add in a fixed order, so the fold is
    // bit-identical across engines before the final 1e-6 snap. DuckDB
    // replays via list_reduce (its seedless first-element init IS s1 = v1;
    // Spark mirrors with a null-seeded fold).
    Q(
      "events_ewma",
      Some("""
        SELECT user_id AS key, COUNT(*) AS n,
               ROUND(list_reduce(list(CAST(value AS DOUBLE) ORDER BY ts, value),
                                 (a, b) -> 0.125 * b + 0.875 * a), 6) AS ewma
        FROM events GROUP BY user_id
      """)) { (spark, dir) =>
      graft.operators.TimeSeries
        .ewmaFinal(Tables(spark, dir).events, "user_id", "ts", "value", alpha = 0.125)
    },

    // Holt level+trend per user (TimeSeries.holtFinal): double exponential
    // smoothing folded in total (ts, event_id) order — the trending-series
    // forecast EWMA structurally lags. α=0.25/β=0.125 exact binary; the
    // oracle walks the identical recurrence as a recursive CTE, so level,
    // trend AND the one-step forecast hash-match bit for bit.
    Q(
      "events_holt",
      Some("""
        WITH RECURSIVE seq AS (
          SELECT user_id, CAST(value AS DOUBLE) AS v,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events),
        cnt AS (SELECT user_id, COUNT(*) AS n FROM seq GROUP BY 1),
        hw(user_id, rn, l, b) AS (
          SELECT user_id, rn, v, 0.0::DOUBLE FROM seq WHERE rn = 1
          UNION ALL
          SELECT s.user_id, s.rn,
                 0.25::DOUBLE * s.v + 0.75::DOUBLE * (h.l + h.b),
                 0.125::DOUBLE * ((0.25::DOUBLE * s.v + 0.75::DOUBLE * (h.l + h.b)) - h.l)
                   + 0.875::DOUBLE * h.b
          FROM hw h JOIN seq s ON s.user_id = h.user_id AND s.rn = h.rn + 1)
        SELECT h.user_id AS key, c.n,
               ROUND(h.l, 6) AS level, ROUND(h.b, 6) AS trend,
               ROUND(h.l + h.b, 6) AS forecast_next
        FROM hw h JOIN cnt c ON c.user_id = h.user_id AND h.rn = c.n
      """)) { (spark, dir) =>
      graft.operators.TimeSeries.holtFinal(
        Tables(spark, dir).events, "user_id", "ts", "event_id", "value", alpha = 0.25, beta = 0.125)
    },

    // Pettitt changepoint test (TimeSeries.pettittTest): rank-based single
    // changepoint per event type's daily series — U_t = t(n+1) - cum(2r)
    // exact to the last integer via doubled average ranks, earliest-split
    // argmax, closed-form significance with the one exp under round(., 9).
    Q(
      "events_pettitt",
      Some("""
        WITH dd AS (SELECT event_type AS key, date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS v
                    FROM events GROUP BY 1, 2),
        rn AS (SELECT key, d, v, row_number() OVER (PARTITION BY key ORDER BY d) AS t FROM dd),
        vc AS (SELECT key, v, COUNT(*) AS cnt FROM dd GROUP BY 1, 2),
        r2 AS (SELECT key, v,
                      COALESCE(SUM(cnt) OVER (PARTITION BY key ORDER BY v
                                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
                        + cnt + 1 AS r2
               FROM vc),
        u AS (SELECT rn.key, rn.d, rn.t,
                     COUNT(*) OVER (PARTITION BY rn.key) AS n,
                     SUM(r2.r2) OVER (PARTITION BY rn.key ORDER BY rn.t
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w2
              FROM rn JOIN r2 ON r2.key = rn.key AND r2.v = rn.v),
        ut AS (SELECT key, d, t, n, CAST(t * (n + 1) - w2 AS BIGINT) AS u_t FROM u WHERE t < n),
        pick AS (SELECT *, row_number() OVER (PARTITION BY key ORDER BY abs(u_t) DESC, t ASC) AS pk
                 FROM ut)
        SELECT key, n, t AS cp_index, d AS cp_at, abs(u_t) AS k_stat,
               round(LEAST(1.0, 2.0 * exp(-6.0 * CAST(abs(u_t) AS DOUBLE) * CAST(abs(u_t) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    + CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))), 9) AS p_value,
               round(LEAST(1.0, 2.0 * exp(-6.0 * CAST(abs(u_t) AS DOUBLE) * CAST(abs(u_t) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    + CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))), 9) <= 0.05 AS significant
        FROM pick WHERE pk = 1 ORDER BY key
      """)) { (spark, dir) =>
      val daily = Tables(spark, dir).events
        .groupBy(col("event_type").as("etype"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("v"))
      graft.operators.TimeSeries.pettittTest(daily, "etype", "d", "v", alphaSig = 0.05)
    },

    // Holt-Winters additive triple smoothing (TimeSeries.holtWintersFinal):
    // the seasonal member of the smoothing family — day-of-week period 7
    // over each event type's daily-count series, zero-seasonal init,
    // binary-exact alpha/beta/gamma so the per-step double chain is
    // bit-identical; the oracle's recursive CTE carries (l, b, s1..s7)
    // with generated CASE slot arms.
    Q("events_holt_winters", Some(holtWintersSql(7))) { (spark, dir) =>
      val daily = Tables(spark, dir).events
        .groupBy(col("event_type").as("key"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("v"))
      graft.operators.TimeSeries.holtWintersFinal(
        daily, "key", "d", "d", "v", alpha = 0.25, beta = 0.125, gamma = 0.25, period = 7)
    },

    // ------------------------------------ holdout forecast evaluation
    // The EVAL leg of the time-series family: hold out the last 7 days
    // of each event type's daily-count series, fit Holt on the prefix
    // (the proven recursive fold, binary-exact alpha/beta), extrapolate
    // l + h*b, and score MAE / MAPE / sMAPE / MASE — errors snap to the
    // 1e-6 grid (exact for count series), per-term ratios to 1e-9,
    // exact decimal sums, one division per metric under round(., 6).
    Q(
      "events_forecast_accuracy",
      Some("""
        WITH RECURSIVE dd AS (SELECT event_type AS key, date_trunc('day', ts) AS d, COUNT(*) AS vi
                              FROM events GROUP BY 1, 2),
        seq0 AS (SELECT key, CAST(vi AS DOUBLE) AS v,
                        row_number() OVER (PARTITION BY key ORDER BY d) AS rn
                 FROM dd),
        cnt AS (SELECT key, COUNT(*) AS n FROM seq0 GROUP BY 1 HAVING COUNT(*) >= 9),
        seq AS (SELECT s.key, s.v, s.rn, c.n FROM seq0 s JOIN cnt c USING (key)),
        tr AS (SELECT key, v, rn FROM seq WHERE rn <= n - 7),
        ntr AS (SELECT key, COUNT(*) AS n_train FROM tr GROUP BY 1),
        hw(key, rn, l, b) AS (
          SELECT key, rn, v, 0.0::DOUBLE FROM tr WHERE rn = 1
          UNION ALL
          SELECT t.key, t.rn,
                 0.25::DOUBLE * t.v + 0.75::DOUBLE * (h.l + h.b),
                 0.125::DOUBLE * ((0.25::DOUBLE * t.v + 0.75::DOUBLE * (h.l + h.b)) - h.l)
                   + 0.875::DOUBLE * h.b
          FROM hw h JOIN tr t ON t.key = h.key AND t.rn = h.rn + 1),
        fit AS (SELECT h.key, ROUND(h.l, 6) AS l, ROUND(h.b, 6) AS b
                FROM hw h JOIN ntr ON ntr.key = h.key AND h.rn = ntr.n_train),
        naive AS (SELECT key, SUM(CAST(round(abs(v - prev), 6) AS DECIMAL(20,6))) AS nsum,
                         COUNT(*) AS m
                  FROM (SELECT key, v, lag(v) OVER (PARTITION BY key ORDER BY rn) AS prev FROM tr)
                  WHERE prev IS NOT NULL GROUP BY 1),
        hold AS (SELECT key, rn - (n - 7) AS h, v FROM seq WHERE rn > n - 7),
        e AS (SELECT hold.key, hold.h, hold.v, round(fit.l + hold.h * fit.b, 6) AS yhat
              FROM hold JOIN fit USING (key)),
        ae AS (SELECT key, v, yhat, CAST(round(abs(v - yhat), 6) AS DECIMAL(20,6)) AS ae FROM e),
        t2 AS (SELECT key, COUNT(*) AS hn, SUM(ae) AS sae,
                      SUM(CASE WHEN v <> 0
                               THEN CAST(round(CAST(ae AS DOUBLE) / abs(v), 9) AS DECIMAL(20,9)) END) AS ape_s,
                      COUNT(CASE WHEN v <> 0 THEN 1 END) AS ape_n,
                      SUM(CASE WHEN abs(v) + abs(yhat) > 0
                               THEN CAST(round(2.0 * CAST(ae AS DOUBLE) / (abs(v) + abs(yhat)), 9) AS DECIMAL(20,9)) END) AS smape_s,
                      COUNT(CASE WHEN abs(v) + abs(yhat) > 0 THEN 1 END) AS smape_n
               FROM ae GROUP BY 1),
        m2 AS (SELECT t2.*, round(CAST(sae AS DOUBLE) / CAST(hn AS DOUBLE), 6) AS mae FROM t2)
        SELECT m2.key, ntr.n_train, m2.hn AS horizon, m2.mae,
               CASE WHEN ape_n > 0
                    THEN round(CAST(ape_s AS DOUBLE) / CAST(ape_n AS DOUBLE), 6) END AS mape,
               CASE WHEN smape_n > 0
                    THEN round(CAST(smape_s AS DOUBLE) / CAST(smape_n AS DOUBLE), 6) END AS smape,
               CASE WHEN nsum > 0
                    THEN round(mae / (CAST(nsum AS DOUBLE) / CAST(m AS DOUBLE)), 6) END AS mase
        FROM m2 JOIN ntr USING (key) JOIN naive USING (key)
        ORDER BY m2.key
      """)) { (spark, dir) =>
      val daily = Tables(spark, dir).events
        .groupBy(col("event_type").as("etype"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("v"))
      graft.operators.TimeSeries.forecastAccuracy(
        daily, "etype", "d", "d", "v", alpha = 0.25, beta = 0.125, horizon = 7)
    },

    // ---------------------------------------- Theil-Sen robust trend
    // The median-of-pairwise-slopes estimator (29% breakdown) beside
    // the OLS trend one wild day can drag: per-pair slopes snap to the
    // 1e-9 grid, medians are pure rank selections (two-middle average
    // under round(., 6)), intercept residuals use the rounded slope.
    // Pairs live on the post-aggregation daily series — series-sized
    // squared, never data-sized.
    Q(
      "events_theil_sen",
      Some("""
        WITH dd AS (SELECT event_type AS key, date_trunc('day', ts) AS d, COUNT(*) AS v
                    FROM events GROUP BY 1, 2),
        p AS (SELECT key, date_diff('day', DATE '1970-01-01', CAST(d AS DATE)) AS x,
                     CAST(v AS BIGINT) AS y
              FROM dd),
        pr AS (SELECT a.key,
                      CAST(round(CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE), 9) AS DECIMAL(20,9)) AS s
               FROM p a JOIN p b ON a.key = b.key AND b.x > a.x),
        sr AS (SELECT key, s, row_number() OVER (PARTITION BY key ORDER BY s) AS rn,
                      COUNT(*) OVER (PARTITION BY key) AS m
               FROM pr),
        sm AS (SELECT key, round(AVG(CAST(s AS DOUBLE)), 6) AS slope, MIN(m) AS n_pairs
               FROM sr WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1 GROUP BY key),
        res AS (SELECT p.key,
                       CAST(round(CAST(p.y AS DOUBLE) - sm.slope * CAST(p.x AS DOUBLE), 9) AS DECIMAL(20,9)) AS r
                FROM p JOIN sm USING (key)),
        rr AS (SELECT key, r, row_number() OVER (PARTITION BY key ORDER BY r) AS rn,
                      COUNT(*) OVER (PARTITION BY key) AS m
               FROM res),
        im AS (SELECT key, round(AVG(CAST(r AS DOUBLE)), 6) AS intercept
               FROM rr WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1 GROUP BY key),
        np AS (SELECT key, COUNT(*) AS n_points FROM p GROUP BY 1)
        SELECT np.key, np.n_points, sm.n_pairs, sm.slope, im.intercept
        FROM np JOIN sm USING (key) JOIN im USING (key)
        ORDER BY np.key
      """)) { (spark, dir) =>
      val daily = Tables(spark, dir).events
        .groupBy(col("event_type").as("etype"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("v"))
        .select(
          col("etype"),
          datediff(col("d").cast("date"), to_date(lit("1970-01-01"))).as("x"),
          col("v"))
      graft.operators.TimeSeries.theilSenTrend(daily, "etype", "x", "v")
    },

    // ------------------------------------------------- autocorrelation
    // Sample ACF of the global hourly event-count series at lags 1..12 —
    // the seasonality/independence detector. Exact-integer trick: with
    // S = Σx the n-scaled centered value c_t = n·x_t − S is an integer and
    // ρ̂(k) = Σc_t·c_{t+k} / Σc_t² (the n² cancels) — both sides exact
    // decimal/HUGEINT sums, ONE double division per lag, round 6. The
    // series is the post-aggregation time axis (~720 rows at sf0.1), so
    // the per-lag self-join is broadcast-sized by construction.
    Q(
      "events_acf",
      Some("""
        WITH hx AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x FROM events GROUP BY 1),
        m AS (SELECT COUNT(*) AS n, SUM(x) AS s FROM hx),
        c AS (SELECT row_number() OVER (ORDER BY h) AS rn,
                     CAST(n AS HUGEINT) * x - CAST(s AS HUGEINT) AS c
              FROM hx, m),
        den AS (SELECT SUM(c*c) AS d FROM c),
        num AS (SELECT l.lag AS lag, COUNT(*) AS n_pairs, SUM(a.c * b.c) AS num
                FROM generate_series(1, 12) l(lag)
                JOIN c a ON TRUE JOIN c b ON b.rn = a.rn + l.lag
                GROUP BY 1)
        SELECT lag, n_pairs, round(CAST(num AS DOUBLE) / CAST(d AS DOUBLE), 6) AS acf
        FROM num, den ORDER BY lag
      """)) { (spark, dir) =>
      graft.operators.TimeSeries.acf(Tables(spark, dir).events, "ts", maxLag = 12)
    },

    // ----------------------------------------------- CUSUM changepoint
    // Page's cumulative-sum level-shift scan over the same hourly series:
    // C_t = Σ_{i≤t}(x_i − x̄) peaks at the changepoint. n·C_t =
    // n·cumsum(x) − t·S is exact integer arithmetic, so the peak flag is
    // an EXACT comparison (ties all flag, no argmax ambiguity); the one
    // ÷n division lands under round(·, 6). Whole series emitted — the
    // replay checks every step, not just the argmax.
    Q(
      "events_cusum",
      Some("""
        WITH hx AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x FROM events GROUP BY 1),
        m AS (SELECT COUNT(*) AS n, SUM(x) AS s FROM hx),
        c AS (SELECT h, x, n,
                     CAST(n AS HUGEINT) * SUM(x) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - row_number() OVER (ORDER BY h) * CAST(s AS HUGEINT) AS nc
              FROM hx, m),
        pk AS (SELECT MAX(ABS(nc)) AS pk FROM c)
        SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start, x,
               round(CAST(nc AS DOUBLE) / CAST(n AS DOUBLE), 6) AS cusum,
               (ABS(nc) = pk) AS is_peak
        FROM c, pk ORDER BY 1
      """)) { (spark, dir) =>
      graft.operators.TimeSeries.cusum(Tables(spark, dir).events, "ts")
        .select(
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("x"), col("cusum"), col("is_peak"))
    },

    // ------------------------------------------ seasonal profile (24h)
    // The additive hour-of-day seasonal component: mean hourly count per
    // hour-of-day minus the grand mean — exact integer sums, both
    // divisions snapped to 1e-6 BEFORE the subtraction; peak flags are
    // Kleinberg-style burst detection (TimeSeries.burstDetect): two-state
    // Viterbi over the hourly series on the 1e-6 integer cost grid. The
    // oracle replays the identical scan as two recursive CTEs — forward
    // min-plus with parent lists, then the backtrace walk.
    Q(
      "events_burst",
      Some("""
        WITH RECURSIVE
        hx AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x FROM events GROUP BY 1),
        m AS (SELECT COUNT(*) AS t_n, CAST(SUM(x) AS BIGINT) AS s_n FROM hx),
        ser AS (SELECT list(x ORDER BY h) AS xs, list(h ORDER BY h) AS hs FROM hx),
        par AS (SELECT xs, hs, len(xs) AS t_n,
                       CAST(m.s_n AS DOUBLE) / m.t_n AS lam0,
                       3.0 * (CAST(m.s_n AS DOUBLE) / m.t_n) AS lam1,
                       CAST(round(ln(CAST(m.t_n AS DOUBLE)) * 1.0 * 1000000.0, 0) AS BIGINT) AS tau
                FROM ser, m),
        cost AS (SELECT *,
                   list_transform(xs, e -> CAST(round((lam0 - e * ln(lam0)) * 1000000.0, 0) AS BIGINT)) AS c0,
                   list_transform(xs, e -> CAST(round((lam1 - e * ln(lam1)) * 1000000.0, 0) AS BIGINT)) AS c1
                 FROM par),
        fw AS (
          SELECT t_n, tau, c0, c1, hs, xs, 1 AS t, c0[1] AS d0, c1[1] + tau AS d1,
                 CAST([] AS BOOLEAN[]) AS p0, CAST([] AS BOOLEAN[]) AS p1
          FROM cost
          UNION ALL
          SELECT t_n, tau, c0, c1, hs, xs, t + 1,
                 c0[t + 1] + least(d0, d1),
                 c1[t + 1] + least(d0 + tau, d1),
                 list_append(p0, d1 < d0),
                 list_append(p1, d1 < d0 + tau)
          FROM fw WHERE t < t_n),
        bt AS (
          SELECT t_n, hs, xs, p0, p1, t_n AS t, [d1 < d0] AS st
          FROM fw WHERE t = t_n
          UNION ALL
          SELECT t_n, hs, xs, p0, p1, t - 1,
                 list_prepend(CASE WHEN st[1] THEN p1[t - 1] ELSE p0[t - 1] END, st)
          FROM bt WHERE t > 1)
        SELECT strftime(hs[i], '%Y-%m-%d %H:%M:%S') AS hour_start,
               CAST(xs[i] AS BIGINT) AS x,
               st[i] AS in_burst
        FROM (SELECT hs, xs, st FROM bt WHERE t = 1) r,
             LATERAL (SELECT unnest(range(1, len(hs) + 1)) AS i) u
      """)) { (spark, dir) =>
      graft.operators.TimeSeries.burstDetect(Tables(spark, dir).events, "ts", s = 3.0, gamma = 1.0)
        .select(
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("x"),
          col("in_burst"))
    },

    // Pairwise DTW between event-type daily profiles
    // (TimeSeries.dtwDailyProfiles): phase-tolerant load-shape similarity,
    // all-integer micro-share DP. The oracle replays the SAME cell-by-cell
    // scan as a recursive CTE over t = i·n + j carrying (prev, cur) row
    // lists — pairs advance in lockstep because the day axis is shared, so
    // one recursion drives every pair.
    Q(
      "events_dtw",
      Some("""
        WITH RECURSIVE
        daily AS (SELECT event_type AS etype, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
                  FROM events GROUP BY 1, 2),
        days AS (SELECT DISTINCT day FROM daily),
        types AS (SELECT DISTINCT etype FROM daily),
        grid AS (SELECT t.etype, d.day, COALESCE(x.cnt, 0) AS cnt
                 FROM types t CROSS JOIN days d
                 LEFT JOIN daily x ON x.etype = t.etype AND x.day = d.day),
        tot AS (SELECT etype, CAST(SUM(cnt) AS BIGINT) AS total FROM grid GROUP BY 1),
        prof AS (SELECT g.etype,
                        list(CAST(g.cnt * 1000000 // t.total AS BIGINT) ORDER BY g.day) AS series
                 FROM grid g JOIN tot t ON g.etype = t.etype GROUP BY g.etype),
        pairs AS (SELECT a.etype AS type_a, b.etype AS type_b,
                         a.series AS sa, b.series AS sb, len(a.series) AS n
                  FROM prof a JOIN prof b ON a.etype < b.etype),
        dp AS (
          SELECT type_a, type_b, sa, sb, n, 0 AS t,
                 CAST([] AS BIGINT[]) AS prev, CAST([] AS BIGINT[]) AS cur
          FROM pairs
          UNION ALL
          SELECT type_a, type_b, sa, sb, n, t + 1,
                 CASE WHEN (t % n) = n - 1 THEN list_append(cur, cell) ELSE prev END,
                 CASE WHEN (t % n) = n - 1 THEN CAST([] AS BIGINT[]) ELSE list_append(cur, cell) END
          FROM (
            SELECT *,
                   abs(sa[(t // n) + 1] - sb[(t % n) + 1])
                   + CASE WHEN t // n = 0 AND t % n = 0 THEN 0
                          WHEN t // n = 0 THEN cur[t % n]
                          WHEN t % n = 0 THEN prev[1]
                          ELSE least(prev[(t % n) + 1], prev[t % n], cur[t % n]) END AS cell
            FROM dp WHERE t < n * n) s)
        SELECT type_a, type_b,
               CAST(n AS BIGINT) AS n_points,
               prev[n] AS dtw_micro,
               CAST(prev[n] AS DOUBLE) / 1000000.0 AS dtw
        FROM dp WHERE t = n * n
      """)) { (spark, dir) =>
      graft.operators.TimeSeries.dtwDailyProfiles(Tables(spark, dir).events, "ts", "event_type")
    },

    // exact compares on snapped means.
    Q(
      "events_seasonal",
      Some("""
        WITH hx AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x FROM events GROUP BY 1),
        hod AS (SELECT EXTRACT(hour FROM h) AS hour_of_day, COUNT(*) AS n_hours,
                       CAST(SUM(x) AS BIGINT) AS s
                FROM hx GROUP BY 1),
        g AS (SELECT CAST(SUM(s) AS BIGINT) AS st, CAST(SUM(n_hours) AS BIGINT) AS nt FROM hod),
        m AS (SELECT hour_of_day, n_hours,
                     round(CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE), 6) AS mean_count,
                     round(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS grand_mean
              FROM hod, g),
        pk AS (SELECT MAX(mean_count) AS pk FROM m)
        SELECT hour_of_day, n_hours, mean_count,
               round(mean_count - grand_mean, 6) AS seasonal,
               (mean_count = pk) AS peak_hour
        FROM m, pk ORDER BY 1
      """)) { (spark, dir) =>
      graft.operators.TimeSeries.seasonalProfile(Tables(spark, dir).events, "ts")
    },

    // --------------------------------------------- Page-Hinkley drift
    // The ONLINE mean-shift detector per user (m_t = Σ(x_i − x̄_i − δ),
    // alarm when m − min m > λ) — the O(1)-state incremental cousin of
    // events_cusum and the replay spec for the streaming twin. Values
    // snap to the 1e-9 grid; the running mean is one exact-cast double
    // division per row, re-snapped before the exact cumulative sum; the
    // running min and alarm compare are exact decimal ops.
    Q(
      "events_page_hinkley",
      Some("""
        WITH s AS (SELECT user_id, ts, event_id,
                          CAST(round(CAST(value AS DOUBLE), 9) AS DECIMAL(20,9)) AS v
                   FROM events),
        c AS (SELECT user_id, ts, event_id, v,
                     CAST(SUM(v) OVER w AS DECIMAL(20,9)) AS sm,
                     CAST(COUNT(*) OVER w AS BIGINT) AS n
              FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        t AS (SELECT user_id, ts, event_id,
                     CAST(round((CAST(v AS DOUBLE) - CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)) - 0.5, 9)
                          AS DECIMAL(20,9)) AS term
              FROM c),
        m AS (SELECT user_id, ts, event_id,
                     CAST(SUM(term) OVER w AS DECIMAL(20,9)) AS m
              FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        p AS (SELECT user_id, ts, event_id, m,
                     CAST(MIN(m) OVER w AS DECIMAL(20,9)) AS mn
              FROM m WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT user_id AS key, event_id AS id,
               CAST(round(m - mn, 6) AS DOUBLE) AS ph,
               (m - mn) > CAST(150 AS DECIMAL(20,9)) AS alarm
        FROM p
      """)) { (spark, dir) =>
      graft.operators.TimeSeries.pageHinkley(
        Tables(spark, dir).events, "user_id", "ts", "event_id", "value",
        delta = 0.5, lambda = new java.math.BigDecimal(150))
    },

    // -------------------------------------------- common-neighbor pairs
    // Per-node triangle counts + local clustering coefficient over the
    // part co-purchase graph (parts sharing an order), via degree-ordered
    // "compact-forward" wedge closing — oriented out-neighborhoods are
    // O(√m) regardless of hubs, Σoutdeg² ≤ O(m^1.5) vs the naive
    // adjacency join's max-degree² blow-up. The oracle is the
    // algorithm-INDEPENDENT exact 3-way join on canonical a<b edges; the
    // operator's orientation changes the plan, not the answer. Exact
    // integers until the one lcc division, rounded to 6.
    Q(
      "graph_triangles",
      Some("""
        WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 25),
        e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        deg AS (SELECT id, COUNT(*) AS degree
                FROM (SELECT a AS id FROM e UNION ALL SELECT b AS id FROM e) GROUP BY 1),
        t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
              JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        pn AS (SELECT id, COUNT(*) AS n_triangles
               FROM (SELECT x AS id FROM t UNION ALL SELECT y AS id FROM t UNION ALL SELECT z AS id FROM t)
               GROUP BY 1)
        SELECT deg.id, deg.degree, COALESCE(pn.n_triangles, 0) AS n_triangles,
               ROUND(CASE WHEN deg.degree >= 2
                          THEN CAST(COALESCE(pn.n_triangles, 0) * 2 AS DOUBLE)
                               / (deg.degree * (deg.degree - 1))
                          ELSE 0.0::DOUBLE END, 6) AS clustering
        FROM deg LEFT JOIN pn ON pn.id = deg.id
      """)) { (spark, dir) =>
      // bulk-quantity co-purchases: thins the graph (325k edges / 232k
      // triangles at sf0.1 instead of 1.2M / 1.9M) so the gate row costs
      // ~2 s, not ~10 — the operator itself takes any edge list
      val li = Tables(spark, dir).lineitem
        .filter(col("l_quantity") >= 25)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("x")
        .join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") && col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      graft.operators.Graph.triangleStats(edges, "pa", "pb")
    },

    // Newman modularity of the NATION partition on the customer-supplier
    // co-purchase graph (Graph.modularity): is trade nation-assortative?
    // The community-quality audit for ANY labeling — cross-multiplied
    // exact integer numerator, one division.
    Q(
      "graph_modularity",
      Some("""
        WITH e0 AS (SELECT DISTINCT o_custkey AS a, l_suppkey + 10000000 AS b
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        und AS (SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b FROM e0 WHERE a <> b),
        lab AS (SELECT c_custkey AS id, CAST(c_nationkey AS VARCHAR) AS c FROM customer
                UNION ALL
                SELECT s_suppkey + 10000000, CAST(s_nationkey AS VARCHAR) FROM supplier),
        el AS (SELECT und.a, und.b, la.c AS ca, lb.c AS cb
               FROM und JOIN lab la ON la.id = und.a JOIN lab lb ON lb.id = und.b),
        m AS (SELECT COUNT(*) AS m FROM el),
        nn AS (SELECT COUNT(*) AS n_nodes FROM
                 (SELECT DISTINCT id FROM (SELECT a AS id FROM el UNION ALL SELECT b FROM el))),
        ec AS (SELECT ca AS c, COUNT(*) AS e_c FROM el WHERE ca = cb GROUP BY 1),
        dc AS (SELECT c, COUNT(*) AS d_c FROM
                 (SELECT ca AS c FROM el UNION ALL SELECT cb FROM el) GROUP BY 1),
        ag AS (SELECT COUNT(*) AS n_communities,
                      CAST(SUM(4 * (SELECT m FROM m)::HUGEINT * COALESCE(ec.e_c, 0)
                               - CAST(dc.d_c AS HUGEINT) * dc.d_c) AS BIGINT) AS q_num
               FROM dc LEFT JOIN ec ON ec.c = dc.c)
        SELECT (SELECT n_nodes FROM nn) AS n_nodes, n_communities,
               (SELECT m FROM m) AS m_edges, q_num,
               round(CASE WHEN (SELECT m FROM m) > 0
                     THEN CAST(q_num AS DOUBLE)
                          / (4.0 * CAST((SELECT m FROM m) AS DOUBLE) * CAST((SELECT m FROM m) AS DOUBLE))
                     END, 6) AS q_modularity
        FROM ag
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val edges = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 10000000L).as("dst"))
        .distinct()
      val labels = t.customer
        .select(col("c_custkey").as("id"), col("c_nationkey").cast("string").as("nat"))
        .unionAll(t.supplier
          .select((col("s_suppkey") + 10000000L).as("id"), col("s_nationkey").cast("string").as("nat")))
      graft.operators.Graph.modularity(edges, "src", "dst", labels, "id", "nat")
    },

    // Rich-club coefficient ladder (Graph.richClub): do co-purchase hubs
    // link to each other more densely than the graph at large? One edge
    // pass with every ladder rung as a conditional sum — exact integers,
    // one division per rung, NULL below 2 qualifying nodes.
    Q(
      "graph_rich_club",
      Some("""
        WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
        e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        deg AS (SELECT id, COUNT(*) AS dg
                FROM (SELECT a AS id FROM e UNION ALL SELECT b AS id FROM e) GROUP BY 1),
        ed AS (SELECT e.a, e.b, da.dg AS da, db.dg AS db
               FROM e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b),
        ks(k) AS (VALUES (1), (2), (4), (8), (16), (32)),
        rungs AS (SELECT k,
                         (SELECT COUNT(*) FROM deg WHERE dg > k) AS n_nodes,
                         (SELECT COUNT(*) FROM ed WHERE LEAST(da, db) > k) AS n_edges
                  FROM ks)
        SELECT CAST(k AS BIGINT) AS k, n_nodes, n_edges,
               round(CASE WHEN n_nodes >= 2
                     THEN CAST(n_edges * 2 AS DOUBLE)
                          / (CAST(n_nodes AS DOUBLE) * CAST(n_nodes - 1 AS DOUBLE)) END, 6) AS phi
        FROM rungs ORDER BY k
      """)) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("x")
        .join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") && col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      graft.operators.Graph.richClub(edges, "pa", "pb", ks = Seq(1L, 2L, 4L, 8L, 16L, 32L))
    },

    // ------------------------------------------------ k-core extraction
    // Dense-kernel extraction (Seidman 1983): parallel peeling of nodes
    // with degree < k until the fixpoint — the maximal subgraph where
    // every node keeps >= k neighbors (community seeds / spam-farm
    // kernels). The bulk-quantity (>=45) co-purchase graph peels in 5-9
    // cascading rounds at the gate SFs; the oracle unrolls 12 (rounds past
    // the fixpoint are no-ops, so the engine's early exit and the padded
    // replay agree exactly). Output = survivors with within-core degree,
    // all-integer.
    Q("graph_kcore", Some(kCoreOracle(k = 3, rounds = 12))) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("x")
        .join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") && col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      graft.operators.Graph.kCore(edges, "pa", "pb", k = 3)
    },

    // ------------------------------------------- degree assortativity
    // Newman's one-number mixing signal over the same co-purchase graph:
    // Pearson r of endpoint degrees on the symmetrized edge list —
    // r = (n·Σxy − (Σx)²)/(n·Σxx − (Σx)²) with exact integer moments and
    // ONE double division, round 6 (regular graph → NULL, never NaN).
    Q(
      "graph_assortativity",
      Some("""
        WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
        e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        d AS (SELECT id, COUNT(*) AS dg FROM (SELECT a AS id FROM e UNION ALL SELECT b AS id FROM e) GROUP BY 1),
        j AS (SELECT da.dg AS x, db.dg AS y FROM e JOIN d da ON da.id = e.a JOIN d db ON db.id = e.b),
        m AS (SELECT CAST(2 * COUNT(*) AS BIGINT) AS n, CAST(SUM(x + y) AS BIGINT) AS sx,
                     CAST(SUM(x*x + y*y) AS BIGINT) AS sxx, CAST(SUM(2*x*y) AS BIGINT) AS sxy
              FROM j)
        SELECT (SELECT COUNT(*) FROM d) AS n_nodes, n // 2 AS n_edges,
               CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                    ELSE ROUND(CAST(n * sxy - sx * sx AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS assortativity
        FROM m
      """)) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("x")
        .join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") && col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      graft.operators.Graph.degreeAssortativity(edges, "pa", "pb")
    },

    // -------------------------------------- betweenness (Brandes pivots)
    // Sampled bounded-distance betweenness over the qty≥45 co-purchase
    // graph: 4 deterministic pivots (smallest ids), 3-hop horizon —
    // forward BFS with exact integer σ path counts, Brandes' backward
    // dependency pass with every contribution snapped to the 1e-9 grid
    // before exact decimal sums. The oracle unrolls all levels both ways.
    Q(
      "graph_betweenness",
      Some(betweennessOracle(nSources = 4, maxDepth = 3))) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("x")
        .join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") && col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      graft.operators.Graph.betweennessSampled(edges, "pa", "pb", nSources = 4, maxDepth = 3)
    },

    // ------------------------------------------------- k-truss peeling
    // The EDGE analog of graph_kcore over the same qty≥45 co-purchase
    // graph: edges in < k−2 triangles peel until the dense mutual-
    // neighbor kernel remains (stricter than coring — stars survive
    // k-core but carry no triangles). 6 fixed peel rounds, support via
    // degree-ordered triangle listing; the oracle unrolls the rounds
    // with the algorithm-independent 3-way join.
    Q(
      "graph_ktruss",
      Some(kTrussOracle(k = 3, rounds = 6))) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("x")
        .join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") && col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      graft.operators.Graph.kTruss(edges, "pa", "pb", k = 3, rounds = 6)
    },

    // ---------------------------------------- pivot eccentricities
    // iFUB-style diameter probe over the same co-purchase graph: per
    // pivot, the farthest BFS level within the 4-hop horizon plus ball
    // size; the max over pivots is a diameter lower bound. All-integer,
    // reuses the harmonic forward machinery.
    Q(
      "graph_eccentricity",
      Some(eccentricityOracle(nSources = 6, maxDepth = 4))) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("x")
        .join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") && col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      graft.operators.Graph.eccentricitySampled(edges, "pa", "pb", nSources = 6, maxDepth = 4)
    },

    // ------------------------------------------- harmonic centrality
    // Bounded-distance harmonic centrality from 6 deterministic pivots
    // (Boldi-Vigna's disconnection-robust closeness): Σ 1/d over 3-hop
    // BFS balls, 1/d on the 1e-12 grid, exact decimal sums. Shares the
    // betweenness forward machinery; the oracle unrolls the levels.
    Q(
      "graph_harmonic",
      Some(harmonicOracle(nSources = 6, maxDepth = 3))) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("x")
        .join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") && col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      graft.operators.Graph.harmonicSampled(edges, "pa", "pb", nSources = 6, maxDepth = 3)
    },

    // Supplier pairs by shared customers (Graph.commonNeighborPairs over
    // the order bipartite graph): the co-occurrence primitive behind
    // item-item recommenders. Hub discipline: customers over 50 distinct
    // suppliers are dropped BEFORE pairing (quadratic fan-out carries no
    // pair-specific signal — the IDF argument), broadcast as a LeftAnti;
    // the oracle replays the cap exactly. Top-100 by (shared, a, b) —
    // all-integer, exact.
    Q(
      "graph_common_neighbors",
      Some("""
        WITH e AS (SELECT DISTINCT l_suppkey AS l, o_custkey AS r
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        deg AS (SELECT r, COUNT(*) AS deg FROM e GROUP BY r),
        cold AS (SELECT e.l, e.r FROM e JOIN deg USING (r) WHERE deg.deg <= 50),
        p AS (SELECT x.l AS a, y.l AS b, COUNT(*) AS shared
              FROM cold x JOIN cold y ON x.r = y.r AND x.l < y.l
              GROUP BY 1, 2)
        SELECT a, b, shared FROM p ORDER BY shared DESC, a, b LIMIT 100
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val edges = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("supp"), col("o_custkey").as("cust"))
      graft.operators.Graph
        .commonNeighborPairs(edges, "supp", "cust", maxDegree = 50)
        .orderBy(col("shared").desc, col("a"), col("b"))
        .limit(100)
    },

    // --------------------------------------------- Adamic-Adar prediction
    // Same supplier–customer bipartite graph, but each shared customer is
    // discounted by 1/ln(its supplier count) — Adamic-Adar link prediction
    // (the soft IDF the hub cap applies by fiat). Weights snap to the
    // 1e-12 decimal grid and sum exactly; ranking uses the EXACT decimal
    // sum (aa desc, a, b) so the top-100 cut never straddles a rounding
    // collision, then the one final round(·, 6).
    Q(
      "graph_adamic_adar",
      Some("""
        WITH e AS (SELECT DISTINCT l_suppkey AS l, o_custkey AS r
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        deg AS (SELECT r, COUNT(*) AS dg FROM e GROUP BY r),
        w AS (SELECT r, CAST(round(1.0 / ln(dg), 12) AS DECIMAL(20,12)) AS w
              FROM deg WHERE dg BETWEEN 2 AND 50),
        cold AS (SELECT e.l, e.r FROM e JOIN deg USING (r) WHERE deg.dg <= 50),
        p AS (SELECT x.l AS a, y.l AS b, COUNT(*) AS shared, SUM(w.w) AS aa_exact
              FROM cold x JOIN w ON w.r = x.r JOIN cold y ON x.r = y.r AND x.l < y.l
              GROUP BY 1, 2)
        SELECT a, b, shared, CAST(round(aa_exact, 6) AS DOUBLE) AS aa
        FROM p WHERE shared >= 2
        ORDER BY aa_exact DESC, a, b LIMIT 100
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val edges = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("supp"), col("o_custkey").as("cust"))
      graft.operators.Graph
        .adamicAdar(edges, "supp", "cust", maxDegree = 50, minShared = 2L)
        .orderBy(col("aa_exact").desc, col("a"), col("b"))
        .limit(100)
        .select(col("a"), col("b"), col("shared"),
          round(col("aa_exact"), 6).cast("double").as("aa"))
    },

    // -------------------------------------------------------- outer joins
    // LEFT OUTER with null-group handling: customers' 2001+ order counts,
    // zero (not missing) for inactive customers.
    Q(
      "join_left_outer_counts",
      Some("""
        SELECT c_custkey, COUNT(o_orderkey) AS n_recent
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        GROUP BY c_custkey
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer
        .join(
          t.orders.filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"),
          "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_recent"))
    },

    // FULL OUTER across two key sets with asymmetric presence.
    Q(
      "join_full_outer_presence",
      Some("""
        SELECT COALESCE(a.k, b.k) AS k,
               a.k IS NOT NULL AS in_1995,
               b.k IS NOT NULL AS in_2001
        FROM (SELECT DISTINCT o_custkey AS k FROM orders
              WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00') a
        FULL OUTER JOIN
             (SELECT DISTINCT o_custkey AS k FROM orders
              WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00') b
        ON a.k = b.k
      """)) { (spark, dir) =>
      val o = Tables(spark, dir).orders
      def keys(lo: String, hi: Option[String]) = {
        val base = o.filter(col("o_orderdate") >= lit(lo).cast("timestamp"))
        hi.fold(base)(h => base.filter(col("o_orderdate") < lit(h).cast("timestamp")))
          .select(col("o_custkey").as("k"))
          .distinct()
      }
      val a = keys("1995-01-01", Some("1996-01-01")).withColumnRenamed("k", "ak")
      val b = keys("2001-01-01", None).withColumnRenamed("k", "bk")
      a.join(b, col("ak") === col("bk"), "full_outer")
        .select(
          coalesce(col("ak"), col("bk")).as("k"),
          col("ak").isNotNull.as("in_1995"),
          col("bk").isNotNull.as("in_2001"))
    },

    // ---------------------------------------------------------- EXCEPT ALL
    Q(
      "set_except_all_status",
      Some("""
        SELECT o_orderstatus FROM orders WHERE o_totalprice > 100000
        EXCEPT ALL
        SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
      """)) { (spark, dir) =>
      val o = Tables(spark, dir).orders
      o.filter(col("o_totalprice") > 100000)
        .select(col("o_orderstatus"))
        .exceptAll(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderstatus")))
    },

    // ----------------------------------------------------- raw SQL entry
    // The engine's spark.sql surface: TPC-H Q6-shaped revenue forecast over
    // a registered temp view — same text semantics as the DuckDB oracle.
    Q(
      "sql_q6_revenue",
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 25
      """)) { (spark, dir) =>
      Tables(spark, dir).lineitem.createOrReplaceTempView("lineitem_v")
      spark.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM lineitem_v
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 25
      """)
    },

    // Correlated LATERAL subquery with ORDER BY + LIMIT: top-2 customers by
    // balance per nation. Exercises Catalyst's DecorrelateInnerQuery — the
    // correlated limit decorrelates to a partitioned rank, so the plan is
    // the same bounded per-group selection the DataFrame top-k queries use,
    // arrived at from plain SQL. Tie-broken on c_custkey; raw column values
    // pass the hash compare exactly (no arithmetic).
    Q(
      "sql_lateral_topk",
      Some("""
        SELECT n_name, c_custkey, c_acctbal
        FROM nation, LATERAL (
          SELECT c_custkey, c_acctbal FROM customer
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.nation.createOrReplaceTempView("nation_v")
      t.customer.createOrReplaceTempView("customer_v")
      spark.sql("""
        SELECT n_name, c_custkey, c_acctbal
        FROM nation_v JOIN LATERAL (
          SELECT c_custkey, c_acctbal FROM customer_v
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      """)
    },

    // Correlated scalar subquery: each customer's maximal-price order(s).
    // Exercises RewriteCorrelatedScalarSubquery (aggregate-then-join
    // decorrelation). MAX involves no arithmetic, so the equality on raw
    // parquet doubles is engine-exact.
    Q(
      "sql_scalar_subquery",
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
      """)) { (spark, dir) =>
      Tables(spark, dir).orders.createOrReplaceTempView("orders_v")
      spark.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_v o
        WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders_v o2
                              WHERE o2.o_custkey = o.o_custkey)
      """)
    },

    // SQL PIVOT syntax (the parser/analyzer path, distinct from the
    // DataFrame .pivot gate): user-decile cohorts × event types, counts
    // and cent-exact value sums per cell. The oracle replays as manual
    // conditional aggregation — which is also exactly what the pivot
    // plans to (one Aggregate, no join), so the surfaces must agree.
    // Money columns leave the query as DOUBLE (repo convention): the sums
    // are cent-exact in DECIMAL and only the final emit casts, so the
    // driver's value hash sees identical doubles instead of two engines'
    // decimal scales (r09's sole hash-red was this column left DECIMAL).
    Q(
      "sql_pivot_syntax",
      Some("""
        SELECT user_id % 10 AS cohort,
               CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click_n,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase_n,
               CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error_n,
               CAST(ROUND(COALESCE(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END), 0), 2) AS DOUBLE) AS click_v,
               CAST(ROUND(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END), 0), 2) AS DOUBLE) AS purchase_v,
               CAST(ROUND(COALESCE(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END), 0), 2) AS DOUBLE) AS error_v
        FROM events GROUP BY 1
      """)) { (spark, dir) =>
      Tables(spark, dir).events.createOrReplaceTempView("events_pivot_v")
      spark.sql("""
        SELECT cohort,
               COALESCE(click_n, 0)    AS click_n,
               COALESCE(purchase_n, 0) AS purchase_n,
               COALESCE(error_n, 0)    AS error_n,
               CAST(COALESCE(click_v, 0) AS DOUBLE)    AS click_v,
               CAST(COALESCE(purchase_v, 0) AS DOUBLE) AS purchase_v,
               CAST(COALESCE(error_v, 0) AS DOUBLE)    AS error_v
        FROM (
          SELECT * FROM (
            SELECT user_id % 10 AS cohort, event_type, CAST(value AS DECIMAL(18,2)) AS v
            FROM events_pivot_v)
          PIVOT (COUNT(v) AS n, ROUND(SUM(v), 2) AS v
                 FOR event_type IN ('click' AS click, 'purchase' AS purchase, 'error' AS error)))
      """)
    },

    // ANSI FILTER-clause aggregation: per-aggregate predicates in one
    // Aggregate node (plans exactly like the CASE-WHEN form — one pass,
    // partial aggs intact — but states the intent first-class, including
    // on a DISTINCT aggregate, which the CASE spelling can't express
    // without a second aggregation). Empty filter groups emit NULL sums
    // on both engines; counts stay zero. Money through DECIMAL(18,2).
    Q(
      "sql_filtered_agg",
      Some("""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS finished_value,
               COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 150000) AS big_spenders
        FROM orders GROUP BY o_orderpriority
      """)) { (spark, dir) =>
      Tables(spark, dir).orders.createOrReplaceTempView("orders_fagg_v")
      spark.sql("""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS finished_value,
               COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 150000) AS big_spenders
        FROM orders_fagg_v GROUP BY o_orderpriority
      """)
    },

    // Null-aware anti-join: NOT IN over a NULLABLE subquery column is NOT
    // a plain anti-join (one NULL in the list must empty the result —
    // three-valued logic), so Catalyst plans its dedicated null-aware
    // path. The list is null-free at runtime (so the result is non-empty
    // and the compare meaningful) but nullable in schema, which is what
    // forces the null-aware plan. Both engines implement ANSI semantics;
    // raw key/column parity, no arithmetic.
    Q(
      "sql_null_aware_anti",
      Some("""
        SELECT c_custkey, c_nationkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 350000)
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer.createOrReplaceTempView("customer_v")
      t.orders.createOrReplaceTempView("orders_v")
      spark.sql("""
        SELECT c_custkey, c_nationkey FROM customer_v
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_v WHERE o_totalprice > 350000)
      """)
    },

    // Recursive CTE (Spark 4's WITH RECURSIVE / UnionLoop execution): walk
    // each doc_id up the implicit binary tree (node -> node div 2) to the
    // root, then aggregate depth and the exact ancestor-id sum. Iteration
    // count is log2(max id) (~17 at sf0.1) and the working set stays
    // linear in the table — the shape a hierarchy/BOM walk has at scale.
    // Pure integer arithmetic -> engine-exact; only the integer-division
    // spelling differs per dialect (DIV vs //).
    Q(
      "sql_recursive_cte",
      Some("""
        WITH RECURSIVE anc(doc_id, node, depth) AS (
          SELECT doc_id, doc_id, 0 FROM documents
          UNION ALL
          SELECT doc_id, node // 2, depth + 1 FROM anc WHERE node > 0)
        SELECT doc_id, MAX(depth) AS tree_depth,
               CAST(SUM(node) AS BIGINT) AS path_sum
        FROM anc GROUP BY doc_id
      """)) { (spark, dir) =>
      Tables(spark, dir).documents.createOrReplaceTempView("documents_v")
      spark.sql("""
        WITH RECURSIVE anc(doc_id, node, depth) AS (
          SELECT doc_id, doc_id, 0 FROM documents_v
          UNION ALL
          SELECT doc_id, node DIV 2, depth + 1 FROM anc WHERE node > 0)
        SELECT doc_id, MAX(depth) AS tree_depth, SUM(node) AS path_sum
        FROM anc GROUP BY doc_id
      """)
    },

    // ------------------------------------- custom top-k-per-group operator
    // The graft.plans custom physical operator in the correctness gate:
    // same row set as the window formulation (the oracle), executed with
    // bounded heaps + k-per-group shuffle (see TopKPerGroup).
    Q(
      "topk_custom_operator",
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
        WHERE rn <= 2
      """)) { (spark, dir) =>
      graft.operators.TopK
        .perGroup(
          Tables(spark, dir).orders,
          Seq("o_custkey"),
          Seq("o_totalprice" -> false, "o_orderkey" -> true),
          k = 2)
        .select(col("o_custkey"), col("o_orderkey"), asDouble(money(col("o_totalprice"))).as("price"))
    },

    // ----------------------------------------------------- sessionization
    // The batch sessionizer (window lag -> gap flags -> cumulative session
    // ids -> per-session agg) — same semantics as the streaming
    // flatMapGroupsWithState path (cross-checked in StreamingSpec).
    Q(
      "sessionize_events",
      Some("""
        WITH x AS (
          SELECT user_id, ts, value,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          FROM events),
        y AS (
          SELECT user_id, ts, value,
                 SUM(CASE WHEN prev IS NULL OR epoch_ms(ts) - epoch_ms(prev) > 1800000 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
          FROM x)
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               COUNT(*) AS n_events,
               round(SUM(value), 6) AS sum_value
        FROM y GROUP BY user_id, sid
      """)) { (spark, dir) =>
      EventStreams
        .sessionizeBatch(Tables(spark, dir).events.select(col("user_id"), col("ts"), col("value")), gapMinutes = 30)
        .select(
          col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events").cast("long").as("n_events"),
          round(col("sum_value"), 6).as("sum_value"))
    },

    // Native session windows: the BUILT-IN session_window operator (the
    // streaming-capable path with state-store session merging) on the same
    // events — a different engine surface than the lag-islands sessionizer
    // above. Boundary semantics differ from lag-islands by design: a
    // session window is [ts, ts+gap), so an event landing EXACTLY gap
    // after its predecessor starts a NEW session (split at diff >= gap,
    // not > gap) and session_end = last ts + gap; the oracle replays
    // exactly that. Same two-exchange shape: one keyed shuffle into the
    // session assignment, one into the per-session aggregate.
    Q(
      "events_session_window",
      Some("""
        WITH x AS (
          SELECT user_id, ts, value,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          FROM events),
        y AS (
          SELECT user_id, ts, value,
                 SUM(CASE WHEN prev IS NULL OR epoch_ms(ts) - epoch_ms(prev) >= 1800000 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
          FROM x)
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
               COUNT(*) AS n_events,
               round(SUM(value), 6) AS sum_value
        FROM y GROUP BY user_id, sid
      """)) { (spark, dir) =>
      Tables(spark, dir).events
        .select(col("user_id"), col("ts"), col("value"))
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("sum_value"))
        .select(
          col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events").cast("long").as("n_events"),
          col("sum_value"))
    },

    // ------------------------------------------------------- as-of join
    // For every purchase event: the user's most recent STRICTLY PRIOR
    // signup/login time (event-time as-of self-join via one window pass).
    Q(
      "asof_last_signup",
      Some("""
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               strftime(
                 last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 '%Y-%m-%d %H:%M:%S') AS asof_signup
        FROM events
        QUALIFY event_type = 'purchase'
      """)) { (spark, dir) =>
      val e = Tables(spark, dir).events
      e.withColumn(
        "asof_signup_ts",
        AsOfJoin.lastPriorWhere(
          col("event_type") === "signup",
          col("ts"),
          col("user_id"),
          col("ts"),
          col("event_id")))
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id"),
          col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          date_format(col("asof_signup_ts"), "yyyy-MM-dd HH:mm:ss").as("asof_signup"))
    },

    // ------------------------------------------------------ ordered funnel
    // view → click → purchase conversion path per user (operators/Funnel):
    // stage i+1 counts only STRICTLY AFTER the user's stage-i first-reach.
    // The engine folds each user's sorted stage events once; the oracle
    // replays the textbook min-join chain — first view, first click after
    // it, first purchase after that — proving the one-pass fold ≡ the k-join
    // definition.
    // Time-to-convert distribution for fully-converted funnels: exact
    // microsecond deltas between the first-reach view and purchase times
    // (the SAME strictly-after fold as funnel_view_click_purchase), then
    // interpolated percentiles — the agg_percentiles quantile_cont
    // discipline — divided to seconds under round(·, 6).
    Q(
      "funnel_time_to_convert",
      Some("""
        WITH f AS (SELECT user_id, ts, event_type FROM events WHERE event_type IN ('click','purchase','view')),
        v AS (SELECT user_id, MIN(ts) AS t0 FROM f WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT f.user_id, MIN(f.ts) AS t1 FROM f JOIN v ON v.user_id = f.user_id AND f.ts > v.t0
              WHERE f.event_type = 'click' GROUP BY 1),
        p AS (SELECT f.user_id, MIN(f.ts) AS t2 FROM f JOIN c ON c.user_id = f.user_id AND f.ts > c.t1
              WHERE f.event_type = 'purchase' GROUP BY 1),
        d AS (SELECT epoch_us(p.t2) - epoch_us(v.t0) AS delta_us FROM p JOIN v USING (user_id))
        SELECT COUNT(*) AS n_converted,
               round(quantile_cont(delta_us, 0.25) / 1000000.0, 6) AS p25_s,
               round(quantile_cont(delta_us, 0.5) / 1000000.0, 6) AS p50_s,
               round(quantile_cont(delta_us, 0.9) / 1000000.0, 6) AS p90_s
        FROM d
      """)) { (spark, dir) =>
      val fr = Funnel.firstReach(
        Tables(spark, dir).events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      fr.filter(col("n_stages") === 3)
        .select((unix_micros(col("t_purchase")) - unix_micros(col("t_view"))).as("delta_us"))
        .agg(
          count(lit(1)).as("n_converted"),
          round(percentile(col("delta_us"), lit(0.25)) / lit(1000000.0), 6).as("p25_s"),
          round(percentile(col("delta_us"), lit(0.5)) / lit(1000000.0), 6).as("p50_s"),
          round(percentile(col("delta_us"), lit(0.9)) / lit(1000000.0), 6).as("p90_s"))
    },

    Q(
      "funnel_view_click_purchase",
      Some("""
        WITH f AS (SELECT user_id, ts, event_type FROM events WHERE event_type IN ('click','purchase','view')),
        v AS (SELECT user_id, MIN(ts) AS t0 FROM f WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT f.user_id, MIN(f.ts) AS t1 FROM f JOIN v ON v.user_id = f.user_id AND f.ts > v.t0
              WHERE f.event_type = 'click' GROUP BY 1),
        p AS (SELECT f.user_id, MIN(f.ts) AS t2 FROM f JOIN c ON c.user_id = f.user_id AND f.ts > c.t1
              WHERE f.event_type = 'purchase' GROUP BY 1),
        u AS (SELECT DISTINCT user_id FROM f)
        SELECT u.user_id,
               strftime(v.t0, '%Y-%m-%d %H:%M:%S') AS t_view,
               strftime(c.t1, '%Y-%m-%d %H:%M:%S') AS t_click,
               strftime(p.t2, '%Y-%m-%d %H:%M:%S') AS t_purchase,
               CAST(CASE WHEN v.t0 IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN c.t1 IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN p.t2 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS n_stages
        FROM u
        LEFT JOIN v ON v.user_id = u.user_id
        LEFT JOIN c ON c.user_id = u.user_id
        LEFT JOIN p ON p.user_id = u.user_id
      """)) { (spark, dir) =>
      Funnel
        .firstReach(
          Tables(spark, dir).events,
          "user_id",
          "ts",
          "event_type",
          stages = Seq("view", "click", "purchase"))
        .select(
          col("user_id"),
          date_format(col("t_view"), "yyyy-MM-dd HH:mm:ss").as("t_view"),
          date_format(col("t_click"), "yyyy-MM-dd HH:mm:ss").as("t_click"),
          date_format(col("t_purchase"), "yyyy-MM-dd HH:mm:ss").as("t_purchase"),
          col("n_stages"))
    },

    // ------------------------------------------------- cohort retention
    // signup-week cohorts × whole-week activity offsets — the classic
    // retention grid beside the funnel. Exact integers end to end (week
    // truncation + day diffs + distinct counts), no float discipline
    // needed for the oracle hash.
    Q(
      "cohort_retention",
      Some("""
        WITH a AS (SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_start
                   FROM events WHERE event_type = 'signup' GROUP BY 1),
        w AS (SELECT DISTINCT e.user_id, a.cohort_start,
                     date_diff('day', a.cohort_start, date_trunc('week', e.ts)) // 7 AS weeks_since
              FROM events e JOIN a ON a.user_id = e.user_id
              WHERE date_trunc('week', e.ts) >= a.cohort_start)
        SELECT strftime(cohort_start, '%Y-%m-%d') AS cohort_week, weeks_since, COUNT(*) AS n_users
        FROM w GROUP BY 1, 2
      """)) { (spark, dir) =>
      Funnel.cohortRetention(Tables(spark, dir).events, "user_id", "ts", "event_type", anchorType = "signup")
    },

    // --------------------------------------------------------- PageRank
    // Entity importance over the customer→supplier interaction graph
    // (operators/Graph): power iteration, one dst-keyed shuffle per round,
    // eager per-iteration checkpoints. Suppliers are offset out of the
    // customer id space (same as graph_communities) so customer N and
    // supplier N stay distinct nodes. Oracle: the 10 iterations unrolled
    // as chained CTEs with every float literal written as the expression
    // Spark's lit()s fold to, final ranks quantized round(·, 6) (the only
    // cross-engine float freedom left is unordered SUM order — ~1e-15,
    // eight orders below the grid). GraphSpec additionally pins a driver
    // power-iteration reference at 1e-9 and rank-mass conservation.
    Q("graph_pagerank", Some(pageRankOracle)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val edges = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 10000000L).as("dst"))
        .distinct()
      graft.operators.Graph
        .pageRank(edges, "src", "dst", iterations = 10)
        .select(col("id"), round(col("rank"), 6).as("rank"))
    },

    // ------------------------------------------------ LPA communities
    // Deterministic synchronous label propagation over the same
    // interaction graph (suppliers offset out of the customer id space).
    // Oracle: the 4 synchronous rounds unrolled as chained CTEs — LPA is
    // all-integer (histogram + (max n, min label) tie-break), so the
    // compare is exact, no float discipline needed. GraphSpec additionally
    // pins a driver synchronous-LPA reference on random graphs and
    // community separation across a bridge.
    Q("graph_communities", Some(lpaOracle)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val edges = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 10000000L).as("dst"))
        .distinct()
      graft.operators.Graph.labelPropagation(edges, "src", "dst", iterations = 4)
    },

    // --------------------------------------------- Louvain communities
    // The gain-driven upgrade over the LPA frequency vote: bounded-round
    // synchronous Louvain (one aggregation level) with exact-integer
    // modularity-gain comparisons (2m·k_in − k·Σtot in DECIMAL/HUGEINT),
    // smallest-label tie-breaks, and alternating parity classes as the
    // synchronous-swap guard — fully deterministic, so the oracle unrolls
    // all 4 rounds and the labels hash. GraphSpec pins modularity(louvain)
    // ≥ modularity(LPA) on the fixture graphs.
    Q("graph_louvain", Some(louvainOracle)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val edges = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 10000000L).as("dst"))
        .distinct()
      graft.operators.Graph.louvain(edges, "src", "dst", rounds = 4)
    },

    // --------------------------------------- two-level Louvain (full recipe)
    // Blondel 2008's second phase: condense the level-1 communities into
    // supernodes (weight = inter-community edges, self-loop = intra count),
    // rerun the WEIGHTED sweep on the community graph, compose the maps.
    // Level 2 merges what the myopic first sweep couldn't — and runs on a
    // community-space-sized graph, THE scale argument for multi-level
    // detection at 100 TB. Both sweeps + the condensation replay in SQL.
    Q("graph_louvain_two_level", Some(louvainTwoLevelOracle)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val edges = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 10000000L).as("dst"))
        .distinct()
      graft.operators.Graph.louvainTwoLevel(edges, "src", "dst", rounds1 = 4, rounds2 = 4)
    },

    // ----------------------------------- n-level Louvain (recursive recipe)
    // The recursion louvainTwoLevel stops short of: keep condensing and
    // re-sweeping until a level moves nothing (identity labels — the exact
    // fixpoint certificate: condensing over identity reproduces the same
    // graph, and the sweep is deterministic). Every deeper level runs on a
    // geometrically shrinking community graph, so levels 3..n are nearly
    // free while making the coarse merges two levels can't. The oracle
    // unrolls the full 4-level budget — post-convergence levels replay as
    // identities in SQL too, so the early-exited Spark result hashes equal.
    Q("graph_louvain_multilevel", Some(louvainMultilevelOracle)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val edges = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 10000000L).as("dst"))
        .distinct()
      graft.operators.Graph.louvainMultilevel(
        edges, "src", "dst", roundsPerLevel = 4, maxLevels = 4)
    },

    // ------------------------------------------- multi-source BFS levels
    // Reachability blast radius over the undirected interaction graph:
    // level(v) = min hops from any source (customers with id < 50), capped
    // at 4 — the "everything within k hops of these flagged nodes"
    // primitive (contamination spread, abuse-ring expansion). Frontier
    // iteration: one neighbor-keyed shuffle + one visited left_anti per
    // level, frontier-sized both, early exit on an empty frontier. Oracle:
    // a recursive CTE over DISTINCT (id, lvl) states (UNION, so the state
    // set is n·depth-bounded, never path-enumerating), min level per node.
    // All-integer — exact compare.
    Q("graph_bfs_levels", Some(bfsOracle(maxDepth = 4, srcLt = 50))) { (spark, dir) =>
      val t = Tables(spark, dir)
      val edges = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 10000000L).as("dst"))
        .distinct()
      val sources = edges.select(col("src").as("id")).filter(col("id") < 50).distinct()
      graft.operators.Graph.bfsLevels(edges, "src", "dst", sources, maxDepth = 4)
    },

    // --------------------------------------------- HITS hubs/authorities
    // Kleinberg's alternating eigenvector pair over the DIRECTED
    // customer→supplier graph — the bipartite importance measure PageRank
    // can't express (hub customers buy from authoritative suppliers).
    // 8 rounds, L2-normalized per half-step, one dst-keyed shuffle each;
    // oracle unrolls the rounds as CTEs with the identical IEEE op
    // sequence, final round(·, 6) absorbing unordered-SUM ulp order (the
    // proven pagerank envelope).
    Q("graph_hits", Some(hitsOracle(iters = 8))) { (spark, dir) =>
      val t = Tables(spark, dir)
      val edges = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 10000000L).as("dst"))
        .distinct()
      graft.operators.Graph.hits(edges, "src", "dst", iterations = 8, checkpointInterval = 1)
    },

    // ------------------------------------- item-item cosine (co-purchase)
    // commonNeighborPairs' shared counts normalized into the classic
    // item-item collaborative-filtering score: cos = shared/√(deg_a·deg_b)
    // over the SAME hub-capped edge set (so cosine ≤ 1 exactly). Exact
    // ints up to one sqrt; round(·, 6); top-100 on the rounded score with
    // (a, b) tie-break.
    Q(
      "graph_cooccurrence_cosine",
      Some("""
        WITH e AS (SELECT DISTINCT l_suppkey AS l, o_custkey AS r
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        deg AS (SELECT r, COUNT(*) AS deg FROM e GROUP BY r),
        cold AS (SELECT e.l, e.r FROM e JOIN deg USING (r) WHERE deg.deg <= 50),
        ldeg AS (SELECT l, COUNT(*) AS deg FROM cold GROUP BY l),
        p AS (SELECT x.l AS a, y.l AS b, COUNT(*) AS shared
              FROM cold x JOIN cold y ON x.r = y.r AND x.l < y.l
              GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        sc AS (SELECT p.a, p.b, p.shared,
                      round(CAST(p.shared AS DOUBLE) / sqrt(CAST(da.deg AS DOUBLE) * CAST(db.deg AS DOUBLE)), 6) AS cosine
               FROM p JOIN ldeg da ON da.l = p.a JOIN ldeg db ON db.l = p.b)
        SELECT a, b, shared, cosine FROM sc ORDER BY cosine DESC, a, b LIMIT 100
      """)) { (spark, dir) =>
      val t = Tables(spark, dir)
      val edges = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("supp"), col("o_custkey").as("cust"))
      graft.operators.Graph
        .cooccurrenceCosine(edges, "supp", "cust", maxDegree = 50, minShared = 2L)
        .orderBy(col("cosine").desc, col("a"), col("b"))
        .limit(100)
    },

    // ------------------------------------------------- cohort LTV curve
    // Weekly purchase revenue per signup cohort with the cumulative
    // lifetime-value running sum — the payback curve next to
    // cohort_retention. Revenue exact DECIMAL(18,2) through every sum
    // (including the ORDER BY running window — decimal addition is
    // order-free anyway), doubles only at the boundary.
    Q(
      "cohort_ltv",
      Some("""
        WITH a AS (SELECT user_id AS u, MIN(date_trunc('week', ts)) AS cohort_start
                   FROM events WHERE event_type = 'signup' GROUP BY user_id),
        wk AS (SELECT strftime(a.cohort_start, '%Y-%m-%d') AS cohort_week,
                      date_diff('day', a.cohort_start, date_trunc('week', e.ts)) // 7 AS weeks_since,
                      COUNT(DISTINCT e.user_id) AS n_active_users,
                      SUM(CAST(e.value AS DECIMAL(18,2))) AS rev
               FROM events e JOIN a ON a.u = e.user_id
               WHERE e.event_type = 'purchase' AND date_trunc('week', e.ts) >= a.cohort_start
               GROUP BY 1, 2)
        SELECT cohort_week, weeks_since, n_active_users,
               CAST(rev AS DOUBLE) AS revenue,
               CAST(SUM(rev) OVER (PARTITION BY cohort_week ORDER BY weeks_since
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue
        FROM wk
      """)) { (spark, dir) =>
      graft.operators.Funnel.cohortLtv(
        Tables(spark, dir).events, "user_id", "ts", "event_type", "value",
        anchorType = "signup", revenueType = "purchase")
    },

    // ------------------------------------------- A/B two-proportion test
    // Experiment readout: deterministic variant assignment (user_id
    // parity — in production, the hash bucket the assignment service
    // wrote), conversion = heavy purchaser (≥ 15 purchase events — "ever
    // purchased" saturates at 1.0 in this dense fixture, collapsing the
    // pooled variance), and the two-proportion
    // pooled z-statistic — the significance number every experimentation
    // pipeline ships. Counts are exact ints; the z closed form runs in
    // matched double order, round(·, 6). |z| > 1.96 ⇒ 95% significance;
    // the statistic is emitted rather than a p-value (no erf parity
    // across engines — the consumer applies their own threshold).
    Q(
      "events_ab_ztest",
      Some("""
        WITH u AS (SELECT user_id, user_id % 2 AS variant,
                          CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15 THEN 1 ELSE 0 END AS converted
                   FROM events GROUP BY user_id),
        v AS (SELECT variant, COUNT(*) AS n_users, CAST(SUM(converted) AS BIGINT) AS n_converted
              FROM u GROUP BY variant),
        w AS (SELECT MAX(CASE WHEN variant = 0 THEN n_users END) AS na,
                     MAX(CASE WHEN variant = 0 THEN n_converted END) AS xa,
                     MAX(CASE WHEN variant = 1 THEN n_users END) AS nb,
                     MAX(CASE WHEN variant = 1 THEN n_converted END) AS xb
              FROM v),
        z AS (SELECT na, xa, nb, xb,
                     CAST(xa AS DOUBLE) / CAST(na AS DOUBLE) AS pa,
                     CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE) AS pb,
                     CAST(xa + xb AS DOUBLE) / CAST(na + nb AS DOUBLE) AS pp
              FROM w)
        SELECT na, xa, nb, xb,
               round(pa - pb, 6) AS lift,
               CASE WHEN pp > 0.0 AND pp < 1.0
                    THEN round((pa - pb) / sqrt(pp * (1.0 - pp) * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))), 6)
                    ELSE 0.0 END AS z
        FROM z
      """)) { (spark, dir) =>
      val u = Tables(spark, dir).events
        .groupBy(col("user_id"))
        .agg(
          (sum(when(col("event_type") === "purchase", 1).otherwise(0)) >= 15)
            .cast("int").as("converted"))
        .select((col("user_id") % 2).as("variant"), col("converted"))
      val v = u.groupBy(col("variant"))
        .agg(count(lit(1)).as("n_users"), sum(col("converted")).cast("long").as("n_converted"))
      val w = v.agg(
        max(when(col("variant") === 0, col("n_users"))).as("na"),
        max(when(col("variant") === 0, col("n_converted"))).as("xa"),
        max(when(col("variant") === 1, col("n_users"))).as("nb"),
        max(when(col("variant") === 1, col("n_converted"))).as("xb"))
      val pa = col("xa").cast("double") / col("na").cast("double")
      val pb = col("xb").cast("double") / col("nb").cast("double")
      val pp = (col("xa") + col("xb")).cast("double") / (col("na") + col("nb")).cast("double")
      w.select(
        col("na"), col("xa"), col("nb"), col("xb"),
        round(pa - pb, 6).as("lift"),
        when(
          pp > 0.0 && pp < 1.0,
          round(
            (pa - pb) /
              sqrt(pp * (lit(1.0) - pp) *
                (lit(1.0) / col("na").cast("double") + lit(1.0) / col("nb").cast("double"))),
            6)).otherwise(lit(0.0)).as("z"))
    },

    // --------------------------------------- Kaplan-Meier churn survival
    // The censoring-aware survival curve (Kaplan & Meier 1958) naive
    // retention miscounts: users silent > 1 day before observation end
    // churn at their last-event day, the rest are right-censored. Exact
    // integer at-risk/death counts (micros-epoch gap compare); S(t) =
    // exp(running Σ ln((n−d)/n)) where the ORDER BY running sum is a
    // fixed op sequence on both engines; round(·, 6).
    Q(
      "events_kaplan_meier",
      Some("""
        WITH mx AS (SELECT MAX(epoch_us(ts)) AS mxus FROM events),
        obs AS (SELECT datediff('day', DATE '2024-01-01', CAST(last_ts AS DATE)) AS day,
                       CASE WHEN (SELECT mxus FROM mx) - epoch_us(last_ts) > 86400000000 THEN 1 ELSE 0 END AS death
                FROM (SELECT user_id, MAX(ts) AS last_ts FROM events GROUP BY user_id)),
        nt AS (SELECT COUNT(*) AS n_total FROM obs),
        pd AS (SELECT day, CAST(SUM(death) AS BIGINT) AS d, COUNT(*) AS ended FROM obs GROUP BY day),
        wr AS (SELECT day, d,
                      CAST((SELECT n_total FROM nt)
                        - COALESCE(SUM(ended) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
               FROM pd),
        dr AS (SELECT day, n_at_risk, d,
                      SUM(ln(CAST(n_at_risk - d AS DOUBLE) / CAST(n_at_risk AS DOUBLE)))
                        OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_ln
               FROM wr WHERE d > 0)
        SELECT day, n_at_risk, d AS d_churned, round(exp(s_ln), 6) AS survival FROM dr
      """)) { (spark, dir) =>
      graft.operators.Funnel.kaplanMeier(
        Tables(spark, dir).events, "user_id", "ts", baseDate = "2024-01-01", churnGapDays = 1)
    },

    // Log-rank test (Funnel.logRank): do even- and odd-keyed users share
    // one churn curve? The time-to-event A/B test the Kaplan-Meier curve
    // lacks — exact at-risk integers from cumulative windows, grid-9
    // hypergeometric E/V terms in exact decimal sums, fixed-order chi2/z
    // and the shared A&S two-sided p.
    Q(
      "events_logrank",
      Some("""
        WITH mx AS (SELECT MAX(epoch_us(ts)) AS mxus FROM events),
        obs AS (SELECT CAST(user_id % 2 AS VARCHAR) AS g,
                       datediff('day', DATE '2024-01-01', CAST(last_ts AS DATE)) AS t,
                       CASE WHEN (SELECT mxus FROM mx) - epoch_us(last_ts) > 86400000000 THEN 1 ELSE 0 END AS e
                FROM (SELECT user_id, MAX(ts) AS last_ts FROM events GROUP BY user_id)),
        tot AS (SELECT CAST(SUM(CASE WHEN g = '0' THEN 1 ELSE 0 END) AS BIGINT) AS tot1,
                       COUNT(*) AS tot FROM obs),
        pt AS (SELECT t, CAST(SUM(CASE WHEN g = '0' THEN e ELSE 0 END) AS BIGINT) AS d1,
                      CAST(SUM(e) AS BIGINT) AS d,
                      CAST(SUM(CASE WHEN g = '0' THEN 1 ELSE 0 END) AS BIGINT) AS ended1,
                      COUNT(*) AS ended
               FROM obs GROUP BY t),
        risk AS (SELECT t, d1, d,
                        (SELECT tot1 FROM tot)
                          - COALESCE(SUM(ended1) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1t,
                        (SELECT tot FROM tot)
                          - COALESCE(SUM(ended) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nt
                 FROM pt),
        terms AS (SELECT d1, d,
                         CAST(round(CAST(d AS DOUBLE) * (CAST(n1t AS DOUBLE) / CAST(nt AS DOUBLE)), 9) AS DECIMAL(20,9)) AS e1t,
                         CAST(CASE WHEN nt > 1
                              THEN round(CAST(d AS DOUBLE) * (CAST(n1t AS DOUBLE) / CAST(nt AS DOUBLE))
                                         * (1.0 - (CAST(n1t AS DOUBLE) / CAST(nt AS DOUBLE)))
                                         * CAST(nt - d AS DOUBLE) / CAST(nt - 1 AS DOUBLE), 9)
                              ELSE 0.0 END AS DECIMAL(20,9)) AS vt
                  FROM risk WHERE d > 0),
        ag AS (SELECT (SELECT tot1 FROM tot) AS n_1,
                      (SELECT tot - tot1 FROM tot) AS n_2,
                      CAST(SUM(d1) AS BIGINT) AS o_1,
                      CAST(SUM(d) AS BIGINT) AS d_total,
                      CAST(round(SUM(e1t), 6) AS DOUBLE) AS e_1,
                      CAST(round(SUM(vt), 6) AS DOUBLE) AS v
               FROM terms),
        fin AS (SELECT n_1, n_2, o_1, e_1, d_total - o_1 AS o_2,
                       round(CAST(d_total AS DOUBLE) - e_1, 6) AS e_2, v,
                       round(CASE WHEN v > 0
                             THEN (CAST(o_1 AS DOUBLE) - e_1) * (CAST(o_1 AS DOUBLE) - e_1) / v END, 6) AS chi2,
                       round(CASE WHEN v > 0
                             THEN (CAST(o_1 AS DOUBLE) - e_1) / sqrt(v) END, 6) AS z
                FROM ag),
        pv AS (SELECT fin.*, abs(z) / sqrt(2.0) AS x,
                      1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt
               FROM fin)
        SELECT n_1, n_2, o_1, e_1, o_2, e_2, v, chi2, z,
               round(((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
                       - 0.284496736) * tt + 0.254829592) * tt * exp(-x * x), 9) AS p_value,
               round(((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
                       - 0.284496736) * tt + 0.254829592) * tt * exp(-x * x), 9) <= 0.05 AS significant
        FROM pv
      """)) { (spark, dir) =>
      val events = Tables(spark, dir).events
      val mx = events.agg(max(unix_micros(col("ts"))).as("mxus"))
      val obs = events
        .groupBy(col("user_id").as("uid"))
        .agg(max(col("ts")).as("last_ts"))
        .crossJoin(broadcast(mx))
        .select(
          (col("uid") % 2).cast("string").as("g"),
          datediff(to_date(col("last_ts")), to_date(lit("2024-01-01"))).as("t"),
          (col("mxus") - unix_micros(col("last_ts")) > 86400000000L).cast("long").as("e"))
      graft.operators.Funnel.logRank(obs, "g", "t", "e", alphaSig = 0.05)
    },

    // ------------------------------------------------ weighted PageRank
    // Rank distributed proportionally to interaction VOLUME (lineitem
    // counts per customer→supplier pair) instead of uniformly per edge —
    // the importance measure when edges carry counts or money. Same
    // unrolled-CTE oracle discipline as graph_pagerank; round(·, 6).
    Q("graph_weighted_pagerank", Some(weightedPageRankOracle(iters = 10))) { (spark, dir) =>
      val t = Tables(spark, dir)
      val edges = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("src"), (col("l_suppkey") + 10000000L).as("dst"))
        .agg(count(lit(1)).as("w"))
      graft.operators.Graph
        .weightedPageRank(edges, "src", "dst", "w", iterations = 10)
        .select(col("id"), round(col("rank"), 6).as("rank"))
    },

    // --------------------------------------- personalized PageRank (RWR)
    // Random walk with restart from the customer seed set (id < 50):
    // proximity-to-S relevance — the graph-recommendation primitive
    // ("suppliers near what these customers touch"). Same float
    // discipline and unrolled-CTE oracle as graph_pagerank, with teleport
    // and dangling mass landing only on S; round(·, 6).
    Q("graph_personalized_pagerank", Some(pprOracle(iters = 10, srcLt = 50))) { (spark, dir) =>
      val t = Tables(spark, dir)
      val edges = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 10000000L).as("dst"))
        .distinct()
      val sources = edges.select(col("src").as("id")).filter(col("id") < 50).distinct()
      graft.operators.Graph
        .personalizedPageRank(edges, "src", "dst", sources, iterations = 10)
        .select(col("id"), round(col("rank"), 6).as("rank"))
    },

    // --------------------------------------------- connected components
    // Entity consolidation over the undirected interaction graph:
    // component = min node id, via the alternating large-star/small-star
    // fix-point (O(log n) rounds, signature-tested convergence — the same
    // machinery behind dedup_clusters, surfaced as a graph operator).
    // Oracle: 12 unrolled synchronous min-label rounds — ≥ the graph
    // diameter at gate scale, so both sides sit at the same fix-point;
    // all-integer compare. GraphSpec pins ≡ driver union-find on random
    // graphs where diameters are adversarial.
    Q("graph_connected_components", Some(ccOracle(rounds = 12))) { (spark, dir) =>
      val t = Tables(spark, dir)
      val edges = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 10000000L).as("dst"))
        .distinct()
      graft.operators.Graph.connectedComponents(edges, "src", "dst")
    },

    // ------------------------------------------- marketing attribution
    // Last-touch revenue attribution: every purchase credits the most
    // recent preceding view/click channel for the same user (carry-forward
    // via last_value IGNORE NULLS over (ts, event_id) order — fully
    // deterministic); purchases with no prior touch land in 'direct'.
    // One user-keyed window pass, then a channel-sized exact-decimal
    // rollup. The conversion-credit read every growth pipeline runs.
    Q(
      "events_attribution",
      Some("""
        WITH w AS (
          SELECT event_type, value,
                 last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
          FROM events)
        SELECT COALESCE(channel, 'direct') AS channel,
               COUNT(*) AS n_purchases,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
        FROM w WHERE event_type = 'purchase'
        GROUP BY 1
      """)) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val touch = when(col("event_type").isin("view", "click"), col("event_type"))
      Tables(spark, dir).events
        .withColumn(
          "channel",
          last(touch, ignoreNulls = true).over(
            Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
              .rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
        .agg(
          count(lit(1)).as("n_purchases"),
          sum(money(col("value"))).cast("double").as("attributed_value"))
    }
  )

  /** DuckDB oracle for graph_connected_components: `rounds` unrolled
    * synchronous min-label propagations over the symmetrized edge set —
    * label(v) ← min(label(v), min over neighbors) — which reaches the
    * min-id fix-point whenever rounds ≥ diameter. Pure integer compare. */
  /** Unrolled replay of Graph.betweennessSampled over the qty≥45
    * co-purchase graph: forward BFS levels with exact integer σ (NOT
    * EXISTS anti-join against the seen set), then Brandes' backward
    * dependency pass with each contribution snapped to the 1e-9 grid
    * before an exact decimal sum — level-by-level, bit-for-bit. */
  private def betweennessOracle(nSources: Int, maxDepth: Int): String = {
    val fwd = (1 to maxDepth).map { l =>
      s"""f$l AS MATERIALIZED (
        SELECT f.src, d.b AS v, CAST(SUM(f.sigma) AS BIGINT) AS sigma
        FROM f${l - 1} f JOIN dir d ON d.a = f.v
        WHERE NOT EXISTS (SELECT 1 FROM seen${l - 1} s WHERE s.src = f.src AND s.v = d.b)
        GROUP BY 1, 2),
      seen$l AS MATERIALIZED (SELECT * FROM seen${l - 1} UNION ALL SELECT src, v FROM f$l)"""
    }.mkString(",\n")
    val bwd = ((maxDepth - 1) to 0 by -1).map { l =>
      s"""d$l AS MATERIALIZED (
        SELECT f.src, f.v, f.sigma, COALESCE(x.dsum, CAST(0 AS DECIMAL(20,9))) AS delta
        FROM f$l f LEFT JOIN (
          SELECT f2.src AS src, f2.v AS v,
                 CAST(SUM(CAST(round(
                   (CAST(f2.sigma AS DOUBLE) / CAST(ch.sigma AS DOUBLE))
                     * (1.0 + CAST(ch.delta AS DOUBLE)), 9) AS DECIMAL(20,9)))
                   AS DECIMAL(20,9)) AS dsum
          FROM f$l f2 JOIN dir d ON d.a = f2.v
          JOIN d${l + 1} ch ON ch.src = f2.src AND ch.v = d.b
          GROUP BY 1, 2) x ON x.src = f.src AND x.v = f.v)"""
    }.mkString(",\n")
    val unions = (0 to maxDepth).map(l => s"SELECT src, v, delta FROM d$l").mkString(" UNION ALL ")
    s"""
      WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
      e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      dir AS MATERIALIZED (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
      srcs AS (SELECT DISTINCT a AS id FROM dir ORDER BY id LIMIT $nSources),
      f0 AS MATERIALIZED (SELECT id AS src, id AS v, CAST(1 AS BIGINT) AS sigma FROM srcs),
      seen0 AS (SELECT src, v FROM f0),
      $fwd,
      d$maxDepth AS (SELECT src, v, sigma, CAST(0 AS DECIMAL(20,9)) AS delta FROM f$maxDepth),
      $bwd
      SELECT id, betweenness FROM (
        SELECT v AS id, CAST(round(SUM(delta), 6) AS DOUBLE) AS betweenness
        FROM ($unions) WHERE v <> src GROUP BY 1)
      WHERE betweenness > 0
    """
  }

  /** Unrolled BFS replay of Graph.eccentricitySampled — the harmonic
    * forward CTEs with a per-pivot max-level/ball-size rollup. */
  private def eccentricityOracle(nSources: Int, maxDepth: Int): String = {
    val fwd = (1 to maxDepth).map { l =>
      s"""f$l AS MATERIALIZED (
        SELECT DISTINCT f.src, d.b AS v
        FROM f${l - 1} f JOIN dir d ON d.a = f.v
        WHERE NOT EXISTS (SELECT 1 FROM seen${l - 1} s WHERE s.src = f.src AND s.v = d.b)),
      seen$l AS MATERIALIZED (SELECT * FROM seen${l - 1} UNION ALL SELECT src, v FROM f$l)"""
    }.mkString(",\n")
    val unions = (1 to maxDepth)
      .map(l => s"SELECT src, $l AS lvl FROM f$l")
      .mkString(" UNION ALL ")
    s"""
      WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
      e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      dir AS MATERIALIZED (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
      srcs AS (SELECT DISTINCT a AS id FROM dir ORDER BY id LIMIT $nSources),
      f0 AS MATERIALIZED (SELECT id AS src, id AS v FROM srcs),
      seen0 AS (SELECT src, v FROM f0),
      $fwd
      SELECT src AS id, MAX(lvl) AS eccentricity, COUNT(*) AS n_reached
      FROM ($unions) GROUP BY 1
    """
  }

  /** Unrolled BFS replay of Graph.harmonicSampled — the forward half of
    * the betweenness oracle with 1/level decimal-grid contributions. */
  private def harmonicOracle(nSources: Int, maxDepth: Int): String = {
    val fwd = (1 to maxDepth).map { l =>
      s"""f$l AS MATERIALIZED (
        SELECT DISTINCT f.src, d.b AS v
        FROM f${l - 1} f JOIN dir d ON d.a = f.v
        WHERE NOT EXISTS (SELECT 1 FROM seen${l - 1} s WHERE s.src = f.src AND s.v = d.b)),
      seen$l AS MATERIALIZED (SELECT * FROM seen${l - 1} UNION ALL SELECT src, v FROM f$l)"""
    }.mkString(",\n")
    val unions = (1 to maxDepth)
      .map(l => s"SELECT v, CAST(round(1.0 / $l.0, 12) AS DECIMAL(20,12)) AS w FROM f$l")
      .mkString(" UNION ALL ")
    s"""
      WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
      e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      dir AS MATERIALIZED (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
      srcs AS (SELECT DISTINCT a AS id FROM dir ORDER BY id LIMIT $nSources),
      f0 AS MATERIALIZED (SELECT id AS src, id AS v FROM srcs),
      seen0 AS (SELECT src, v FROM f0),
      $fwd
      SELECT v AS id, CAST(round(SUM(w), 6) AS DOUBLE) AS harmonic
      FROM ($unions) GROUP BY 1
    """
  }

  private def ccOracle(rounds: Int): String = {
    val head =
      """WITH raw AS MATERIALIZED (SELECT DISTINCT o_custkey AS a, l_suppkey + 10000000 AS b
                      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      WHERE o_custkey <> l_suppkey + 10000000),
         sym AS MATERIALIZED (SELECT DISTINCT a, b FROM (SELECT a, b FROM raw UNION ALL SELECT b AS a, a AS b FROM raw)),
         c0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS lbl FROM sym)"""
    val its = (1 to rounds)
      .map { k =>
        val p = k - 1
        s"""n$k AS MATERIALIZED (SELECT s.a AS id, MIN(l.lbl) AS nl
                    FROM sym s JOIN c$p l ON s.b = l.id GROUP BY s.a),
            c$k AS MATERIALIZED (SELECT c.id, LEAST(c.lbl, COALESCE(n$k.nl, c.lbl)) AS lbl
                    FROM c$p c LEFT JOIN n$k ON c.id = n$k.id)"""
      }
      .mkString(",\n")
    s"$head,\n$its\nSELECT id, lbl AS component FROM c$rounds"
  }

  /** DuckDB oracle for graph_weighted_pagerank: [[pageRankOracle]] with
    * contributions weighted by w/Σw — tw kept BIGINT on both sides so the
    * rank/tw division is the identical double/int64 op. */
  /** Unrolled parallel-peeling replay of [[graft.operators.Graph.kCore]]:
    * per round, degrees over the live edge set, the sub-k drop set, and a
    * double NOT EXISTS edge filter; `rounds` padded past the observed
    * fixpoint depth. */
  /** Unrolled k-truss replay: per round, triangles from the canonical
    * 3-way join (algorithm-independent — the engine's orientation changes
    * the plan, not the set), each crediting its three edges; edges under
    * k−2 support peel. Fixed rounds on both sides ⇒ equality by
    * construction; post-fixpoint rounds are no-ops. */
  private def kTrussOracle(k: Int, rounds: Int): String = {
    def tri(r: Int) =
      s"""tri$r AS MATERIALIZED (
        SELECT x.a AS u, x.b AS v, y.b AS w
        FROM e$r x JOIN e$r y ON y.a = x.b JOIN e$r z ON z.a = x.a AND z.b = y.b),
      s$r AS MATERIALIZED (
        SELECT a, b, COUNT(*) AS supp FROM (
          SELECT u AS a, v AS b FROM tri$r
          UNION ALL SELECT v, w FROM tri$r
          UNION ALL SELECT u, w FROM tri$r) GROUP BY 1, 2)"""
    val steps = (0 until rounds).map { r =>
      s"""${tri(r)},
      e${r + 1} AS MATERIALIZED (
        SELECT e.a, e.b FROM e$r e JOIN s$r s ON s.a = e.a AND s.b = e.b
        WHERE s.supp >= ${k - 2})"""
    }.mkString(",\n")
    s"""
      WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
      e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      $steps,
      ${tri(rounds)}
      SELECT e.a, e.b, COALESCE(s.supp, 0) AS support
      FROM e$rounds e LEFT JOIN s$rounds s ON s.a = e.a AND s.b = e.b
    """
  }

  /** DuckDB replay of [[graft.operators.TimeSeries.holtWintersFinal]] at
    * period p: the recursive CTE carries (l, b, s1..sp) and walks the
    * identical fixed chain of correctly-rounded double ops (binary-exact
    * α/β/γ), with the seasonal slot resolved by generated CASE arms —
    * bit-for-bit with the Spark fold. */
  private def holtWintersSql(p: Int): String = {
    val sCols = (1 to p).map(k => s"s$k")
    val sInit = sCols.map(_ => "0.0::DOUBLE").mkString(", ")
    def sOld = s"CASE ((s.rn) - 1) % $p " +
      (1 to p).map(k => s"WHEN ${k - 1} THEN h.s$k").mkString(" ") + " END"
    val newL = s"0.25::DOUBLE * (s.v - ($sOld)) + 0.75::DOUBLE * (h.l + h.b)"
    val newB = s"0.125::DOUBLE * (($newL) - h.l) + 0.875::DOUBLE * h.b"
    val newS = s"0.25::DOUBLE * (s.v - ($newL)) + 0.75::DOUBLE * ($sOld)"
    val sUpd = (1 to p)
      .map(k => s"CASE WHEN ((s.rn - 1) % $p) = ${k - 1} THEN ($newS) ELSE h.s$k END")
      .mkString(",\n             ")
    val sNext = s"CASE (c.n % $p) " +
      (1 to p).map(k => s"WHEN ${k - 1} THEN h.s$k").mkString(" ") + " END"
    s"""WITH RECURSIVE dd AS (SELECT event_type AS key, date_trunc('day', ts) AS d, COUNT(*) AS vi
                              FROM events GROUP BY 1, 2),
       seq AS (SELECT key, CAST(vi AS DOUBLE) AS v,
                      row_number() OVER (PARTITION BY key ORDER BY d) AS rn
               FROM dd),
       cnt AS (SELECT key, COUNT(*) AS n FROM seq GROUP BY 1),
       hw(key, rn, l, b, ${sCols.mkString(", ")}) AS (
         SELECT key, rn, v, 0.0::DOUBLE, $sInit FROM seq WHERE rn = 1
         UNION ALL
         SELECT s.key, s.rn, $newL, $newB,
             $sUpd
         FROM hw h JOIN seq s ON s.key = h.key AND s.rn = h.rn + 1)
       SELECT h.key, c.n, ROUND(h.l, 6) AS level, ROUND(h.b, 6) AS trend,
              ROUND($sNext, 6) AS season_next,
              ROUND(h.l + h.b + ($sNext), 6) AS forecast_next
       FROM hw h JOIN cnt c ON c.key = h.key AND h.rn = c.n"""
  }

  private def kCoreOracle(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      val p = r - 1
      s"""dg$r AS (SELECT id, COUNT(*) AS degree FROM (
            SELECT a AS id FROM e$p UNION ALL SELECT b AS id FROM e$p) GROUP BY 1),
        dr$r AS (SELECT id FROM dg$r WHERE degree < $k),
        e$r AS MATERIALIZED (SELECT e.a, e.b FROM e$p e
            WHERE NOT EXISTS (SELECT 1 FROM dr$r x WHERE x.id = e.a)
              AND NOT EXISTS (SELECT 1 FROM dr$r y WHERE y.id = e.b))"""
    }.mkString(",\n")
    s"""
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
    e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    $steps
    SELECT id, CAST(COUNT(*) AS BIGINT) AS core_degree FROM (
      SELECT a AS id FROM e$rounds UNION ALL SELECT b AS id FROM e$rounds) GROUP BY 1"""
  }

  private def weightedPageRankOracle(iters: Int): String = {
    val head =
      """WITH e AS MATERIALIZED (SELECT o_custkey AS src, l_suppkey + 10000000 AS dst, COUNT(*) AS w
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
         nodes AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
         nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
         ow AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) AS tw FROM e GROUP BY src),
         r0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes)"""
    val rounds = (1 to iters)
      .map { k =>
        val p = k - 1
        s"""d$k AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), CAST(0.0 AS DOUBLE)) AS dm
                    FROM r$p r LEFT JOIN ow ON r.id = ow.src WHERE ow.src IS NULL),
            c$k AS MATERIALIZED (SELECT e.dst AS id, SUM(r.rank / o.tw * e.w) AS c
                    FROM e JOIN r$p r ON e.src = r.id JOIN ow o ON e.src = o.src GROUP BY e.dst),
            r$k AS MATERIALIZED (SELECT nodes.id,
                           (CAST(1.0 AS DOUBLE) - 0.85) / (SELECT n FROM nn)
                           + 0.85 * (COALESCE(c$k.c, CAST(0.0 AS DOUBLE)) + (SELECT dm FROM d$k) / (SELECT n FROM nn)) AS rank
                    FROM nodes LEFT JOIN c$k ON nodes.id = c$k.id)"""
      }
      .mkString(",\n")
    s"$head,\n$rounds\nSELECT id, round(rank, 6) AS rank FROM r$iters"
  }

  /** DuckDB oracle for graph_personalized_pagerank: [[pageRankOracle]]'s
    * unrolled power iteration with teleport + dangling mass restricted to
    * the source set — every float literal spelled as the expression
    * Spark's lit()s fold to, round(·, 6) at the end. */
  private def pprOracle(iters: Int, srcLt: Long): String = {
    val head =
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         nodes AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
         srcs AS MATERIALIZED (SELECT id FROM nodes WHERE id < $srcLt),
         ns AS MATERIALIZED (SELECT COUNT(*) AS n FROM srcs),
         ins AS MATERIALIZED (SELECT nodes.id,
                    CASE WHEN s.id IS NOT NULL THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS f
                  FROM nodes LEFT JOIN srcs s ON s.id = nodes.id),
         deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         r0 AS MATERIALIZED (SELECT id, f / (SELECT n FROM ns) AS rank FROM ins)"""
    val rounds = (1 to iters)
      .map { k =>
        val p = k - 1
        s"""d$k AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), CAST(0.0 AS DOUBLE)) AS dm
                    FROM r$p r LEFT JOIN deg ON r.id = deg.src WHERE deg.src IS NULL),
            c$k AS MATERIALIZED (SELECT e.dst AS id, SUM(r.rank / deg.deg) AS c
                    FROM e JOIN r$p r ON e.src = r.id JOIN deg ON e.src = deg.src GROUP BY e.dst),
            r$k AS MATERIALIZED (SELECT ins.id,
                           (CAST(1.0 AS DOUBLE) - 0.85) * ins.f / (SELECT n FROM ns)
                           + 0.85 * (COALESCE(c$k.c, CAST(0.0 AS DOUBLE))
                                     + (SELECT dm FROM d$k) * ins.f / (SELECT n FROM ns)) AS rank
                    FROM ins LEFT JOIN c$k ON ins.id = c$k.id)"""
      }
      .mkString(",\n")
    s"$head,\n$rounds\nSELECT id, round(rank, 6) AS rank FROM r$iters"
  }

  /** DuckDB oracle for graph_bfs_levels: recursive CTE over distinct
    * (id, lvl) states — UNION dedups, so the working set is bounded by
    * n·maxDepth — then MIN(lvl) per reached node. */
  private def bfsOracle(maxDepth: Int, srcLt: Long): String =
    s"""WITH RECURSIVE e AS MATERIALIZED (SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst
                      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       sym AS MATERIALIZED (SELECT DISTINCT a, b FROM (
                SELECT src AS a, dst AS b FROM e WHERE src <> dst
                UNION ALL SELECT dst AS a, src AS b FROM e WHERE src <> dst)),
       walk(id, lvl) AS (
         SELECT DISTINCT src AS id, 0 AS lvl FROM e WHERE src < $srcLt
         UNION
         SELECT s.b AS id, w.lvl + 1 AS lvl
         FROM walk w JOIN sym s ON s.a = w.id WHERE w.lvl < $maxDepth)
       SELECT id, CAST(MIN(lvl) AS INTEGER) AS level FROM walk GROUP BY id"""

  /** DuckDB oracle for graph_hits: the 8 alternating rounds unrolled —
    * a_k = normalize₂(Σ_in h_{k-1}), h_k = normalize₂(Σ_out a_k) — with
    * every literal spelled as the expression Spark's lit()s fold to;
    * nodes missing a side coalesce to 0 at the end, round(·, 6). */
  private def hitsOracle(iters: Int): String = {
    val head =
      """WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         nodes AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
         nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
         h0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS h FROM nodes)"""
    val rounds = (1 to iters)
      .map { k =>
        val p = k - 1
        s"""ar$k AS MATERIALIZED (SELECT e.dst AS id, SUM(h.h) AS ar
                    FROM e JOIN h$p h ON e.src = h.id GROUP BY e.dst),
            an$k AS MATERIALIZED (SELECT sqrt(SUM(ar * ar)) AS an FROM ar$k),
            a$k AS MATERIALIZED (SELECT id, ar / (SELECT an FROM an$k) AS a FROM ar$k),
            hr$k AS MATERIALIZED (SELECT e.src AS id, SUM(a.a) AS hr
                    FROM e JOIN a$k a ON e.dst = a.id GROUP BY e.src),
            hn$k AS MATERIALIZED (SELECT sqrt(SUM(hr * hr)) AS hn FROM hr$k),
            h$k AS MATERIALIZED (SELECT id, hr / (SELECT hn FROM hn$k) AS h FROM hr$k)"""
      }
      .mkString(",\n")
    s"""$head,
       $rounds
       SELECT nodes.id,
              round(COALESCE(h$iters.h, CAST(0.0 AS DOUBLE)), 6) AS hub,
              round(COALESCE(a$iters.a, CAST(0.0 AS DOUBLE)), 6) AS authority
       FROM nodes LEFT JOIN h$iters ON nodes.id = h$iters.id
                  LEFT JOIN a$iters ON nodes.id = a$iters.id"""
  }

  /** DuckDB oracle for graph_pagerank: the power iteration unrolled —
    * r0 = 1/N, then per round k: dangling mass d_k (rank with no
    * out-edges), contributions c_k (dst-grouped Σ rank/deg), and
    * r_k = (1−d)/N + d·(c + dm/N). Float literals are spelled as the
    * exact expressions [[graft.operators.Graph.pageRank]]'s lit()s fold
    * to, so both engines run the identical IEEE op sequence; the final
    * round(·, 6) absorbs unordered-SUM ulp drift. */
  private def pageRankOracle: String = {
    val iters = 10
    val head =
      """WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         nodes AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
         nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
         deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         r0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes)"""
    val rounds = (1 to iters)
      .map { k =>
        val p = k - 1
        s"""d$k AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), CAST(0.0 AS DOUBLE)) AS dm
                    FROM r$p r LEFT JOIN deg ON r.id = deg.src WHERE deg.src IS NULL),
            c$k AS MATERIALIZED (SELECT e.dst AS id, SUM(r.rank / deg.deg) AS c
                    FROM e JOIN r$p r ON e.src = r.id JOIN deg ON e.src = deg.src GROUP BY e.dst),
            r$k AS MATERIALIZED (SELECT nodes.id,
                           (CAST(1.0 AS DOUBLE) - 0.85) / (SELECT n FROM nn)
                           + 0.85 * (COALESCE(c$k.c, CAST(0.0 AS DOUBLE)) + (SELECT dm FROM d$k) / (SELECT n FROM nn)) AS rank
                    FROM nodes LEFT JOIN c$k ON nodes.id = c$k.id)"""
      }
      .mkString(",\n")
    s"$head,\n$rounds\nSELECT id, round(rank, 6) AS rank FROM r$iters"
  }

  /** DuckDB oracle for graph_communities: synchronous LPA unrolled —
    * labels start as node ids; each round every node adopts the most
    * frequent neighbor label, ties toward the smallest (ROW_NUMBER over
    * (n DESC, label ASC) ≡ the operator's min_by(label, (−n, label))).
    * Pure integer arithmetic end to end. */
  private def lpaOracle: String = {
    val iters = 4
    val head =
      """WITH raw AS MATERIALIZED (SELECT o_custkey AS a, l_suppkey + 10000000 AS b
                      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      WHERE o_custkey <> l_suppkey + 10000000),
         sym AS MATERIALIZED (SELECT DISTINCT a, b FROM (SELECT a, b FROM raw UNION ALL SELECT b AS a, a AS b FROM raw)),
         l0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS label FROM sym)"""
    val rounds = (1 to iters)
      .map { k =>
        val p = k - 1
        s"""h$k AS MATERIALIZED (SELECT s.a, l.label, COUNT(*) AS n
                    FROM sym s JOIN l$p l ON s.b = l.id GROUP BY s.a, l.label),
            l$k AS MATERIALIZED (SELECT a AS id, label FROM (
                      SELECT a, label, ROW_NUMBER() OVER (PARTITION BY a ORDER BY n DESC, label ASC) AS rk
                      FROM h$k)
                    WHERE rk = 1)"""
      }
      .mkString(",\n")
    s"$head,\n$rounds\nSELECT id, label FROM l$iters"
  }

  /** DuckDB oracle for graph_louvain: the bounded-round synchronous sweep
    * unrolled — per round, community degree sums (tot), per-node
    * neighbor-community edge counts (kin), the INTEGER gain comparison in
    * HUGEINT (2m·kin − k·tot vs staying with the node's own k removed),
    * best candidate via ROW_NUMBER (s DESC, c ASC) ≡ the operator's
    * min_by((−s, c)), applied only on strict improvement AND the round's
    * parity class. Integer end to end — exact compare. */
  private def louvainOracle: String = {
    val rounds = 4
    val head =
      """WITH e0 AS MATERIALIZED (SELECT DISTINCT o_custkey AS a, l_suppkey + 10000000 AS b
                      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         und AS MATERIALIZED (SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b FROM e0 WHERE a <> b),
         sym AS MATERIALIZED (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
         deg AS MATERIALIZED (SELECT a AS id, COUNT(*) AS k FROM sym GROUP BY 1),
         mm AS (SELECT COUNT(*) AS m FROM und),
         l0 AS MATERIALIZED (SELECT id, id AS c FROM deg)"""
    val body = (1 to rounds)
      .map { k =>
        val p = k - 1
        s"""t$k AS MATERIALIZED (SELECT l.c, SUM(d.k) AS tot FROM l$p l JOIN deg d USING (id) GROUP BY l.c),
            ki$k AS MATERIALIZED (SELECT s.a AS id, l.c, COUNT(*) AS kin
                     FROM sym s JOIN l$p l ON l.id = s.b GROUP BY 1, 2),
            base$k AS MATERIALIZED (SELECT l.id, l.c AS cu, d.k,
                       2 * (SELECT m FROM mm)::HUGEINT * COALESCE(ki.kin, 0)
                         - CAST(d.k AS HUGEINT) * (t.tot - d.k) AS s_stay
                     FROM l$p l JOIN deg d USING (id)
                     JOIN t$k t ON t.c = l.c
                     LEFT JOIN ki$k ki ON ki.id = l.id AND ki.c = l.c),
            cand$k AS (SELECT ki.id, ki.c,
                       2 * (SELECT m FROM mm)::HUGEINT * ki.kin
                         - CAST(b.k AS HUGEINT) * t.tot AS s
                     FROM ki$k ki JOIN base$k b USING (id) JOIN t$k t ON t.c = ki.c
                     WHERE ki.c <> b.cu),
            best$k AS (SELECT id, c, s FROM (
                       SELECT id, c, s, ROW_NUMBER() OVER (PARTITION BY id ORDER BY s DESC, c ASC) AS rk
                       FROM cand$k) WHERE rk = 1),
            l$k AS MATERIALIZED (SELECT b.id,
                       CASE WHEN bs.id IS NOT NULL AND bs.s > b.s_stay AND b.id % 2 = $k % 2
                            THEN bs.c ELSE b.cu END AS c
                     FROM base$k b LEFT JOIN best$k bs USING (id))"""
      }
      .mkString(",\n")
    s"$head,\n$body\nSELECT id, c AS community FROM l$rounds"
  }

  /** One weighted Louvain round as CTEs, parameterized by level prefix —
    * the generic form of the louvainOracle round (kin/degree/m are
    * weighted SUMs instead of counts; identical arithmetic at w = 1). */
  private def louvainRoundSql(p: String, k: Int): String = {
    val prev = s"l$p${k - 1}"
    s"""t$p$k AS MATERIALIZED (SELECT l.c, CAST(SUM(d.k) AS BIGINT) AS tot
                 FROM $prev l JOIN deg$p d USING (id) GROUP BY l.c),
        ki$p$k AS MATERIALIZED (SELECT s.a AS id, l.c, CAST(SUM(s.w) AS BIGINT) AS kin
                 FROM sym$p s JOIN $prev l ON l.id = s.b GROUP BY 1, 2),
        base$p$k AS MATERIALIZED (SELECT l.id, l.c AS cu, d.k,
                   2 * (SELECT m FROM mm$p)::HUGEINT * COALESCE(ki.kin, 0)
                     - CAST(d.k AS HUGEINT) * (t.tot - d.k) AS s_stay
                 FROM $prev l JOIN deg$p d USING (id)
                 JOIN t$p$k t ON t.c = l.c
                 LEFT JOIN ki$p$k ki ON ki.id = l.id AND ki.c = l.c),
        cand$p$k AS (SELECT ki.id, ki.c,
                   2 * (SELECT m FROM mm$p)::HUGEINT * ki.kin
                     - CAST(b.k AS HUGEINT) * t.tot AS s
                 FROM ki$p$k ki JOIN base$p$k b USING (id) JOIN t$p$k t ON t.c = ki.c
                 WHERE ki.c <> b.cu),
        best$p$k AS (SELECT id, c, s FROM (
                   SELECT id, c, s, ROW_NUMBER() OVER (PARTITION BY id ORDER BY s DESC, c ASC) AS rk
                   FROM cand$p$k) WHERE rk = 1),
        l$p$k AS MATERIALIZED (SELECT b.id,
                   CASE WHEN bs.id IS NOT NULL AND bs.s > b.s_stay AND b.id % 2 = $k % 2
                        THEN bs.c ELSE b.cu END AS c
                 FROM base$p$k b LEFT JOIN best$p$k bs USING (id))"""
  }

  /** DuckDB oracle for graph_louvain_two_level: level-1 sweep (weighted
    * form at w = 1 — identical arithmetic to louvainOracle), condensation
    * to the community graph (weight = inter-community edge count,
    * self-loop = intra count, degrees get 2x self-loop, m includes
    * self-loops), level-2 weighted sweep, label composition. */
  private def louvainTwoLevelOracle: String = {
    val r1 = 4; val r2 = 4
    val head =
      """WITH e0 AS MATERIALIZED (SELECT DISTINCT o_custkey AS a, l_suppkey + 10000000 AS b
                      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         und AS MATERIALIZED (SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b FROM e0 WHERE a <> b),
         symA AS MATERIALIZED (SELECT a, b, CAST(1 AS BIGINT) AS w FROM und
                   UNION ALL SELECT b, a, CAST(1 AS BIGINT) FROM und),
         degA AS MATERIALIZED (SELECT a AS id, CAST(SUM(w) AS BIGINT) AS k FROM symA GROUP BY 1),
         mmA AS (SELECT COUNT(*) AS m FROM und),
         lA0 AS MATERIALIZED (SELECT id, id AS c FROM degA)"""
    val level1 = (1 to r1).map(louvainRoundSql("A", _)).mkString(",\n")
    val bridge =
      s"""ce AS MATERIALIZED (SELECT LEAST(la.c, lb.c) AS a, GREATEST(la.c, lb.c) AS b, COUNT(*) AS w
                 FROM und JOIN lA$r1 la ON la.id = und.a JOIN lA$r1 lb ON lb.id = und.b
                 GROUP BY 1, 2),
         symB AS MATERIALIZED (SELECT a, b, CAST(w AS BIGINT) AS w FROM ce WHERE a <> b
                   UNION ALL SELECT b, a, CAST(w AS BIGINT) FROM ce WHERE a <> b),
         degB AS MATERIALIZED (SELECT id, CAST(SUM(k) AS BIGINT) AS k FROM (
                   SELECT a AS id, CAST(SUM(w) AS BIGINT) AS k FROM symB GROUP BY 1
                   UNION ALL
                   SELECT a AS id, CAST(2 * w AS BIGINT) FROM ce WHERE a = b) GROUP BY 1),
         mmB AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM ce),
         lB0 AS MATERIALIZED (SELECT id, id AS c FROM degB)"""
    val level2 = (1 to r2).map(louvainRoundSql("B", _)).mkString(",\n")
    s"""$head,
       $level1,
       $bridge,
       $level2
       SELECT l1.id, COALESCE(l2.c, l1.c) AS community
       FROM lA$r1 l1 LEFT JOIN lB$r2 l2 ON l2.id = l1.c"""
  }

  /** DuckDB oracle for graph_louvain_multilevel: the full 4-level budget
    * unrolled — level 1 (weighted rounds at w = 1 over the canonical simple
    * edges), then for each deeper level the generic bridge (condense the
    * previous level's weighted edge set over its final labels; self-loops
    * on the diagonal, degrees get 2× self-loop weight, m includes
    * self-loops), 4 more weighted rounds, and the operator's ACCEPTANCE
    * GATE replayed exactly: a level counts only if its partition strictly
    * raises the HUGEINT modularity numerator Σ_c(2m·A_in − Σtot²) over the
    * level's input (identity) partition, and acceptance is prefix-chained
    * (a rejected level stops the recursion, so deeper unrolled levels are
    * gated off no matter what they compute). Composition walks the label
    * maps down from the deepest ACCEPTED level. */
  private def louvainMultilevelOracle: String = {
    val rounds   = 4
    val prefixes = Seq("A", "B", "C", "D") // 4 levels
    val head =
      """WITH e0 AS MATERIALIZED (SELECT DISTINCT o_custkey AS a, l_suppkey + 10000000 AS b
                      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         und AS MATERIALIZED (SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b FROM e0 WHERE a <> b),
         ceA AS MATERIALIZED (SELECT a, b, CAST(1 AS BIGINT) AS w FROM und),
         symA AS MATERIALIZED (SELECT a, b, w FROM ceA UNION ALL SELECT b, a, w FROM ceA),
         degA AS MATERIALIZED (SELECT a AS id, CAST(SUM(w) AS BIGINT) AS k FROM symA GROUP BY 1),
         mmA AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM ceA),
         lA0 AS MATERIALIZED (SELECT id, id AS c FROM degA)"""
    def bridge(p: String, q: String): String =
      s"""ce$q AS MATERIALIZED (SELECT LEAST(la.c, lb.c) AS a, GREATEST(la.c, lb.c) AS b,
                   CAST(SUM(e.w) AS BIGINT) AS w
                 FROM ce$p e JOIN l$p$rounds la ON la.id = e.a JOIN l$p$rounds lb ON lb.id = e.b
                 GROUP BY 1, 2),
         sym$q AS MATERIALIZED (SELECT a, b, w FROM ce$q WHERE a <> b
                   UNION ALL SELECT b, a, w FROM ce$q WHERE a <> b),
         deg$q AS MATERIALIZED (SELECT id, CAST(SUM(k) AS BIGINT) AS k FROM (
                   SELECT a AS id, CAST(SUM(w) AS BIGINT) AS k FROM sym$q GROUP BY 1
                   UNION ALL
                   SELECT a AS id, CAST(2 * w AS BIGINT) FROM ce$q WHERE a = b) GROUP BY 1),
         mm$q AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM ce$q),
         l${q}0 AS MATERIALIZED (SELECT id, id AS c FROM deg$q)"""
    // the acceptance gate: HUGEINT Σ_c(2m·A_in(c) − Σtot(c)²) for the
    // level's FINAL partition (qa) vs its input identity partition (qb =
    // per node: 2m·2·selfloop − k²), prefix-chained into ok$q
    def gate(q: String, prevOk: Option[String]): String = {
      val chain = prevOk.map(p => s"(SELECT ok FROM ok$p) AND ").getOrElse("")
      s"""qb$q AS (SELECT SUM(2 * (SELECT m FROM mm$q)::HUGEINT * COALESCE(sw.ain, 0)
                        - CAST(d.k AS HUGEINT) * d.k) AS v
                 FROM deg$q d LEFT JOIN (SELECT a AS id, 2 * SUM(w) AS ain
                                         FROM ce$q WHERE a = b GROUP BY 1) sw ON sw.id = d.id),
         qa$q AS (SELECT SUM(2 * (SELECT m FROM mm$q)::HUGEINT * COALESCE(ai.ain, 0)
                        - t.tot * t.tot) AS v
                 FROM (SELECT l.c, CAST(SUM(d.k) AS HUGEINT) AS tot
                       FROM l$q$rounds l JOIN deg$q d USING (id) GROUP BY l.c) t
                 LEFT JOIN (SELECT la.c, 2 * CAST(SUM(e.w) AS HUGEINT) AS ain
                            FROM ce$q e JOIN l$q$rounds la ON la.id = e.a
                                        JOIN l$q$rounds lb ON lb.id = e.b
                            WHERE la.c = lb.c GROUP BY la.c) ai ON ai.c = t.c),
         ok$q AS (SELECT $chain((SELECT v FROM qa$q) > (SELECT v FROM qb$q)) AS ok)"""
    }
    val levels = prefixes.zipWithIndex.map { case (p, i) =>
      val sweep = (1 to rounds).map(louvainRoundSql(p, _)).mkString(",\n")
      if (i == 0) sweep
      else {
        val prevOk = if (i >= 2) Some(prefixes(i - 1)) else None
        s"${bridge(prefixes(i - 1), p)},\n$sweep,\n${gate(p, prevOk)}"
      }
    }.mkString(",\n")
    s"""$head,
       $levels
       SELECT la.id,
              CASE WHEN (SELECT ok FROM okD) THEN ld.c
                   WHEN (SELECT ok FROM okC) THEN lc.c
                   WHEN (SELECT ok FROM okB) THEN lb.c
                   ELSE la.c END AS community
       FROM lA$rounds la
       LEFT JOIN lB$rounds lb ON lb.id = la.c
       LEFT JOIN lC$rounds lc ON lc.id = lb.c
       LEFT JOIN lD$rounds ld ON ld.id = lc.c"""
  }
}
