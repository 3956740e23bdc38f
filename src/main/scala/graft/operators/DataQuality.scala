package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the validation pass a training-data
  * pipeline runs before ingestion. Each rule is a predicate evaluated in ONE
  * scan (conditional aggregation, map-side combined): no per-rule jobs, no
  * driver loops, any number of rules at the cost of one pass.
  */
object DataQuality {

  final case class Rule(name: String, violation: Column)

  def notNull(c: String): Rule             = Rule(s"${c}_not_null", col(c).isNull)
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"${c}_in_range", col(c) < lo || col(c) > hi)
  def matches(c: String, regex: String): Rule =
    Rule(s"${c}_matches", !col(c).rlike(regex))
  def positive(c: String): Rule            = Rule(s"${c}_positive", col(c) <= 0)

  /** One row per rule: (rule, n_violations, n_rows, violation_rate). */
  def profile(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty)
    val aggs = rules.map(r => sum(when(r.violation, 1L).otherwise(0L)).as(r.name)) :+
      count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into (rule, n_violations)
    val entries = rules.map(r => struct(lit(r.name).as("rule"), col(r.name).as("n_violations")))
    wide
      .select(col("__n"), explode(array(entries: _*)).as("e"))
      .select(
        col("e.rule").as("rule"),
        col("e.n_violations").as("n_violations"),
        col("__n").as("n_rows"),
        (col("e.n_violations").cast("double") / col("__n")).as("violation_rate"))
  }

  /** Quantile bucketization — the standard feature-discretization step
    * (Spark ML's QuantileDiscretizer shape, made exact and reproducible):
    * cut points are EXACT interpolated percentiles at `probabilities`
    * (one aggregate pass; the driver collect is #boundaries doubles),
    * rounded to `scale` decimals so an external checker lands on the
    * bit-identical boundaries, then every non-null row is assigned
    * bin i = first boundary with value ≤ bᵢ (bin = #boundaries when
    * above all) by a narrow literal CASE chain riding a second scan.
    * Output: one row per occupied bin, (bin, n_rows).
    *
    * Exactness note: rounding the BOUNDARY (never the data) keeps the
    * `v <= b` predicate deterministic across engines — both sides agree
    * on b after round(·, scale), so percentile interpolation's last-ulp
    * freedom is absorbed before any comparison happens. */
  def quantileBucketize(
      df: DataFrame,
      valueCol: String,
      probabilities: Seq[Double],
      scale: Int = 4): DataFrame = {
    require(probabilities.nonEmpty, "need at least one boundary probability")
    require(probabilities.forall(p => p > 0.0 && p < 1.0), "probabilities must be in (0,1)")
    require(probabilities == probabilities.sorted, "probabilities must be ascending")
    // both passes touch ONLY the value column — project it out before the
    // spread so the scan prunes and any shuffle carries one double per row;
    // exact percentiles buffer every value per partial-agg task, so spread
    // an under-split source for parallel buffer build
    // (Corpus.spreadSmallInput is a no-op on a well-split corpus)
    val spread = Corpus.spreadSmallInput(df.select(col(valueCol)), col(valueCol))
    // ONE percentile buffer for all cut points (the array form), not one
    // full value buffer per probability; rounding happens driver-side with
    // the same HALF_UP arithmetic Spark's round() uses, so the boundaries
    // are identical to a SQL round(percentile, scale)
    val row = spread
      .agg(percentile(col(valueCol), lit(probabilities.toArray)).as("bs"))
      .head()
    val bounds = row.getSeq[Double](0).map(b =>
      java.math.BigDecimal.valueOf(b).setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue)
    val v = col(valueCol).cast("double")
    val bin = bounds.zipWithIndex.foldRight(lit(bounds.length): Column) {
      case ((b, i), acc) => when(v <= lit(b), lit(i)).otherwise(acc)
    }
    spread
      .filter(v.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** Population stability index (PSI) drift between a reference slice and a
    * current slice of the same feature — the standard "did this feature's
    * distribution move since the model was trained" monitor every serving
    * pipeline runs. Bins come from the REFERENCE deciles (exact
    * interpolated percentiles rounded HALF_UP to `scale`, the
    * [[quantileBucketize]] determinism discipline), both slices are counted
    * into that fixed grid, proportions are clamped at `minP` (the standard
    * empty-bin smoothing — PSI's log explodes at 0), and each bin emits its
    * (p_cur − p_ref)·ln(p_cur/p_ref) contribution rounded to 6 (absorbing
    * ln's cross-engine last-ulp freedom). Σ psi_term is the headline PSI
    * (< 0.1 stable, > 0.25 action); the per-bin grid is the diagnosis.
    *
    * Scale shape: one percentile pass over ref (boundary collect is
    * `bins−1` doubles), one conditional-aggregation scan per slice, and a
    * bins-sized grid join — no shuffle wider than the bin grid. */
  def psiDrift(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      bins: Int = 10,
      scale: Int = 4,
      minP: Double = 1e-6): DataFrame = {
    require(bins >= 2, s"need at least 2 bins: $bins")
    val probs = (1 until bins).map(_.toDouble / bins)
    val row = Corpus.spreadSmallInput(ref.select(col(valueCol)), col(valueCol))
      .agg(percentile(col(valueCol).cast("double"), lit(probs.toArray)).as("bs"))
      .head()
    val bounds = row.getSeq[Double](0).map(b =>
      java.math.BigDecimal.valueOf(b).setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue)
    val v = col(valueCol).cast("double")
    val bin = bounds.zipWithIndex.foldRight(lit(bins - 1): Column) {
      case ((b, i), acc) => when(v <= lit(b), lit(i)).otherwise(acc)
    }
    def binCounts(df: DataFrame, as: String): DataFrame =
      df.filter(v.isNotNull).groupBy(bin.as("bin")).agg(count(lit(1)).as(as))
    val spark = ref.sparkSession
    val grid = spark.range(bins).select(col("id").cast("int").as("bin"))
    val counts = grid
      .join(binCounts(ref, "nr"), Seq("bin"), "left")
      .join(binCounts(cur, "nc"), Seq("bin"), "left")
      .select(
        col("bin"),
        coalesce(col("nr"), lit(0L)).as("n_ref"),
        coalesce(col("nc"), lit(0L)).as("n_cur"))
    val totals = counts.agg(sum(col("n_ref")).as("tr"), sum(col("n_cur")).as("tc"))
    val pr = greatest(col("n_ref").cast("double") / col("tr"), lit(minP))
    val pc = greatest(col("n_cur").cast("double") / col("tc"), lit(minP))
    counts
      .crossJoin(broadcast(totals))
      .select(
        col("bin"),
        col("n_ref"),
        col("n_cur"),
        round((pc - pr) * log(pc / pr), 6).as("psi_term"))
  }

  /** Chi-square homogeneity drift over a CATEGORICAL column: observed
    * ref/cur counts per category vs expectations from the pooled
    * proportion — the companion to [[psiDrift]] for discrete features
    * (event types, sources, languages). Emits per-category contribution
    * rows ((o−e)²/e summed over both slices, rounded to 6 — the
    * cross-category total is the χ² statistic with (k−1) d.o.f., and
    * keeping the sum OUT of the query sidesteps double-sum order
    * dependence); categories absent from one slice count as observed 0,
    * exactly what the test expects. One aggregation per slice, full-outer
    * on the category-sized grid. */
  def chiSquareDrift(ref: DataFrame, cur: DataFrame, keyCol: String): DataFrame = {
    val or = ref.groupBy(col(keyCol)).agg(count(lit(1)).as("nr"))
    val oc = cur.groupBy(col(keyCol)).agg(count(lit(1)).as("nc"))
    val grid = or.join(oc, Seq(keyCol), "full_outer")
      .select(
        col(keyCol),
        coalesce(col("nr"), lit(0L)).as("n_ref"),
        coalesce(col("nc"), lit(0L)).as("n_cur"))
    val totals = grid.agg(sum(col("n_ref")).as("tr"), sum(col("n_cur")).as("tc"))
    val p  = (col("n_ref") + col("n_cur")).cast("double") / (col("tr") + col("tc"))
    val er = p * col("tr")
    val ec = p * col("tc")
    grid
      .crossJoin(broadcast(totals))
      .select(
        col(keyCol),
        col("n_ref"),
        col("n_cur"),
        round(
          (col("n_ref") - er) * (col("n_ref") - er) / er +
            (col("n_cur") - ec) * (col("n_cur") - ec) / ec,
          6).as("chi2_term"))
  }

  /** Uniqueness check (needs its own shuffle, unlike row-local rules):
    * key combinations appearing more than once. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Referential-integrity audit: for each declared FK relation
    * (child.childKey → parent.parentKey), how many child rows have no
    * parent — the silent-join-loss check run before trusting any
    * derived table (an orphaned FK turns every inner join downstream
    * into row loss). One left_anti per relation (null child keys count
    * as orphans — they too vanish from inner joins); parents are
    * typically dimension-sized, so the anti-joins broadcast. Returns
    * (relation, n_child_rows, n_orphans). */
  def referentialIntegrity(
      relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(relations.nonEmpty, "need at least one FK relation")
    relations.map { case (name, child, childKey, parent, parentKey) =>
      val orphans = child
        .select(col(childKey).as("ck"))
        .join(parent.select(col(parentKey).as("pk")), col("ck") <=> col("pk"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      child.agg(count(lit(1)).as("n_child_rows"))
        .crossJoin(orphans)
        .select(lit(name).as("relation"), col("n_child_rows"), col("n_orphans"))
    }.reduce(_ unionByName _)
  }

  /** Primary-key uniqueness audit over declared (table, keys) pairs:
    * (table_name, n_rows, n_distinct_keys, n_dup_rows) — n_dup_rows is
    * the count of rows carrying a key that appears more than once (the
    * rows an accidental re-ingest doubled), not the number of offending
    * keys; [[duplicateKeys]] lists the keys themselves. One count-distinct
    * aggregation per table. */
  def uniquenessAudit(tables: Seq[(String, DataFrame, Seq[String])]): DataFrame = {
    require(tables.nonEmpty, "need at least one table")
    tables.map { case (name, df, keys) =>
      val kc = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      kc.agg(
          sum(col("n")).cast("long").as("n_rows"),
          count(lit(1)).as("n_distinct_keys"),
          coalesce(sum(when(col("n") > 1, col("n"))), lit(0L)).cast("long").as("n_dup_rows"))
        .select(lit(name).as("table_name"), col("n_rows"), col("n_distinct_keys"), col("n_dup_rows"))
    }.reduce(_ unionByName _)
  }

  /** Join-key skew audit — the pre-join diagnosis that decides SALTING vs
    * AQE-skew-join vs plain shuffle at scale: hot-key counts, each key's
    * share of the table, and the table-level skew factor max/avg (a
    * uniform key distribution scores 1.0; the score IS the multiplier on
    * the slowest shuffle partition if this column becomes a join key, the
    * straggler that decides a 100 TB join's wall clock). One map-side
    * partial-aggregated key count, one 1-row stats aggregate broadcast
    * back, a bounded top-k heap (TakeOrderedAndProject via sort-limit on
    * the key-distinct frame) — never a full sort. Total order (cnt desc,
    * key asc) so the cut is deterministic; exact integers with one
    * rounded division per derived column. */
  def joinKeySkew(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val g = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val t = g.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).cast("long").as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    g.orderBy(col("cnt").desc, col("key").asc)
      .limit(topK)
      .crossJoin(broadcast(t))
      .select(
        col("key"),
        col("cnt"),
        round(col("cnt").cast("double") / col("n_rows"), 6).as("share"),
        col("n_keys"),
        col("n_rows"),
        round(col("max_cnt").cast("double") * col("n_keys") / col("n_rows"), 6).as("skew_factor"))
  }

  /** Record-linkage BLOCKING-QUALITY audit — the metric pair (Christen
    * 2012) that decides whether a blocking key is usable BEFORE the
    * quadratic pair explosion runs: `reduction_ratio` = 1 −
    * candidate_pairs / full_pairs (how much of the n² cross product the
    * blocking avoids; usable schemes sit above 0.99) and the hot-block
    * table (the biggest blocks carry the quadratic cost — a 10⁶-record
    * block means 5·10¹¹ comparisons no matter how good the ratio looks).
    * One map-side-combined block count; everything after is block-table
    * sized with a bounded top-k cut, (pairs desc, key asc) total order.
    *
    * Pair counts are BIGINT with integer `div 2`: exact up to ~4.3e9
    * records / 3e9-row blocks — far beyond any blocking scheme worth
    * auditing (a block that size IS the audit's finding); a deployment
    * auditing past that upgrades the two products to DECIMAL(38,0), the
    * established quadratic-product hygiene. */
  def blockingAudit(df: DataFrame, blockKey: Column, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val b = df
      .groupBy(blockKey.as("block_key"))
      .agg(count(lit(1)).as("block_size"))
      .withColumn("block_pairs", expr("block_size * (block_size - 1) div 2"))
    val t = b
      .agg(
        sum(col("block_size")).cast("long").as("n_records"),
        count(lit(1)).as("n_blocks"),
        sum(col("block_pairs")).cast("long").as("candidate_pairs"))
      .withColumn("full_pairs", expr("n_records * (n_records - 1) div 2"))
    b.orderBy(col("block_pairs").desc, col("block_key").asc)
      .limit(topK)
      .crossJoin(broadcast(t))
      .select(
        col("block_key"),
        col("block_size"),
        col("block_pairs"),
        col("n_records"),
        col("n_blocks"),
        col("candidate_pairs"),
        col("full_pairs"),
        round(lit(1.0) - col("candidate_pairs").cast("double") / col("full_pairs").cast("double"), 6)
          .as("reduction_ratio"))
  }

  /** Benford first-digit test (Benford 1938; the accounting-fraud /
    * synthetic-data smell test): leading-digit distribution of a positive
    * numeric column against the log-law p(d) = log10(1 + 1/d), with the
    * per-digit chi-square contribution (o − n·p)²/(n·p). Real
    * transactional magnitudes follow the law; fabricated or truncated
    * ones don't. One scan + a 9-row aggregate. The leading digit is the
    * FIRST SIGNIFICANT digit — the first [1-9] character of the value's
    * string form — which is exact and rendering-independent: "0.0042"
    * and "4.2E-5" both yield 4 (a normalized mantissa's first nonzero
    * char IS the leading digit), so sub-unit and extreme-magnitude
    * values are audited consistently instead of being dropped or
    * mantissa-skewed, with no log10/floor libm edge (log10(1000) is
    * 2.999… in some libms). Expectations are one log10 each in matched
    * double order, round(·, 6). Uniform-ish synthetic data FAILS this
    * test loudly — that is the point (the monitor reads the chi2 column,
    * not a pass/fail flag here). */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val digits = df
      .filter(col(valueCol) > 0)
      .select(
        nullif(regexp_extract(col(valueCol).cast("string"), "[1-9]", 0), lit(""))
          .cast("int").as("digit"))
      .filter(col("digit").between(1, 9))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_observed"))
    val total = digits.agg(sum(col("n_observed")).cast("long").as("n_total"))
    val p  = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0))
    val ex = col("n_total").cast("double") * p
    digits
      .crossJoin(broadcast(total))
      .select(
        col("digit"),
        col("n_observed"),
        round(p, 6).as("expected_p"),
        round(
          (col("n_observed").cast("double") - ex) * (col("n_observed").cast("double") - ex) / ex,
          6).as("chi2_term"))
  }

  /** Pairwise Pearson correlation matrix over numeric columns in ONE scan —
    * the feature-redundancy / leakage screen run before training (a 0.99
    * feature-feature correlation means a duplicated signal; a high
    * feature-label one means leakage). All (Σx, Σx², Σxy) moments are
    * EXACT: inputs land on a 10^-`scale` decimal grid and products carry
    * (17,s)×(17,s) = (35,2s) — under the 38-digit cap where Spark silently
    * drops scale. The closed-form r then runs in double in a fixed op
    * order, rounded to 6 (the decimal→double boundary's last-ulp freedom
    * absorbed, same as PSI's ln). Output: one row per unordered column
    * pair; zero-variance columns yield NULL r, not NaN. */
  def correlationMatrix(df: DataFrame, cols: Seq[String], scale: Int = 2): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val dec = org.apache.spark.sql.types.DecimalType(17, scale)
    val gridded = df.select(cols.map(c => round(col(c).cast("double"), scale).cast(dec).as(c)): _*)
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size } yield (cols(i), cols(j))
    val aggs =
      cols.map(c => sum(col(c)).as(s"s_$c")) ++
        cols.map(c => sum(col(c) * col(c)).as(s"ss_$c")) ++
        pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sp_${a}_$b") } :+
        count(lit(1)).as("n")
    val wide = gridded.agg(aggs.head, aggs.tail: _*)
    val entries = pairs.map { case (a, b) =>
      val nD   = col("n").cast("double")
      val sa   = col(s"s_$a").cast("double")
      val sb   = col(s"s_$b").cast("double")
      val ssa  = col(s"ss_$a").cast("double")
      val ssb  = col(s"ss_$b").cast("double")
      val sab  = col(s"sp_${a}_$b").cast("double")
      val va   = nD * ssa - sa * sa
      val vb   = nD * ssb - sb * sb
      val r    = (nD * sab - sa * sb) / (sqrt(va) * sqrt(vb))
      struct(
        lit(a).as("col_a"),
        lit(b).as("col_b"),
        round(when(va > 0.0 && vb > 0.0, r).otherwise(lit(null)), 6).as("r"))
    }
    wide
      .select(col("n"), explode(array(entries: _*)).as("e"))
      .select(col("e.col_a").as("col_a"), col("e.col_b").as("col_b"), col("e.r").as("r"), col("n").as("n_rows"))
  }

  /** Kruskal-Wallis H — the k-group extension of [[mannWhitneyPairs]]
    * (one-way ANOVA on ranks): H = 12/(n(n+1))·ΣR_j²/n_j − 3(n+1) over
    * pooled ranks, with the standard tie correction
    * C = 1 − Σ(t³−t)/(n³−n). With doubled ranks (exact ints under ties,
    * Σ2r = sr2_j) the identity H = 3/(n(n+1))·Σ sr2_j²/n_j − 3(n+1)
    * keeps every aggregate exact: per-group terms snap to the 1e-9 grid
    * and sum as decimals, the tie mass Σ(t³−t) is an exact integer over
    * value counts, and H, C, H/C are fixed-order double expressions
    * under round(·, 6). One rank map (low-cardinality precondition as
    * [[spearmanMatrix]]) + one group aggregation.
    * Returns (n, n_groups, h, h_tie_corrected). */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val dec9 = org.apache.spark.sql.types.DecimalType(30, 9)
    val pool = df.select(col(groupCol).cast("string").as("g"), col(valueCol).as("v"))
    val counts = pool.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val wv = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val rmap = counts.select(
      col("v"),
      (coalesce(sum(col("cnt")).over(wv), lit(0L)) * 2 + col("cnt") + 1).as("r2"))
    val perGroup = pool
      .join(broadcast(rmap), Seq("v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("nj"), sum(col("r2")).as("sr2"))
    val terms = perGroup.agg(
      count(lit(1)).as("n_groups"),
      sum(col("nj")).as("n"),
      sum(
        round(col("sr2").cast("double") * col("sr2").cast("double") / col("nj").cast("double"), 9)
          .cast(dec9)).cast(dec9).as("t9"))
    val ties = counts.agg(
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie_mass"))
    val nD = col("n").cast("double")
    val h = lit(3.0) * col("t9").cast("double") / (nD * (nD + lit(1.0))) -
      lit(3.0) * (nD + lit(1.0))
    val c = lit(1.0) - col("tie_mass").cast("double") / (nD * nD * nD - nD)
    terms
      .crossJoin(broadcast(ties))
      .select(
        col("n"),
        col("n_groups"),
        round(h, 6).as("h"),
        round(when(c > 0.0, h / c), 6).as("h_tie_corrected"))
  }

  /** Jensen-Shannon divergence between two categorical distributions —
    * the SYMMETRIC, bounded (≤ ln 2) drift measure beside PSI (which
    * blows up on vanishing bins) and chi-square (which needs expected
    * counts): JSD = ½KL(P‖M) + ½KL(Q‖M), M = ½(P+Q). Emits one row per
    * category with both shares and the category's divergence
    * contribution — hashing the contributions pins the whole statistic.
    *
    * Exactness: counts are exact integers; each share and each
    * p·ln(p/m) term runs in a FIXED double order and snaps to the 1e-12
    * grid (zero-count sides contribute exactly 0), so the total is an
    * exact decimal sum of grid terms. Two group-by passes, category-sized
    * output. */
  def jsDivergence(
      a: DataFrame,
      b: DataFrame,
      catCol: String): DataFrame = {
    val dec12 = org.apache.spark.sql.types.DecimalType(20, 12)
    val ca = a.groupBy(col(catCol).as("category")).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(col(catCol).as("category")).agg(count(lit(1)).as("n_b"))
    val joined = ca
      .join(cb, Seq("category"), "full_outer")
      .select(
        col("category"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val tot = joined.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    val p = col("n_a").cast("double") / col("ta").cast("double")
    val q = col("n_b").cast("double") / col("tb").cast("double")
    val m = (p + q) * lit(0.5)
    def term(x: org.apache.spark.sql.Column) =
      when(x > 0.0, x * log(x / m)).otherwise(lit(0.0))
    joined
      .crossJoin(broadcast(tot))
      .select(
        col("category"),
        col("n_a"),
        col("n_b"),
        round(p, 6).as("share_a"),
        round(q, 6).as("share_b"),
        round((term(p) + term(q)) * lit(0.5), 12).cast(dec12).as("contrib12"))
      .select(
        col("category"), col("n_a"), col("n_b"), col("share_a"), col("share_b"),
        col("contrib12").cast("double").as("js_contrib"))
  }

  /** Per-period drift TIMELINE against a fixed reference window — the
    * monitoring curve behind every "when did the mix start moving" page:
    * one Jensen–Shannon divergence per day between that day's categorical
    * mix and the reference window's mix (days before `refEnd`). JSD per
    * [[jsDivergence]]'s discipline — exact integer counts, per-category
    * p·ln terms snapped to the 1e-12 grid, exact decimal per-day sums —
    * over a (day × category) scaffold so categories absent on a day
    * contribute their exact 0-side terms. Two group-bys + one scaffold
    * join; output is day-sized. */
  def driftTimeline(
      events: DataFrame,
      tsCol: String,
      catCol: String,
      refEnd: String): DataFrame = {
    val dec12 = org.apache.spark.sql.types.DecimalType(20, 12)
    val base = events.select(
      to_date(col(tsCol)).cast("string").as("day"),
      col(catCol).cast("string").as("category"))
    val cnt = base.groupBy(col("day"), col("category")).agg(count(lit(1)).as("n"))
    val ref = cnt
      .filter(col("day") < refEnd)
      .groupBy(col("category"))
      .agg(sum(col("n")).as("n_ref"))
    val refTot = ref.agg(sum(col("n_ref")).as("t_ref"))
    val scaffold = cnt.select(col("day")).distinct()
      .crossJoin(broadcast(cnt.select(col("category")).distinct()))
    val joined = scaffold
      .join(cnt, Seq("day", "category"), "left")
      .join(broadcast(ref), Seq("category"), "left")
      .crossJoin(broadcast(refTot))
      .select(
        col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        col("t_ref"))
    val dayTot = joined.groupBy(col("day")).agg(sum(col("n")).as("t_day"))
    val p = col("n").cast("double") / col("t_day").cast("double")
    val q = col("n_ref").cast("double") / col("t_ref").cast("double")
    val m = (p + q) * lit(0.5)
    def term(x: org.apache.spark.sql.Column) =
      when(x > 0.0, x * log(x / m)).otherwise(lit(0.0))
    joined
      .join(dayTot, Seq("day"))
      .select(
        col("day"), col("t_day"),
        round((term(p) + term(q)) * lit(0.5), 12).cast(dec12).as("contrib12"))
      .groupBy(col("day"))
      .agg(
        max(col("t_day")).as("n_events"),
        round(sum(col("contrib12")).cast(dec12).cast("double"), 6).as("jsd"))
  }

  /** Gini concentration coefficient over per-entity totals (the revenue-
    * concentration / data-source-imbalance signal): with x₍₁₎ ≤ … ≤ x₍ₙ₎,
    * G = 2·Σ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n. Totals aggregate exactly on the
    * money grid (DECIMAL cents), Σi·x is an exact decimal, and G is a
    * fixed-order double expression under round(·, 6); ranking ties break
    * by entity id so the rank assignment is total. The per-entity
    * aggregate is the data-sized pass; the rank comes from
    * [[PrefixSum.withRunning]]'s two-phase range-partitioned row number —
    * the entity table grows with the corpus, so it never rides a
    * single-partition global window. Returns (n_entities, total, gini). */
  def giniCoefficient(
      df: DataFrame,
      entityCol: String,
      valueCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val per = df
      .groupBy(col(entityCol).as("e"))
      .agg(sum(col(valueCol).cast(dec)).cast(dec).as("x"))
    val ranked = PrefixSum
      .withRunning(per, Seq(col("x"), col("e")), Seq.empty, rowNumberAs = Some("i"))
      .select(col("x"), col("i"))
    val agg = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("i")).as("six"))
    agg.select(
      col("n").as("n_entities"),
      col("sx").cast("double").as("total"),
      round(
        lit(2.0) * col("six").cast("double") / (col("n").cast("double") * col("sx").cast("double"))
          - (col("n") + 1).cast("double") / col("n").cast("double"),
        6).as("gini"))
  }

  /** Spearman rank correlation matrix — [[correlationMatrix]]'s robust
    * sibling (monotone association, outlier-immune): Pearson on DOUBLED
    * average ranks, which are exact INTEGERS even under ties
    * (2·rank = 2·cnt_less + cnt_eq + 1), so the whole moment pipeline is
    * exact-integer and scaling by 2 leaves ρ unchanged. Ranks come from a
    * per-column value→rank map (one small aggregation + a broadcast
    * join); columns must be LOW-CARDINALITY/gridded — snap continuous
    * columns to a grid first, or the rank map stops being broadcastable
    * (the quantileBucketize-style precondition, documented not hidden).
    * Output shape = correlationMatrix: (col_a, col_b, r, n_rows). */
  def spearmanMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val base = df.select(cols.map(col): _*)
    val ranked = cols.foldLeft(base) { (acc, c) =>
      val counts = base.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      val wv = org.apache.spark.sql.expressions.Window
        .orderBy(col(c))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val rmap = counts.select(
        col(c),
        (coalesce(sum(col("cnt")).over(wv), lit(0L)) * 2 + col("cnt") + 1).as(s"__r2_$c"))
      acc.join(broadcast(rmap), Seq(c))
    }
    correlationMatrix(
      ranked.select(cols.map(c => col(s"__r2_$c").as(c)): _*),
      cols,
      scale = 0)
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) for every pair of groups — the
    * distribution-free "are these two segments' values from the same
    * distribution" test (the robust two-sample check beside the
    * parametric z-test). For each pooled pair: doubled average ranks are
    * exact integers (ties included), 2·U₁ = Σ2r(group₁) − n₁(n₁+1) is an
    * exact integer statistic, and the common-language effect size
    * U₁/(n₁n₂) takes the one division under round(·, 6) — effect 0.5 =
    * stochastically equal, 1.0 = group₁ always larger. Pairs are
    * group-count bounded (a driver loop over a model-sized set); each
    * pair is one filtered aggregation with a broadcast rank map (same
    * low-cardinality value precondition as [[spearmanMatrix]]).
    * Returns (group_a, group_b, n_a, n_b, u2_a, effect_a). */
  def mannWhitneyPairs(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val groups = df.select(col(groupCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    require(groups.size >= 2 && groups.size <= 32, s"need 2..32 groups, got ${groups.size}")
    val rows = for {
      i <- groups.indices; j <- (i + 1) until groups.size
    } yield {
      val (ga, gb) = (groups(i), groups(j))
      val pair = df
        .filter(col(groupCol).isin(ga, gb))
        .select(col(groupCol).cast("string").as("g"), col(valueCol).as("v"))
      val counts = pair.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      val wv = org.apache.spark.sql.expressions.Window
        .orderBy(col("v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val rmap = counts.select(
        col("v"),
        (coalesce(sum(col("cnt")).over(wv), lit(0L)) * 2 + col("cnt") + 1).as("r2"))
      val agg = pair
        .join(broadcast(rmap), Seq("v"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("r2")).as("sr2"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val (na, ra) = agg(ga)
      val nb       = agg(gb)._1
      val u2a      = ra - na * (na + 1)
      val effect = java.math.BigDecimal
        .valueOf(u2a.toDouble / (2.0 * na.toDouble * nb.toDouble))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      (ga, gb, na, nb, u2a, effect)
    }
    rows.toDF("group_a", "group_b", "n_a", "n_b", "u2_a", "effect_a")
      .orderBy(col("group_a"), col("group_b"))
  }

  /** Two-sample Kolmogorov–Smirnov distance for every group pair — the
    * distribution-shape complement of Mann-Whitney (which only sees
    * stochastic dominance) and of the binned drift measures (PSI/χ²/JSD,
    * which need a binning choice): D = sup_v |F_a(v) − F_b(v)| over the
    * pooled empirical CDFs, binning-free and sensitive to ANY
    * distributional difference. Exact arithmetic throughout: the sup is
    * taken over the integer numerator |n_b·C_a(v) − n_a·C_b(v)| (C = the
    * cumulative count at v), so `d_num` is an exact long and
    * D = d_num/(n_a·n_b) is ONE division under round(·, 6); the
    * asymptotic statistic sqrt(n_a·n_b/(n_a+n_b))·D is a fixed-order
    * double formula from the already-rounded D (IEEE sqrt is correctly
    * rounded, so both engines agree bit-for-bit).
    *
    * Scale: the per-pair table is value-distinct-sized (the cumulative
    * window runs unpartitioned over it) — same documented low-cardinality
    * precondition as mannWhitneyPairs; the data-sized stage is one
    * grouped count per pair.
    */
  def ksTestPairs(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val groups = df.select(col(groupCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    require(groups.size >= 2 && groups.size <= 32, s"need 2..32 groups, got ${groups.size}")
    val rows = for {
      i <- groups.indices; j <- (i + 1) until groups.size
    } yield {
      val (ga, gb) = (groups(i), groups(j))
      val counts = df
        .filter(col(groupCol).isin(ga, gb))
        .select(col(groupCol).cast("string").as("g"), col(valueCol).as("v"))
        .groupBy(col("v"))
        .agg(
          sum(when(col("g") === ga, 1L).otherwise(0L)).as("ca"),
          sum(when(col("g") === gb, 1L).otherwise(0L)).as("cb"))
      val wv = org.apache.spark.sql.expressions.Window
        .orderBy(col("v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tot = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb")).collect()(0)
      val (na, nb) = (tot.getLong(0), tot.getLong(1))
      require(na > 0 && nb > 0, s"empty group among ($ga, $gb)")
      val dnum = counts
        .select((sum(col("ca")).over(wv) * nb - sum(col("cb")).over(wv) * na).as("diff"))
        .agg(max(abs(col("diff"))))
        .collect()(0).getLong(0)
      val ksD = java.math.BigDecimal
        .valueOf(dnum.toDouble / (na.toDouble * nb.toDouble))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val ksStat = java.math.BigDecimal
        .valueOf(ksD * math.sqrt(na.toDouble * nb.toDouble / (na.toDouble + nb.toDouble)))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      (ga, gb, na, nb, dnum, ksD, ksStat)
    }
    rows.toDF("group_a", "group_b", "n_a", "n_b", "d_num", "ks_d", "ks_stat")
      .orderBy(col("group_a"), col("group_b"))
  }

  /** All-pairs Mann-Whitney z-tests with Benjamini-Hochberg FDR control
    * (Benjamini & Hochberg 1995) — the missing piece once a monitor runs a
    * BATTERY of tests: at m = g·(g−1)/2 pairs, per-test α guarantees ~α·m
    * false alarms; BH's step-up rule caps the expected FALSE-DISCOVERY
    * RATE instead, the standard correction for drift dashboards.
    *
    * Fully distributed all-pairs formulation (unlike [[mannWhitneyPairs]]'
    * per-pair driver loop): ONE grouped count per (group, value), a
    * (values × groups) frame with per-group cumulative-below counts, and
    * one value-keyed join producing every ordered pair's exact-integer
    * 2U_a = Σ_v 2·c_a(v)·C_b(<v) + c_a(v)·c_b(v) — ties pay the half by
    * construction. The normal approximation (no tie correction — the
    * documented convention, exact given it) is one fixed-order double
    * formula from exact longs: z = (2U − n_a·n_b)/√(n_a·n_b·(n_a+n_b+1)/3)
    * under round(·, 6); the two-sided p = erfc(|z|/√2) via the
    * Abramowitz-Stegun 7.1.26 polynomial (|ε| < 1.5·10⁻⁷ — both engines
    * evaluate the SAME Horner chain, so parity is exact even though the
    * approximation isn't) under round(·, 9). BH itself is two windows over
    * the m-row pair table: rank by (p asc, pair asc), raw q = m·p/rank on
    * the 1e-9 grid, adjusted q = running MIN from the bottom (min of grid
    * values — order-free) clamped to 1; reject ⇔ q ≤ alpha.
    *
    * Scale: the data-sized stage is the single (group, value) count
    * (map-side combined). The frame is |values|·g rows and the pair join
    * |values|·g² — document-bounded for the low-cardinality group axes
    * this is for (require ≤ 64 groups, same stance as mannWhitneyPairs);
    * the BH windows run over m ≤ 2016 rows. */
  /** Two-sided normal p-value from a grid-6 z: erfc(|z|/√2) via the
    * Abramowitz-Stegun 7.1.26 polynomial (|ε| < 1.5·10⁻⁷ — both engines
    * evaluate the SAME Horner chain, so cross-engine parity is exact even
    * though the approximation isn't), under round(·, 9). Shared by every
    * z-based test in the engine (BH battery, log-rank, …) so the oracle
    * formula is written exactly once per side. */
  private[operators] def normalTwoSidedP(z: Column): Column = {
    val x = abs(z) / sqrt(lit(2.0))
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * t - lit(1.453152027)) * t + lit(1.421413741)) * t
      - lit(0.284496736)) * t + lit(0.254829592)) * t
    round(poly * exp(-x * x), 9)
  }

  def bhFdrMannWhitney(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      alpha: Double = 0.05): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val pts = df.select(col(groupCol).cast("string").as("g"), col(valueCol).as("v"))
    val cnt = pts.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val grp = cnt.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val nGroups = grp.count()
    require(nGroups >= 2 && nGroups <= 64, s"need 2..64 groups, got $nGroups")
    val vals  = cnt.select(col("v")).distinct()
    val frame = vals
      .crossJoin(broadcast(grp.select(col("g"))))
      .join(cnt, Seq("g", "v"), "left")
      .select(col("g"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
    val wcum = W.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(W.unboundedPreceding, -1)
    val cum = frame.withColumn("cum_below", coalesce(sum(col("c")).over(wcum), lit(0L)))
    val a = cnt.select(col("g").as("ga"), col("v"), col("c").as("ca"))
    val b = cum.select(col("g").as("gb"), col("v"), col("c").as("cb"), col("cum_below"))
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val u2 = a
      .join(b, Seq("v"))
      .filter(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb"))
      // DECIMAL(38,0) terms: c·cumBelow is O(n²) and wraps long past ~3e9-row
      // groups; the final cast fails loudly (ANSI) instead of wrapping
      .agg(sum(col("ca").cast(dec38) * col("cum_below") * 2 + col("ca").cast(dec38) * col("cb"))
        .cast("long").as("u2_a"))
    val dbl = (c: Column) => c.cast("double")
    val sd2u = sqrt(dbl(col("n_a")) * dbl(col("n_b")) * dbl(col("n_a") + col("n_b") + 1) / 3.0)
    val zc   = round((dbl(col("u2_a")) - dbl(col("n_a")) * dbl(col("n_b"))) / sd2u, 6)
    val scored = u2
      .join(broadcast(grp.select(col("g").as("ga"), col("n").as("n_a"))), Seq("ga"))
      .join(broadcast(grp.select(col("g").as("gb"), col("n").as("n_b"))), Seq("gb"))
      .withColumn("z", zc)
      .withColumn("p_value", normalTwoSidedP(col("z")))
    val m     = java.lang.Math.toIntExact(nGroups * (nGroups - 1) / 2)
    val wrank = W.orderBy(col("p_value").asc, col("ga").asc, col("gb").asc)
    val wmin = W.orderBy(col("p_rank").desc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    scored
      .withColumn("p_rank", row_number().over(wrank))
      .withColumn("q_raw", round(lit(m.toDouble) * col("p_value") / dbl(col("p_rank")), 9))
      .withColumn("q_value", least(min(col("q_raw")).over(wmin), lit(1.0)))
      .select(
        col("ga").as("group_a"), col("gb").as("group_b"),
        col("n_a"), col("n_b"), col("u2_a"),
        col("z"), col("p_value"), col("p_rank"), col("q_value"),
        (col("q_value") <= alpha).as("reject"))
      .orderBy(col("group_a"), col("group_b"))
  }

  /** Per-group trimmed mean — the robust location estimate between the
    * mean (breakdown 0) and the median (breakdown ½): drop the
    * ⌊n·trimPct⌋ smallest and largest values, average the middle. Exact
    * arithmetic: the kept window is a pure rank selection (ties are
    * interchangeable — dropping k smallest under ties removes the same
    * multiset whatever the tie order), the kept sum is an exact integer
    * (integral values — cents/counts upstream), and the mean is ONE
    * division under round(·, 6). One window pass + one aggregation. */
  def trimmedMean(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      trimPct: Double = 0.05): DataFrame = {
    require(trimPct >= 0 && trimPct < 0.5, s"trimPct must be in [0, 0.5), got $trimPct")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    df
      .select(col(groupCol).cast("string").as("g"), col(valueCol).cast("long").as("v"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("k", floor(col("n") * trimPct))
      .filter(col("rn") > col("k") && col("rn") <= col("n") - col("k"))
      .groupBy(col("g"))
      .agg(
        first(col("n")).as("n"),
        first(col("k")).as("n_trimmed_each"),
        count(lit(1)).as("n_kept"),
        sum(col("v")).as("s"))
      .select(
        col("g").as("group_key"),
        col("n"),
        col("n_trimmed_each"),
        col("n_kept"),
        round(col("s").cast("double") / col("n_kept").cast("double"), 6).as("trimmed_mean"))
      .orderBy(col("group_key"))
  }

  /** Cramér's V association between two categorical columns (Cramér
    * 1946) — the [0, 1] effect size the χ² tests lack (χ² grows with N;
    * V answers "how strong", the pair to quality_drift_chi2's "is it
    * real"): V = sqrt(χ²/(N·(min(r,c)−1))). Observed counts and margins
    * are exact integers from ONE contingency aggregation (absent cells
    * count as real zeros via the margin frame, the chi2Features
    * discipline); each (O−E)²/E snaps to the 1e-9 grid so the χ² sum is
    * an exact decimal; V is one fixed-order sqrt formula from the
    * round-6 χ² under round(·, 6). Degenerate tables (r or c = 1) emit
    * NULL, never NaN. */
  def cramersV(df: DataFrame, colA: String, colB: String): DataFrame = {
    val dec9 = org.apache.spark.sql.types.DecimalType(20, 9)
    val cells = df
      .select(col(colA).cast("string").as("a"), col(colB).cast("string").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col("a")).agg(sum(col("o")).as("row_t"))
    val colT = cells.groupBy(col("b")).agg(sum(col("o")).as("col_t"))
    val nT   = cells.agg(sum(col("o")).as("n"))
    val frame = rowT.crossJoin(broadcast(colT)).crossJoin(broadcast(nT))
    val e = col("row_t").cast("double") * col("col_t").cast("double") / col("n").cast("double")
    val o = coalesce(col("o"), lit(0L)).cast("double")
    val chi2 = frame
      .join(cells, Seq("a", "b"), "left")
      .select(
        col("n"),
        round((o - e) * (o - e) / e, 9).cast(dec9).as("term"))
      .groupBy(col("n"))
      .agg(round(sum(col("term")), 6).cast("double").as("chi2"))
    val shape = rowT.agg(count(lit(1)).as("r")).crossJoin(colT.agg(count(lit(1)).as("c")))
    chi2
      .crossJoin(broadcast(shape))
      .select(
        col("n"),
        col("r").as("n_rows_cat"),
        col("c").as("n_cols_cat"),
        col("chi2"),
        when(least(col("r"), col("c")) > 1,
          round(
            sqrt(col("chi2") / (col("n").cast("double") * (least(col("r"), col("c")) - 1).cast("double"))),
            6)).as("cramers_v"))
  }

  /** Cochran-Armitage trend test (Cochran 1954; Armitage 1955) — is a
    * binary rate TRENDING across ordered categories? The χ² independence
    * test ignores the ordering; this is the one-degree-of-freedom test
    * that uses it (rate drift across years, cohorts, size buckets).
    *
    * Cross-multiplied integer form: with per-category (score w, trials n,
    * successes r) and totals (N, R), the statistic's numerator
    * A = Σ w·(N·r − n·R) and the score spread B = N·Σw²n − (Σwn)² are
    * EXACT integers (DECIMAL(38,0) products — petabyte counts cannot
    * wrap), and z = A·√(N/(R·(N−R)·B)) is ONE fixed-order double formula
    * under round(·, 6); two-sided p via the shared A&S chain. Degenerate
    * inputs (all/no successes, or zero score spread) yield NULL, never
    * NaN. One map-side-combined category aggregate; everything after is
    * category-sized. */
  def cochranArmitage(
      df: DataFrame,
      scoreCol: String,
      success: Column,
      alphaSig: Double = 0.05): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val dbl   = (c: Column) => c.cast("double")
    val cat = df
      .select(col(scoreCol).cast("long").as("w"), success.cast("long").as("s"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("r"))
    val tot = cat.agg(
      count(lit(1)).as("k"),
      sum(col("n")).as("n_total"),
      sum(col("r")).as("r_total"),
      sum(col("w").cast(dec38) * col("n")).as("swn"),
      sum(col("w").cast(dec38) * col("w") * col("n")).as("sw2n"))
    val agg = cat
      .crossJoin(broadcast(tot))
      .agg(
        first(col("k")).as("k"),
        first(col("n_total")).as("n_total"),
        first(col("r_total")).as("r_total"),
        sum(col("w").cast(dec38) *
          (col("n_total").cast(dec38) * col("r") - col("n").cast(dec38) * col("r_total")))
          .as("a_num"),
        first(col("n_total").cast(dec38) * col("sw2n") - col("swn") * col("swn")).as("b_num"))
    agg
      .select(
        col("k"), col("n_total"), col("r_total"),
        col("a_num").cast("long").as("a_num"),
        col("b_num").cast("long").as("b_num"),
        round(
          when(
            col("r_total") > 0 && col("r_total") < col("n_total") && col("b_num") > 0,
            dbl(col("a_num")) * sqrt(
              dbl(col("n_total")) /
                (dbl(col("r_total")) * dbl(col("n_total") - col("r_total")) * dbl(col("b_num"))))),
          6).as("z"))
      .withColumn("p_value", when(col("z").isNotNull, normalTwoSidedP(col("z"))))
      .withColumn("significant", when(col("p_value").isNotNull, col("p_value") <= alphaSig))
  }

  /** Quantile normalization — the batch-effect/covariate-shift correction
    * from genomics (Bolstad et al. 2003) generalized to unequal group
    * sizes: each value is replaced by the POOLED distribution's
    * interpolated quantile at its within-group rank position
    * p = (r − ½)/n_g, so every group's distribution maps onto the same
    * reference and downstream comparisons see shape, not shift.
    *
    * Determinism: ranks and sizes are exact integers; the target pooled
    * position t = p·(N−1) is a fixed-order double, its fraction snaps to
    * the 1e-9 grid before ONE linear interpolation under round(·, 6).
    * Ties within a group get consecutive ranks but identical emitted rows
    * (the output multiset is rank-order-free). The pooled order is a
    * global sort — the exact-percentile stance of quantileBucketize
    * (swap an approx grid in beyond single-node order-statistics scale);
    * the per-group windows shuffle once on the group key.
    * Output: (group, value, qn_value) per input row. */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val pts = df.select(
      col(groupCol).cast("string").as("g"), col(valueCol).cast("double").as("v"))
    val ranked = pts
      .withColumn("r", row_number().over(W.partitionBy(col("g")).orderBy(col("v"))))
      .withColumn("ng", count(lit(1)).over(W.partitionBy(col("g"))))
    val pool = pts
      .select(col("v").as("pv"))
      .withColumn("idx", row_number().over(W.orderBy(col("pv"))))
      .withColumn("n", count(lit(1)).over())
    val dbl = (c: Column) => c.cast("double")
    val t   = (dbl(col("r")) - lit(0.5)) / dbl(col("ng")) * dbl(col("n") - 1)
    val withT = ranked
      .crossJoin(broadcast(pool.select(col("n")).limit(1)))
      .withColumn("k", floor(t).cast("long"))
      .withColumn("frac", round(t - floor(t), 9))
    withT
      .join(pool.select(col("idx"), col("pv").as("v_lo")), col("k") + 1 === col("idx"))
      .join(pool.select(col("idx").as("idx2"), col("pv").as("v_hi")),
        col("k") + 2 === col("idx2"), "left")
      .select(
        col("g").as(groupCol),
        col("v").as(valueCol),
        round(col("v_lo") + col("frac") * (coalesce(col("v_hi"), col("v_lo")) - col("v_lo")), 6)
          .as("qn_value"))
  }

  /** Cohen's kappa (Cohen 1960) — chance-corrected agreement between two
    * categorical raters (two annotators, or two automated quality gates
    * whose consistency a labeling pipeline must audit):
    * κ = (N·Σ_c O_cc − Σ_c n_a(c)·n_b(c)) / (N² − Σ_c n_a(c)·n_b(c)),
    * the cross-multiplied form of (p_o − p_e)/(1 − p_e) — EXACT integer
    * numerator and denominator from one contingency pass + two margins,
    * ONE division under round(·, 6). p_o and p_e are emitted as their own
    * single divisions (κ is NOT computed from the rounded p's). Both
    * raters constant and equal (denominator 0) yields NULL, never NaN.
    * Output: one row (n, n_categories, p_observed, p_expected, kappa). */
  def cohensKappa(df: DataFrame, raterACol: String, raterBCol: String): DataFrame = {
    val cells = df
      .select(col(raterACol).cast("string").as("a"), col(raterBCol).cast("string").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("o"))
    val ma = cells.groupBy(col("a").as("c")).agg(sum(col("o")).as("na"))
    val mb = cells.groupBy(col("b").as("c")).agg(sum(col("o")).as("nb"))
    val marg = ma
      .join(mb, Seq("c"), "full_outer")
      .select(col("c"), coalesce(col("na"), lit(0L)).as("na"), coalesce(col("nb"), lit(0L)).as("nb"))
    val dbl = (c: Column) => c.cast("double")
    val agg = cells
      .agg(
        sum(col("o")).as("n"),
        sum(when(col("a") === col("b"), col("o")).otherwise(lit(0L))).as("agree"))
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val ex = marg.agg(
      count(lit(1)).as("n_categories"),
      // DECIMAL(38,0) products: margins at petabyte row counts overflow long
      sum(col("na").cast(dec38) * col("nb")).as("pe_num"))
    val n2 = col("n").cast(dec38) * col("n")
    agg
      .crossJoin(broadcast(ex))
      .select(
        col("n"),
        col("n_categories"),
        round(dbl(col("agree")) / dbl(col("n")), 6).as("p_observed"),
        round(dbl(col("pe_num")) / dbl(n2), 6).as("p_expected"),
        round(
          when(n2 =!= col("pe_num"),
            dbl(col("n").cast(dec38) * col("agree") - col("pe_num")) / dbl(n2 - col("pe_num"))),
          6).as("kappa"))
  }

  /** Poisson(1) CDF thresholds (k = 0..8) for the seeded bootstrap's
    * inverse-CDF weight draw. The DEFINITION of the weight function is
    * these exact double literals (both engines compare the same dyadic u
    * against the same constants), not the analytic CDF. */
  private[graft] val Poisson1Cdf: Seq[Double] = {
    val pmf = (0 to 8).scanLeft(math.exp(-1.0)) { case (p, k) => p / (k + 1) }.take(9)
    pmf.scanLeft(0.0)(_ + _).tail
  }

  /** Seeded Poisson bootstrap confidence interval for a mean (Chamandy et
    * al. 2012, "Estimating uncertainty for massive data streams" — the
    * scalable bootstrap): instead of resampling rows, replicate b weights
    * each row by a Poisson(1) draw, so all B replicates ride ONE pass
    * with a B-way explode and no shuffled resample. The error bars a
    * 100 TB mean needs, without a second scan per replicate.
    *
    * Reproducible-release discipline: the draw is the inverse Poisson(1)
    * CDF of the exact dyadic u = splitmix64(key ⊕ golden·(b+1)) top-53
    * bits / 2⁵³, compared against the fixed [[Poisson1Cdf]] literals —
    * deterministic and replayable bit-for-bit. Replicate means are exact
    * decimal sums (values on the money grid) over integer weight sums,
    * one division each under round(·, 9); the interval is a pure rank
    * selection at ranks ⌈α/2·B⌉ and B+1−⌈α/2·B⌉ (ties interchangeable).
    * Output one row: (n, n_replicates, mean, ci_lo, ci_hi). */
  def bootstrapMeanCi(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      b: Int = 64,
      alpha: Double = 0.05): DataFrame = {
    require(b >= 8, s"need >= 8 replicates, got $b")
    val dec = org.apache.spark.sql.types.DecimalType(28, 2)
    val W   = org.apache.spark.sql.expressions.Window
    val dbl = (c: Column) => c.cast("double")
    val salts = (0 until b).map(j =>
      struct(lit(j).as("b"), lit(Sketches.BloomGolden * (j + 1).toLong).as("salt")))
    val h = graft.functions.TextFunctions.mix64(col("key").bitwiseXOR(col("e.salt")))
    val u = shiftrightunsigned(h, 11).cast("double") / lit(9007199254740992.0)
    val w = Poisson1Cdf.zipWithIndex.foldRight(lit(Poisson1Cdf.size): Column) {
      case ((cdf, k), acc) => when(col("u") < cdf, k).otherwise(acc)
    }
    val reps = df
      .select(col(keyCol).cast("long").as("key"), col(valueCol).cast(dec).as("x"))
      .select(col("key"), col("x"), explode(array(salts: _*)).as("e"))
      .select(col("e.b").as("b"), col("x"), u.as("u"))
      .select(col("b"), col("x"), w.as("w"))
      .groupBy(col("b"))
      // w <= 9 sized DECIMAL(2,0): 28+2+1 = 31 <= 38 keeps the product at
      // scale 2 exactly (a LongType operand would trip allowPrecisionLoss)
      .agg(
        sum(col("x") * col("w").cast(org.apache.spark.sql.types.DecimalType(2, 0))).as("sx"),
        sum(col("w")).as("sw"))
      .filter(col("sw") > 0)
      .select(col("b"), round(dbl(col("sx")) / dbl(col("sw")), 9).as("m"))
    val loRank = math.max(1, math.ceil(alpha / 2.0 * b).toInt)
    val hiRank = b + 1 - loRank
    val ranked = reps.withColumn("rn", row_number().over(W.orderBy(col("m").asc, col("b").asc)))
    val ci = ranked.agg(
      max(when(col("rn") === loRank, col("m"))).as("ci_lo"),
      max(when(col("rn") === hiRank, col("m"))).as("ci_hi"))
    df.agg(count(lit(1)).as("n"), sum(col(valueCol).cast(dec)).as("sx"))
      .crossJoin(broadcast(ci))
      .select(
        col("n"),
        lit(b).as("n_replicates"),
        round(dbl(col("sx")) / dbl(col("n")), 9).as("mean"),
        round(col("ci_lo"), 6).as("ci_lo"),
        round(col("ci_hi"), 6).as("ci_hi"))
  }

  /** Mondrian k-anonymization (LeFevre, DeWitt & Ramakrishnan 2006) — the
    * GENERALIZER the audit family ([[kAnonymityAudit]], [[tClosenessAudit]])
    * checks the output of: greedy median partitioning of the QI space
    * until no partition can split without dropping below k, then each
    * record is released with its partition's [min, max] ranges instead of
    * its exact values.
    *
    * Deterministic strict-Mondrian recursion, fully unrollable: each
    * round, every live partition picks the dimension with the widest RAW
    * range (ties → dimension order; same-units caveat documented), takes
    * the LOWER MEDIAN of that dimension (rank ⌊(n+1)/2⌋ — a pure rank
    * selection, exact under ties), and splits into ≤ median / > median
    * iff BOTH sides keep ≥ k records; rounds past the fixpoint are
    * no-ops, so a bounded unroll replays the engine's recursion exactly
    * (the k-core discipline). Partition ids are the split path ("r",
    * "rL", "rLR", …) — a deterministic total encoding.
    *
    * Scale: each round is one stats aggregate + one rank window per live
    * partition set (all partitions in parallel — the windows key on the
    * partition id), `rounds` is O(log(n/k)) by construction, and lineage
    * is cut every few rounds. Output: one row per equivalence class
    * (class_id, n, lo/hi per QI dim) — every class satisfies n ≥ k by
    * the split rule (k ≤ n < 2k·(max split imbalance) in practice). */
  def mondrianAnonymize(
      df: DataFrame,
      qiCols: Seq[String],
      k: Long,
      rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(qiCols.size >= 1 && qiCols.size <= 4, s"1..4 QI dims, got ${qiCols.size}")
    require(k >= 2 && rounds >= 1, s"need k >= 2, rounds >= 1")
    val W = org.apache.spark.sql.expressions.Window
    val dims = qiCols.indices.map(i => s"q$i")
    val st = graft.operators.IterState(df, checkpointDir)
    var cur = st.mat(
      df.select(qiCols.zipWithIndex.map { case (c, i) => col(c).cast("long").as(s"q$i") }: _*)
        .withColumn("pid", lit("r")))
    var round = 0
    while (round < rounds) {
      val wp = W.partitionBy(col("pid"))
      // per-partition stats: n + range per dim
      var s = cur.withColumn("n", count(lit(1)).over(wp))
      dims.foreach { d =>
        s = s
          .withColumn(s"lo_$d", min(col(d)).over(wp))
          .withColumn(s"hi_$d", max(col(d)).over(wp))
      }
      // widest raw range wins, ties to the first dimension (strict > keeps
      // the earlier index on equal ranges)
      val ranges = dims.map(d => col(s"hi_$d") - col(s"lo_$d"))
      val widest = dims.indices.tail.foldLeft((lit(0), ranges(0))) { case ((bi, br), i) =>
        (when(ranges(i) > br, lit(i)).otherwise(bi), greatest(br, ranges(i)))
      }._1
      s = s.withColumn("dim", widest)
      // lower median of the chosen dimension: the value at rank
      // floor((n+1)/2) — equal values are interchangeable for <= median
      val chosen = dims.indices.foldRight(col(dims.last)) { (i, acc) =>
        if (i == dims.size - 1) acc else when(col("dim") === i, col(dims(i))).otherwise(acc)
      }
      s = s.withColumn("v", chosen)
      val wv = W.partitionBy(col("pid")).orderBy(col("v"))
      s = s
        .withColumn("rn", row_number().over(wv))
        .withColumn("med",
          max(when(col("rn") === ((col("n") + 1) / 2).cast("long"), col("v"))).over(wp))
      // left size = rows with v <= med
      s = s.withColumn("n_left", sum(when(col("v") <= col("med"), 1L).otherwise(0L)).over(wp))
      val canSplit = col("n_left") >= k && (col("n") - col("n_left")) >= k
      cur = s
        .withColumn("pid",
          when(canSplit && col("v") <= col("med"), concat(col("pid"), lit("L")))
            .when(canSplit, concat(col("pid"), lit("R")))
            .otherwise(col("pid")))
        .select((dims.map(col) :+ col("pid")): _*)
      round += 1
      if (round % 3 == 0 || round == rounds) cur = st.mat(cur)
    }
    val aggs = Seq(count(lit(1)).as("n")) ++
      qiCols.zipWithIndex.flatMap { case (c, i) =>
        Seq(min(col(s"q$i")).as(s"${c}_lo"), max(col(s"q$i")).as(s"${c}_hi"))
      }
    cur.groupBy(col("pid").as("class_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("class_id"))
  }

  /** Seeded randomized response (Warner 1965) — the LOCAL-DP primitive:
    * each unit reports its true binary attribute with probability p and
    * the flip otherwise (ε = ln(p/(1−p))), and the aggregator recovers an
    * unbiased per-group frequency π̂ = (λ̂ + p − 1)/(2p − 1) from reported
    * counts alone. Same reproducible-release discipline as
    * [[dpNoisyCounts]]: the flip is DETERMINISTIC from splitmix64(key ⊕
    * seed) via the exact dyadic u = top-53 bits / 2⁵³, so a release is
    * re-derivable and auditable bit-for-bit (the seed is the secret).
    *
    * p must be an exact binary fraction (0.75, 0.875…) so the u < p
    * comparison is grid-exact cross-engine. Counts are exact ints;
    * π̂ and the true fraction (riding along for the audit — the local-DP
    * contract is that the AGGREGATE recovers it) are each ONE fixed-order
    * formula under round(·, 6). π̂ is the raw unbiased estimator — it may
    * leave [0,1] on small groups by design. One map-side-combined pass. */
  def randomizedResponse(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      truth: Column,
      seed: Long,
      p: Double = 0.75): DataFrame = {
    require(p > 0.5 && p < 1.0, s"p must be in (0.5, 1), got $p")
    val h = graft.functions.TextFunctions.mix64(col(keyCol).cast("long").bitwiseXOR(lit(seed)))
    val u = shiftrightunsigned(h, 11).cast("double") / lit(9007199254740992.0)
    val reported = df
      .select(col(groupCol).as("g"), truth.as("t"), u.as("u"))
      .select(col("g"), col("t"), (col("t") === (col("u") < p)).as("rep"))
    val dbl = (c: Column) => c.cast("double")
    reported
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("rep"), 1L).otherwise(0L)).as("n_yes_reported"),
        sum(when(col("t"), 1L).otherwise(0L)).as("n_yes_true"))
      .select(
        col("g").as(groupCol),
        col("n"), col("n_yes_reported"),
        round(
          (dbl(col("n_yes_reported")) / dbl(col("n")) + (p - 1.0)) / (2.0 * p - 1.0),
          6).as("pi_hat"),
        round(dbl(col("n_yes_true")) / dbl(col("n")), 6).as("pi_true"))
      .orderBy(col(groupCol))
  }

  /** k-anonymity / l-diversity audit over quasi-identifier columns — the
    * privacy gate a dataset passes before release (Sweeney 2002; Machanavajjhala
    * et al. 2007): every QI combination's group size (re-identification risk
    * when < k) and distinct-sensitive-value count (attribute disclosure when
    * < l, even in large groups). One aggregation pass, group-sized output,
    * exact integers — the flags are the contract, no sampling. */
  def kAnonymityAudit(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      k: Long = 10L,
      l: Long = 2L): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("group_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
      .select(
        qiCols.map(col) ++ Seq(
          col("group_size"),
          col("l_diversity"),
          (col("group_size") < k).as("k_violation"),
          (col("l_diversity") < l).as("l_violation")): _*)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the release-privacy ladder after [[kAnonymityAudit]]'s
    * k/l checks: a QI group can be k-anonymous and l-diverse yet still
    * leak when its sensitive-value DISTRIBUTION differs from the global
    * one (the "everyone in this group earns more" attack). For an ordinal
    * sensitive attribute the distance is the ordered earth-mover's
    * distance D(P,Q) = Σᵢ |cumP_i − cumQ_i| / (k−1) over the k ordered
    * categories.
    *
    * Exact arithmetic: cross-multiplied cumulative counts make each term
    * |N·cumP_i − n_g·cumQ_i| an exact long (the i = k term is identically
    * 0, so summing ALL i is the same sum); ONE division by
    * n_g·N·(k−1) under round(·, 6). k = 1 (a single global category)
    * yields NULL, never a division error.
    *
    * Shape: one (QI, value) count (the only data-sized stage), then a
    * groups × k frame with per-group cumulative windows — k is the
    * sensitive attribute's category count (ordinal ⇒ small by nature).
    * Output per QI group: (qi…, group_size, emd_t, t_violation). */
  def tClosenessAudit(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      t: Double = 0.2): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val W = org.apache.spark.sql.expressions.Window
    val qi = qiCols.map(col)
    val gv = df
      .groupBy(qi :+ col(sensitiveCol).as("sv"): _*)
      .agg(count(lit(1)).as("pc"))
    val qv    = gv.groupBy(col("sv")).agg(sum(col("pc")).as("qc"))
    val keys  = gv.select(qi: _*).distinct()
    val frame = keys
      .crossJoin(broadcast(qv))
      .join(gv, qiCols :+ "sv", "left")
      .select(qi ++ Seq(col("sv"), col("qc"), coalesce(col("pc"), lit(0L)).as("pc")): _*)
    val wcum = W.partitionBy(qi: _*).orderBy(col("sv"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wall = W.partitionBy(qi: _*)
    val dbl  = (c: Column) => c.cast("double")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    frame
      .withColumn("cum_p", sum(col("pc")).over(wcum))
      .withColumn("cum_q", sum(col("qc")).over(wcum))
      .withColumn("n_g", sum(col("pc")).over(wall))
      .withColumn("n_tot", sum(col("qc")).over(wall))
      .groupBy(qi: _*)
      .agg(
        first(col("n_g")).as("group_size"),
        first(col("n_tot")).as("n_total"),
        count(lit(1)).as("k_cats"),
        // DECIMAL(38,0) products: N·cumP at petabyte row counts overflows long
        sum(abs(col("n_tot").cast(dec38) * col("cum_p") - col("n_g").cast(dec38) * col("cum_q")))
          .as("s_num"))
      .select(
        qi ++ Seq(
          col("group_size"),
          col("k_cats"),
          round(
            when(col("k_cats") > 1,
              dbl(col("s_num")) / (dbl(col("group_size")) * dbl(col("n_total")) * dbl(col("k_cats") - 1))),
            6).as("emd_t")): _*)
      .withColumn("t_violation", col("emd_t") > t)
  }

  /** Robust per-group outlier flags via MAD (median absolute deviation):
    * score = |v − median| / (1.4826·MAD), flagged when the rounded score
    * exceeds `k` — the robust cousin of the z-score (TimeSeries), immune
    * to the outliers it hunts inflating its own scale estimate (a single
    * extreme value moves a mean/stddev but not a median/MAD).
    *
    * Determinism discipline (the quantileBucketize contract): medians are
    * EXACT interpolated percentiles rounded HALF_UP to `scale` decimals
    * BEFORE any arithmetic, the deviation v − med is then an exact double
    * subtraction, and the final score is rounded to the same grid before
    * the `> k` comparison — so an external engine replaying
    * quantile_cont lands on bit-identical flags. Groups with MAD = 0
    * (≥ half the group identical) emit no flags — an undefined scale, not
    * an infinite score.
    *
    * Scale shape: two group-keyed aggregation passes (exact percentile
    * buffers are group-sized — swap to percentile_approx beyond memory,
    * same note as quantileBucketize) plus two joins of the tiny per-group
    * stat tables, broadcast by construction. */
  /** Seeded differentially-private count release (ε-DP, Laplace
    * mechanism with sensitivity 1): per-group counts plus Laplace(1/ε)
    * noise derived DETERMINISTICALLY from (group key ⊕ seed) through the
    * portable splitmix64 finalizer — the reproducible-release discipline
    * real pipelines use so a published aggregate can be re-derived and
    * AUDITED bit-for-bit (a fresh seed is a fresh release; the privacy
    * argument treats the seed as secret, exactly like a recorded RNG
    * draw). Inverse-CDF sampling: u = top-53 hash bits / 2⁵³ (an exact
    * dyadic double), noise = −b·sign(u−½)·ln(1 − 2|u−½|), with the ln on
    * the 1e-12 decimal grid and the final sum rounded HALF_UP to 1e-6 —
    * every arithmetic boundary replays cross-engine (the NB-scorer
    * discipline applied to noise).
    *
    * `noiseScale` is the integer b = sensitivity/ε (b = 2 ⟺ ε = 0.5 for
    * counts); integer b keeps the decimal product exact. Keys must be
    * integral (a day number, a bucket id — release tables are keyed by
    * such). One map-side-combined aggregate; the noise is a narrow
    * projection on the key — no second pass, no driver state. */
  def dpNoisyCounts(
      df: DataFrame,
      keyCol: Column,
      keyName: String,
      seed: Long,
      noiseScale: Int): DataFrame = {
    require(noiseScale >= 1, s"noiseScale must be a positive integer, got $noiseScale")
    val dec12 = org.apache.spark.sql.types.DecimalType(20, 12)
    // noise derives from the GROUPED key column (one draw per released row)
    val h = graft.functions.TextFunctions.mix64(col(keyName).cast("long").bitwiseXOR(lit(seed)))
    val u = shiftrightunsigned(h, 11).cast("double") / lit(9007199254740992.0) // 2^53
    val t = u - lit(0.5)
    val s = when(t < 0, lit(-1)).otherwise(lit(1))
    val a = greatest(lit(1.0) - lit(2.0) * abs(t), lit(1.1102230246251565e-16)) // 2^-53 floor
    val noise = round(log(a), 12).cast(dec12) * lit(-noiseScale) * s
    df.groupBy(keyCol.as(keyName))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col(keyName),
        round(col("cnt").cast(dec12) + noise, 6).cast("double").as("noisy_count"))
  }

  def madOutliers(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String,
      k: Double = 3.0,
      scale: Int = 6): DataFrame = {
    require(k > 0.0, s"k must be positive, got $k")
    val v = col(valueCol).cast("double")
    val med = df
      .groupBy(col(groupCol))
      .agg(percentile(v, lit(0.5)).as("med_raw"))
      .select(col(groupCol), round(col("med_raw"), scale).as("med"))
    val dev = df
      .join(broadcast(med), Seq(groupCol))
      .select(col(groupCol), col(idCol), v.as("v"), abs(v - col("med")).as("dev"))
    val mad = dev
      .groupBy(col(groupCol))
      .agg(percentile(col("dev"), lit(0.5)).as("mad_raw"))
      .select(col(groupCol), round(col("mad_raw"), scale).as("mad"))
    dev
      .join(broadcast(mad), Seq(groupCol))
      .filter(col("mad") > 0.0)
      .select(
        col(groupCol),
        col(idCol),
        col("v").as(valueCol),
        round(col("dev") / (lit(1.4826) * col("mad")), scale).as("score"))
      .filter(col("score") > k)
  }

  /** One-way ANOVA F across groups on an INTEGER-GRID value (the parametric
    * sibling of [[kruskalWallis]] — the mean-shift screen a pipeline runs on
    * per-source quality metrics before pooling sources): F = (SSB/(k−1)) /
    * (SSW/(N−k)) with SSB = Σⱼ Sⱼ²/nⱼ − S²/N and SSW = Σx² − Σⱼ Sⱼ²/nⱼ.
    *
    * Exactness: values land per-row in DECIMAL(18,0) (products DECIMAL(37,0),
    * never a wrapping long), so nⱼ / Sⱼ / Σx² aggregate exactly
    * (DECIMAL(38,0) sums ≡ DuckDB HUGEINT); each Sⱼ²/nⱼ term and the grand
    * term snap to the 1e-9 grid before their exact decimal sums, and F is a
    * fixed-order double from those grid values under round(·, 6). One
    * group-by pass + a group-count rollup — map-side combined, no skew
    * exposure beyond the group key itself. */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val dec9  = org.apache.spark.sql.types.DecimalType(30, 9)
    val dec18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // per-row DECIMAL(18,0) so x*x is DECIMAL(37,0) — sums stay exact where a
    // long-typed sum(x*x) would wrap silently past Long.MaxValue (olsFit rule)
    val x = col(valueCol).cast("long").cast(dec18)
    val perGroup = df
      .select(col(groupCol).cast("string").as("g"), x.as("x"))
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("nj"),
        sum(col("x")).cast(dec38).as("sj"),
        sum(col("x") * col("x")).cast(dec38).as("sxxj"))
    val terms = perGroup.agg(
      count(lit(1)).as("n_groups"),
      sum(col("nj")).as("n"),
      sum(col("sj")).cast(dec38).as("s"),
      sum(col("sxxj")).cast(dec38).as("sxx"),
      sum(
        round(col("sj").cast("double") * col("sj").cast("double") / col("nj").cast("double"), 9)
          .cast(dec9)).cast(dec9).as("t9"))
    val nD    = col("n").cast("double")
    val kD    = col("n_groups").cast("double")
    val grand = round(col("s").cast("double") * col("s").cast("double") / nD, 9).cast(dec9)
    val ssb   = col("t9").cast("double") - grand.cast("double")
    val ssw   = col("sxx").cast("double") - col("t9").cast("double")
    terms.select(
      col("n"),
      col("n_groups"),
      (col("n_groups") - 1).as("df1"),
      (col("n") - col("n_groups")).as("df2"),
      round(ssb, 6).as("ssb"),
      round(ssw, 6).as("ssw"),
      round(when(ssw > 0.0 && kD > 1.0, (ssb / (kD - lit(1.0))) / (ssw / (nD - kD))), 6)
        .as("f_stat"))
  }

  /** Welch's unequal-variance t-test between two named groups on an
    * INTEGER-GRID value (the robust two-sample mean comparison — A/B deltas,
    * source-vs-source quality): t = (x̄_a − x̄_b)/√(v_a/n_a + v_b/n_b) with
    * the Welch–Satterthwaite df. Same moment discipline as [[anovaF]]:
    * exact long/decimal n, S, Σx², then one fixed-order double formula per
    * output column under round(·, 6). The normal-approximation p-value uses
    * the engine-wide erfc polynomial (exact cross-engine parity) — a
    * documented approximation that is tight at the df this screen runs at. */
  def welchTTest(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val dec18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // DECIMAL(18,0) per-row → DECIMAL(37,0) products: sum(x*x) stays exact
    // past the ~SF-0.4 point where a long sum of cents² wraps (olsFit rule)
    val x = col(valueCol).cast("long").cast(dec18)
    val m = df
      .select(col(groupCol).cast("string").as("g"), x.as("x"))
      .filter(col("g").isin(groupA, groupB))
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast(dec38).as("s"),
        sum(col("x") * col("x")).cast(dec38).as("sxx"))
    def side(tag: String, name: String) = m
      .filter(col("g") === tag)
      .select(
        col("n").as(s"n_$name"),
        col("s").cast("double").as(s"s_$name"),
        col("sxx").cast("double").as(s"sxx_$name"))
    val j  = side(groupA, "a").crossJoin(side(groupB, "b"))
    def nD(t: String)   = col(s"n_$t").cast("double")
    def mean(t: String) = col(s"s_$t") / nD(t)
    def vr(t: String) =
      (col(s"sxx_$t") - col(s"s_$t") * col(s"s_$t") / nD(t)) / (nD(t) - lit(1.0))
    val sea = vr("a") / nD("a")
    val seb = vr("b") / nD("b")
    val se2 = sea + seb
    val t   = (mean("a") - mean("b")) / sqrt(se2)
    val dfW = se2 * se2 /
      (sea * sea / (nD("a") - lit(1.0)) + seb * seb / (nD("b") - lit(1.0)))
    j.select(
      col("n_a"),
      col("n_b"),
      round(mean("a"), 6).as("mean_a"),
      round(mean("b"), 6).as("mean_b"),
      round(vr("a"), 6).as("var_a"),
      round(vr("b"), 6).as("var_b"),
      round(t, 6).as("t_stat"),
      round(dfW, 6).as("df_welch"),
      normalTwoSidedP(round(t, 6)).as("p_normal"))
  }

  /** Brown–Forsythe variance-homogeneity test (Levene with the MEDIAN
    * center — the robust "are these sources equally noisy" screen that
    * gates pooled-variance assumptions): W = one-way ANOVA F on the
    * absolute deviations zᵢⱼ = |xᵢⱼ − medianⱼ|.
    *
    * The center is the first order statistic whose cumulative count reaches
    * (n+1)/2 (the median for odd n, the upper median for even n), picked via
    * cumulative distinct-value counts — a total, tie-free definition both
    * engines can replay exactly, and on an integer grid it keeps every
    * deviation an exact integer, so the whole statistic inherits
    * [[anovaF]]'s exactness. Two group-by passes + the ANOVA pass; the
    * per-group value histogram is the only extra shuffle. */
  def brownForsythe(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val pool = df.select(col(groupCol).cast("string").as("g"), col(valueCol).cast("long").as("x"))
    val cnt = pool.groupBy(col("g"), col("x")).agg(count(lit(1)).as("c"))
    val wg = W.partitionBy(col("g")).orderBy(col("x"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val cum = cnt.select(
      col("g"), col("x"), col("c"),
      sum(col("c")).over(wg).as("cum"),
      sum(col("c")).over(W.partitionBy(col("g"))).as("nj"))
    val med = cum
      .filter(col("cum") >= (col("nj") + 1) / 2)
      .groupBy(col("g"))
      .agg(min(col("x")).as("med"))
    val dev = pool
      .join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("x") - col("med")).as("z"))
    anovaF(dev, "g", "z")
      .withColumnRenamed("f_stat", "w_stat")
  }

  /** Jarque–Bera normality test on an INTEGER-GRID value: JB = n/6·(S² +
    * (K−3)²/4) from the sample skewness S = m₃/m₂^{3/2} and kurtosis K =
    * m₄/m₂² — the "is this metric even Gaussian-ish" gate before any
    * z-score-based outlier rule is trusted. Raw power sums Σx..Σx⁴
    * aggregate exactly — per-row values land in DECIMAL(10,0) so x² is
    * DECIMAL(21,0), x³ DECIMAL(32,0) and x⁴ DECIMAL(38,0), all under the
    * 38-digit cap for |x| ≤ 3·10⁹ (an in-plan raise_error guards the
    * bound loudly; sums cast DECIMAL(38,0) ≡ HUGEINT, never a wrapping
    * long); central moments and JB are one
    * fixed-order double chain under round(·, 6), and since JB ~ χ²(2) the
    * p-value has the CLOSED form exp(−JB/2) — evaluated on the grid-6 JB,
    * round(·, 9). One aggregation, map-side combined, no shuffle by key. */
  def jarqueBera(df: DataFrame, valueCol: String): DataFrame = {
    val dec10 = org.apache.spark.sql.types.DecimalType(10, 0)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val xl = col(valueCol).cast("long")
    // |x| ≤ 3e9 keeps x⁴ ≤ 8.1e37 inside DECIMAL(38,0); beyond that Spark
    // would null the product silently (skipped by sum) — fail loudly instead
    val x = when(
      abs(xl) > lit(3000000000L),
      raise_error(concat(
        lit("jarqueBera: |x| exceeds the exact-x^4 bound 3e9, got "),
        xl.cast("string"))))
      .otherwise(xl)
      .cast(dec10)
    val x2 = x * x
    val m = df
      .select(x.as("x"), x2.as("x2"), (x2 * x).as("x3"), (x2 * x2).as("x4"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast(dec38).as("s1"),
        sum(col("x2")).cast(dec38).as("s2"),
        sum(col("x3")).cast(dec38).as("s3"),
        sum(col("x4")).cast(dec38).as("s4"))
    val nD = col("n").cast("double")
    val mu = col("s1").cast("double") / nD
    val m2 = col("s2").cast("double") / nD - mu * mu
    val m3 = col("s3").cast("double") / nD - lit(3.0) * mu * (col("s2").cast("double") / nD) +
      lit(2.0) * mu * mu * mu
    val m4 = col("s4").cast("double") / nD - lit(4.0) * mu * (col("s3").cast("double") / nD) +
      lit(6.0) * mu * mu * (col("s2").cast("double") / nD) - lit(3.0) * mu * mu * mu * mu
    val skew = m3 / (m2 * sqrt(m2))
    val kurt = m4 / (m2 * m2)
    val jb   = round(nD / lit(6.0) * (skew * skew + (kurt - lit(3.0)) * (kurt - lit(3.0)) / lit(4.0)), 6)
    m.select(
        col("n"),
        round(mu, 6).as("mean"),
        round(m2, 6).as("m2"),
        round(when(m2 > 0.0, skew), 6).as("skewness"),
        round(when(m2 > 0.0, kurt), 6).as("kurtosis"),
        when(m2 > 0.0, jb).as("jb_stat"),
        round(when(m2 > 0.0, exp(-jb / lit(2.0))), 9).as("p_chi2"))
      .select(
        col("n"), col("mean"), col("m2"), col("skewness"), col("kurtosis"),
        col("jb_stat"), col("p_chi2"))
  }

  /** Friedman test across k treatments over matched blocks (the
    * repeated-measures sibling of [[kruskalWallis]] — "do these treatments
    * keep the same ORDER across blocks", e.g. event types across days,
    * quality metrics across sources): rank treatments WITHIN each complete
    * block (doubled midranks, so ties stay exact integers), then
    * χ²_F = 3·ΣⱼR2ⱼ²/(n·k·(k+1)) − 3n(k+1) from the per-treatment doubled
    * rank sums (the 12·(R/2)² identity folded in). Blocks missing any
    * treatment are dropped (the balanced-design requirement, applied
    * mechanically). Tie correction divides by C = 1 − Σ(t³−t)/(n·k·(k²−1)).
    * Exactness: rank sums and tie mass are exact integers (DECIMAL(38,0)
    * sums of long products); both statistics are one fixed-order double
    * chain under round(·, 6). Input is one row per (block, treatment);
    * shuffles are block-keyed then treatment-keyed, output is one row. */
  def friedmanTest(
      df: DataFrame,
      blockCol: String,
      treatCol: String,
      valueCol: String): DataFrame = {
    val W     = org.apache.spark.sql.expressions.Window
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val pool = df.select(
      col(blockCol).cast("string").as("b"),
      col(treatCol).cast("string").as("t"),
      col(valueCol).cast("long").as("x"))
    val k = pool.select(col("t")).distinct()
      .agg(count(lit(1)).as("k"))
    val complete = pool
      .groupBy(col("b"))
      .agg(count(lit(1)).as("nt"))
      .crossJoin(broadcast(k))
      .filter(col("nt") === col("k"))
      .select(col("b"))
    val rows = pool.join(broadcast(complete), Seq("b"))
    // doubled midranks within each block over the value histogram
    val cnt = rows.groupBy(col("b"), col("x")).agg(count(lit(1)).as("c"))
    val wv  = W.partitionBy(col("b")).orderBy(col("x")).rowsBetween(W.unboundedPreceding, -1)
    val rmap = cnt.select(
      col("b"), col("x"),
      (coalesce(sum(col("c")).over(wv), lit(0L)) * 2 + col("c") + 1).as("r2"))
    val perTreat = rows
      .join(rmap, Seq("b", "x"))
      .groupBy(col("t"))
      .agg(sum(col("r2")).cast(dec38).as("r2j"))
    val terms = perTreat.agg(
      sum(col("r2j") * col("r2j")).cast(dec38).as("sr2sq"))
    val nBlocks = complete.agg(count(lit(1)).as("n"))
    val ties = cnt.agg(
      sum(col("c") * col("c") * col("c") - col("c")).cast(dec38).as("tie_mass"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val chi2 = lit(3.0) * col("sr2sq").cast("double") / (nD * kD * (kD + lit(1.0))) -
      lit(3.0) * nD * (kD + lit(1.0))
    val c = lit(1.0) - col("tie_mass").cast("double") / (nD * kD * (kD * kD - lit(1.0)))
    terms
      .crossJoin(broadcast(nBlocks))
      .crossJoin(broadcast(k))
      .crossJoin(broadcast(ties))
      .select(
        col("n").as("n_blocks"),
        col("k"),
        (col("k") - 1).as("df"),
        round(when(nD > 0.0, chi2), 6).as("chi2"),
        round(when(nD > 0.0 && c > 0.0, chi2 / c), 6).as("chi2_tie_corrected"))
  }

  /** Rank-based ROC AUC of a score column against a binary label — the
    * threshold-free quality-classifier eval (AUC = P(score⁺ > score⁻) with
    * ties at ½, i.e. the normalized Mann–Whitney U): using the same
    * doubled-midrank trick as [[kruskalWallis]] (r2 = 2·rank is an exact
    * integer even at ties), AUC = (Σr2⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻) — ONE
    * exact-integer division pair, round(·, 6). Requires a decimal-grid
    * score so distinct-score grouping is engine-identical. Shuffles once on
    * distinct score values (vocab-sized), then a global ordered prefix sum
    * over that distinct set — swap in a two-phase prefix sum if the score
    * cardinality ever outgrows a window partition. */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val pool = df.select(col(scoreCol).as("s"), col(labelCol).cast("long").as("y"))
    val cnt = pool.groupBy(col("s")).agg(count(lit(1)).as("c"), sum(col("y")).as("pos"))
    val wv = W.orderBy(col("s")).rowsBetween(W.unboundedPreceding, -1)
    val ranked = cnt.select(
      col("pos"),
      col("c"),
      (coalesce(sum(col("c")).over(wv), lit(0L)) * 2 + col("c") + 1).as("r2"))
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val agg = ranked.agg(
      sum(col("pos")).as("n_pos"),
      sum(col("c") - col("pos")).as("n_neg"),
      sum(col("pos").cast(dec38) * col("r2")).cast(dec38).as("sr2_pos"))
    val auc = (col("sr2_pos").cast("double") -
      col("n_pos").cast("double") * (col("n_pos").cast("double") + lit(1.0))) /
      (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double"))
    agg.select(
      col("n_pos"),
      col("n_neg"),
      round(when(col("n_pos") > 0 && col("n_neg") > 0, auc), 6).as("auc"),
      round(when(col("n_pos") > 0 && col("n_neg") > 0, lit(2.0) * auc - lit(1.0)), 6).as("gini"))
  }

  /** Theil T inequality index with its between/within decomposition — the
    * property [[giniCoefficient]] lacks: T = T_between + T_within EXACTLY,
    * so source-level concentration separates from within-source
    * concentration (the "is the imbalance across nations or inside them"
    * read): T = Σᵢ sᵢ·ln(sᵢ·n), T_B = Σ_g S_g·ln(S_g·n/n_g), T_W = Σᵢ
    * sᵢ·ln((xᵢ/X_g)·n_g) — the within term folded to ONE entity-level sum
    * (S_g·Σ(x/X_g)ln(·) telescopes through the shares). Zero-value
    * entities drop (ln 0), documented. Values on the integer cent grid
    * aggregate exactly; every term snaps to the 1e-12 grid before exact
    * decimal sums; outputs round at 6 (the additivity identity holds to
    * the term grid). One entity pass + a group-sized rollup. */
  def theilDecompose(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val dec12 = org.apache.spark.sql.types.DecimalType(24, 12)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val ent = df
      .select(col(groupCol).cast("string").as("g"), col(valueCol).cast("long").as("x"))
      .filter(col("x") > 0L)
    val grp = ent.groupBy(col("g")).agg(count(lit(1)).as("ng"), sum(col("x")).cast(dec38).as("xg"))
    val tot = grp.agg(
      sum(col("ng")).as("n"),
      count(lit(1)).as("n_groups"),
      sum(col("xg")).cast(dec38).as("xt"))
    val nD = col("n").cast("double")
    val si = col("x").cast("double") / col("xt").cast("double")
    val withStats = ent
      .join(broadcast(grp), Seq("g"))
      .crossJoin(broadcast(tot))
    val entityTerms = withStats.agg(
      sum(round(si * log(si * nD), 12).cast(dec12)).cast(dec12).as("t12"),
      sum(
        round(
          si * log(col("x").cast("double") / col("xg").cast("double") * col("ng").cast("double")),
          12).cast(dec12)).cast(dec12).as("tw12"))
    val sg = col("xg").cast("double") / col("xt").cast("double")
    val betweenTerms = grp
      .crossJoin(broadcast(tot))
      .agg(
        sum(
          round(sg * log(sg * (nD / col("ng").cast("double"))), 12).cast(dec12))
          .cast(dec12).as("tb12"))
    entityTerms
      .crossJoin(broadcast(betweenTerms))
      .crossJoin(broadcast(tot))
      .select(
        col("n"),
        col("n_groups"),
        round(col("t12").cast("double"), 6).as("theil_total"),
        round(col("tb12").cast("double"), 6).as("theil_between"),
        round(col("tw12").cast("double"), 6).as("theil_within"))
  }

  /** Mutual information between two categorical columns (in nats), plus
    * the normalized variant MI/min(H(A),H(B)) — the dependence screen
    * that catches what [[cramersV]]'s χ²-based effect size underweights
    * (MI sees the full joint, not just the quadratic deviation): MI =
    * Σ p(a,b)·ln(p(a,b)/(p(a)p(b))). Counts are exact integers from ONE
    * joint aggregation (marginals roll up from it); every p·ln term snaps
    * to the 1e-12 grid before exact decimal sums ([[jsDivergence]]'s
    * contract); outputs round at 6. Joint-cardinality-sized after the one
    * data pass. */
  def mutualInformation(df: DataFrame, colA: String, colB: String): DataFrame = {
    val dec12 = org.apache.spark.sql.types.DecimalType(20, 12)
    val joint = df
      .select(col(colA).cast("string").as("a"), col(colB).cast("string").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("nab"))
    val ma  = joint.groupBy(col("a")).agg(sum(col("nab")).as("na"))
    val mb  = joint.groupBy(col("b")).agg(sum(col("nab")).as("nb"))
    val tot = joint.agg(sum(col("nab")).as("n"))
    val nD  = col("n").cast("double")
    val pab = col("nab").cast("double") / nD
    val pa  = col("na").cast("double") / nD
    val pb  = col("nb").cast("double") / nD
    // joint-cardinality-sized; eager-checkpointed because three small
    // aggregations (MI, H(A), H(B)) fan out from it
    val withP = joint
      .join(broadcast(ma), Seq("a"))
      .join(broadcast(mb), Seq("b"))
      .crossJoin(broadcast(tot))
      .localCheckpoint(true)
    val mi12 = withP
      .agg(sum(round(pab * log(pab / (pa * pb)), 12).cast(dec12)).cast(dec12).as("mi12"))
    def ent(mCol: String, nCol: String) = withP
      .select(col(mCol), col(nCol), col("n")).distinct()
      .agg(
        sum(
          round(-(col(nCol).cast("double") / nD) * log(col(nCol).cast("double") / nD), 12)
            .cast(dec12)).cast(dec12).as("h12"))
    val ha = ent("a", "na")
    val hb = ent("b", "nb")
    mi12
      .crossJoin(broadcast(ha.select(col("h12").as("ha12"))))
      .crossJoin(broadcast(hb.select(col("h12").as("hb12"))))
      .crossJoin(broadcast(tot))
      .select(
        col("n"),
        round(col("mi12").cast("double"), 6).as("mi"),
        round(col("ha12").cast("double"), 6).as("h_a"),
        round(col("hb12").cast("double"), 6).as("h_b"),
        round(
          when(least(col("ha12"), col("hb12")).cast("double") > 0.0,
            col("mi12").cast("double") / least(col("ha12"), col("hb12")).cast("double")),
          6).as("mi_normalized"))
  }

  /** Cramér–von Mises two-sample statistic in its tie-robust ECDF form —
    * the L2 sibling of [[ksTestPairs]]'s sup-distance (KS sees only the
    * single worst gap; CvM integrates EVERY gap, so it catches broad mild
    * shifts KS underweights): T = n₁n₂/(n₁+n₂)² · Σ_v c_v·(F₁(v) − F₂(v))²
    * over the pooled distinct values, c_v = pooled count at v (the
    * discrete dH of the pooled ECDF — exact under ties by construction).
    * Counts and cumulative counts are exact integers; each per-value term
    * snaps to the 1e-12 grid before the exact decimal sum; T rounds at 6.
    * One value-histogram aggregation + one ordered prefix pass over the
    * distinct-value axis. */
  def cramerVonMises(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val W     = org.apache.spark.sql.expressions.Window
    val dec12 = org.apache.spark.sql.types.DecimalType(24, 12)
    val pool = df
      .select(col(groupCol).cast("string").as("g"), col(valueCol).cast("long").as("v"))
      .filter(col("g").isin(groupA, groupB))
    val cnt = pool.groupBy(col("v")).agg(
      sum(when(col("g") === groupA, 1L).otherwise(0L)).as("c1"),
      sum(when(col("g") === groupB, 1L).otherwise(0L)).as("c2"))
    val wv = W.orderBy(col("v")).rowsBetween(W.unboundedPreceding, W.currentRow)
    val cum = cnt.select(
      col("c1"), col("c2"),
      sum(col("c1")).over(wv).as("cum1"),
      sum(col("c2")).over(wv).as("cum2"),
      sum(col("c1")).over(W.partitionBy()).as("n1"),
      sum(col("c2")).over(W.partitionBy()).as("n2"))
    val gap = col("cum1").cast("double") / col("n1").cast("double") -
      col("cum2").cast("double") / col("n2").cast("double")
    val agg = cum.agg(
      max(col("n1")).as("n1"),
      max(col("n2")).as("n2"),
      sum(round((col("c1") + col("c2")).cast("double") * gap * gap, 12).cast(dec12))
        .cast(dec12).as("s12"))
    val n1D = col("n1").cast("double")
    val n2D = col("n2").cast("double")
    agg.select(
      col("n1"),
      col("n2"),
      round(
        n1D * n2D / ((n1D + n2D) * (n1D + n2D)) * col("s12").cast("double"),
        6).as("t_stat"))
  }

  /** Murphy decomposition of the Brier score over binned forecasts — the
    * calibration-vs-sharpness read of a probabilistic classifier (Murphy
    * 1973): with forecasts on an integer grid f = s/scale binned by
    * ⌊s/binWidth⌋, BS = REL − RES + UNC + WBV, where REL = Σn_b(f̄_b−ȳ_b)²/N
    * (calibration error — smaller is better), RES = Σn_b(ȳ_b−ȳ)²/N
    * (sharpness — larger is better), UNC = ȳ(1−ȳ) (the data's own
    * irreducible term), and the two within-bin terms that close the
    * identity for raw (unbinned) forecasts under COARSE bins (Stephenson
    * et al. 2008): WBV = ΣΣ(f_i−f̄_b)²/N and WBC = ΣΣ(f_i−f̄_b)(y_i−ȳ_b)/N,
    * with BS = REL − RES + UNC + WBV − 2·WBC. The raw BS itself is ONE exact
    * integer: Σ(s − scale·y)²/(scale²·N). Per-bin REL/RES/WBV terms snap to
    * the 1e-12 grid before exact decimal sums (the engine's fixed-order
    * contract); every emitted float rounds at 6. One bin-keyed aggregation
    * (bin-count-sized after), no joins on data. */
  def brierDecompose(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      scale: Int,
      binWidth: Int): DataFrame = {
    require(scale >= 2 && binWidth >= 1 && binWidth <= scale,
      s"need scale >= 2 and 1 <= binWidth <= scale, got $scale/$binWidth")
    val dec12 = org.apache.spark.sql.types.DecimalType(24, 12)
    val dec18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val pool = df.select(col(scoreCol).cast("long").as("s"), col(labelCol).cast("long").as("y"))
    // floor(s/w), not truncate-toward-zero: matches DuckDB's `//` on
    // negative score grids too. DECIMAL(18,0) per-row products keep the
    // power sums exact where a long sum would wrap (olsFit rule).
    val sD = col("s").cast(dec18)
    val yD = col("y").cast(dec18)
    val bins = pool
      .groupBy(floor(col("s").cast("double") / binWidth).cast("long").as("b"))
      .agg(
        count(lit(1)).as("nb"),
        sum(sD).cast(dec38).as("sb"),
        sum(col("y")).as("yb"),
        sum(sD * sD).cast(dec38).as("ssb"),
        sum(sD * yD).cast(dec38).as("syb"))
    val tot = bins.agg(
      sum(col("nb")).as("n"),
      sum(col("yb")).as("ytot"),
      (sum(col("ssb")).cast(dec38).cast("double") -
        lit(2.0 * scale) * sum(col("syb")).cast(dec38).cast("double") +
        lit(scale.toDouble * scale) * sum(col("yb")).cast("double")).as("sq_num"))
    val nbD   = col("nb").cast("double")
    val fbar  = col("sb").cast("double") / (nbD * scale)
    val ybarB = col("yb").cast("double") / nbD
    val ybar  = col("ytot").cast("double") / col("n").cast("double")
    val terms = bins
      .crossJoin(broadcast(tot))
      .agg(
        first(col("n")).as("n"),
        first(col("ytot")).as("ytot"),
        first(col("sq_num")).as("sq_num"),
        sum(round(nbD * (fbar - ybarB) * (fbar - ybarB), 12).cast(dec12)).cast(dec12).as("rel12"),
        sum(round(nbD * (ybarB - ybar) * (ybarB - ybar), 12).cast(dec12)).cast(dec12).as("res12"),
        sum(
          round(
            (col("ssb").cast("double") -
              col("sb").cast("double") * col("sb").cast("double") / nbD) /
              (scale.toDouble * scale),
            12).cast(dec12)).cast(dec12).as("wbv12"),
        sum(
          round(
            (col("syb").cast("double") -
              col("sb").cast("double") * col("yb").cast("double") / nbD) /
              scale.toDouble,
            12).cast(dec12)).cast(dec12).as("wbc12"),
        count(lit(1)).as("n_bins"))
    val nD = col("n").cast("double")
    terms
      .select(
        col("n"),
        col("n_bins"),
        round(col("sq_num") / (lit(scale.toDouble * scale) * nD), 6).as("brier"),
        round(col("rel12").cast("double") / nD, 6).as("reliability"),
        round(col("res12").cast("double") / nD, 6).as("resolution"),
        round(ybar * (lit(1.0) - ybar), 6).as("uncertainty"),
        round(col("wbv12").cast("double") / nD, 6).as("within_bin_var"),
        round(col("wbc12").cast("double") / nD, 6).as("within_bin_cov"))
  }

  /** McNemar's paired test between two classifiers scored on the SAME rows
    * (Edwards' continuity-corrected form) — the right comparison when both
    * models saw identical inputs, where an unpaired test wastes the
    * pairing: only the DISCORDANT cells matter, b = A right / B wrong,
    * c = A wrong / B right, χ² = (|b−c|−1)²/(b+c) ~ χ²(1). Since χ²(1) is
    * the square of a standard normal, the p-value reuses the engine-wide
    * erfc polynomial on √χ². All four agreement cells are exact integers
    * from one conditional aggregation; χ² and p are one fixed-order chain
    * under round(·, 6)/(·, 9). Input: one row per item with two boolean
    * prediction columns and the boolean truth. */
  def mcnemarTest(
      df: DataFrame,
      predACol: String,
      predBCol: String,
      labelCol: String): DataFrame = {
    val aOk = col(predACol) === col(labelCol)
    val bOk = col(predBCol) === col(labelCol)
    val cells = df.agg(
      sum(when(aOk && bOk, 1L).otherwise(0L)).as("both_right"),
      sum(when(aOk && !bOk, 1L).otherwise(0L)).as("b_cell"),
      sum(when(!aOk && bOk, 1L).otherwise(0L)).as("c_cell"),
      sum(when(!aOk && !bOk, 1L).otherwise(0L)).as("both_wrong"))
    val bD = col("b_cell").cast("double")
    val cD = col("c_cell").cast("double")
    val chi2 = round(
      (abs(bD - cD) - lit(1.0)) * (abs(bD - cD) - lit(1.0)) / (bD + cD), 6)
    cells.select(
      col("both_right"),
      col("b_cell"),
      col("c_cell"),
      col("both_wrong"),
      when(col("b_cell") + col("c_cell") > 0, chi2).as("chi2"),
      when(col("b_cell") + col("c_cell") > 0, normalTwoSidedP(sqrt(chi2))).as("p_value"))
  }

  /** ℓ-diversity audit per quasi-identifier class (Machanavajjhala et al.
    * 2007 — the refinement k-anonymity misses: a class can be k-large yet
    * leak its sensitive value when all k rows share it): per QI class,
    * distinct-ℓ (count of distinct sensitive values) and entropy-ℓ =
    * exp(−Σ p ln p) — the effective number of sensitive values an observer
    * faces. Counts are exact integers; each p·ln p term snaps to the 1e-12
    * grid before the exact decimal sum (the [[jsDivergence]] discipline),
    * entropy-ℓ is exp of the grid sum under round(·, 6). Two group-by
    * passes, class-sized output, flagged rows = classes under the bar. */
  def lDiversityAudit(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      minL: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(minL >= 1, s"minL must be positive, got $minL")
    val dec12 = org.apache.spark.sql.types.DecimalType(20, 12)
    val qis = quasiCols.map(c => col(c).cast("string").as(c))
    val cells = df
      .select(qis :+ col(sensitiveCol).cast("string").as("sv"): _*)
      .groupBy(quasiCols.map(col) :+ col("sv"): _*)
      .agg(count(lit(1)).as("c"))
    val totals = cells
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("c")).as("class_n"), count(lit(1)).as("distinct_l"))
    val withP = cells
      .join(totals, quasiCols)
      .select(
        (quasiCols.map(col) :+
          round(
            (col("c").cast("double") / col("class_n").cast("double")) *
              log(col("c").cast("double") / col("class_n").cast("double")),
            12).cast(dec12).as("plogp")): _*)
    val ent = withP
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("plogp")).cast(dec12).as("hsum"))
    totals
      .join(ent, quasiCols)
      .select(
        (quasiCols.map(col) :+ col("class_n") :+ col("distinct_l") :+
          round(exp(-col("hsum").cast("double")), 6).as("entropy_l") :+
          (col("distinct_l") < minL).as("below_distinct_l") :+
          (round(exp(-col("hsum").cast("double")), 6) < minL.toDouble).as("below_entropy_l")): _*)
  }
}
