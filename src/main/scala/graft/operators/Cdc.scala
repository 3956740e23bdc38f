package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture application: MERGE a batch of upserts/deletes into a
  * base table by key — the operation that keeps a continuously-refreshed
  * training corpus current without rewriting it from scratch.
  *
  * No reference counterpart (the reference's PUT is whole-dataset replace,
  * master.go:72-113; SURVEY.md §2a): this is the standard lakehouse MERGE
  * (Armbrust et al. 2020, Delta Lake) re-expressed as a pure dataflow —
  * delta ∪ (base ⟕̸ delta) — so it needs no table format support.
  *
  * Scale design (100 TB): ONE keyed shuffle shape. The anti-join hashes on
  * the merge key; when the delta is batch-small (the common CDC case) Spark
  * broadcasts it and the base table never shuffles at all — the merge
  * degenerates to a broadcast-filter + union, a single scan of the base.
  * Neither side ever collects to the driver.
  */
object Cdc {

  /** Upsert `delta` into `base` on `keys`: rows of `base` whose key appears
    * in `delta` are replaced by the delta row; new delta keys are inserted;
    * all other base rows pass through. Both inputs must share a schema
    * unless `allowEvolution` is set. `delta` must be key-unique (enforce
    * upstream with [[DataQuality.duplicateKeys]]) — duplicate delta keys
    * would both survive, which is ambiguous CDC.
    *
    * `allowEvolution = true` is Delta-style automatic schema evolution:
    * columns new in the delta are added to the result (null for untouched
    * base rows), columns the delta dropped are kept (null for delta rows)
    * — the merge never loses a column, matching lakehouse MERGE WITH
    * SCHEMA EVOLUTION semantics. Key columns must exist on both sides
    * either way. */
  def mergeInto(
      base: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      allowEvolution: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "mergeInto needs at least one key column")
    keys.foreach { k =>
      require(
        base.columns.contains(k) && delta.columns.contains(k),
        s"key column $k must exist on both sides")
    }
    if (!allowEvolution) {
      require(
        base.columns.sorted.sameElements(delta.columns.sorted),
        s"schema mismatch (pass allowEvolution=true to evolve): base ${base.columns.mkString(",")} vs delta ${delta.columns.mkString(",")}")
      // same-named columns must agree in TYPE too, up to the widening
      // unionByName itself performs (e.g. decimal precision growth from a
      // price*2 delta — accepted by design); a same-named column with an
      // irreconcilable type fails HERE, not as a raw union analysis error
      val deltaTypes = delta.schema.map(f => f.name -> f.dataType).toMap
      val clash = base.schema.flatMap { f =>
        val dt = deltaTypes(f.name)
        if (dt == f.dataType ||
          org.apache.spark.sql.graftbridge.Bridge.widerType(f.dataType, dt).isDefined) None
        else Some(s"${f.name}: base ${f.dataType.simpleString} vs delta ${dt.simpleString}")
      }
      require(
        clash.isEmpty,
        s"incompatible column types (no common wider type): ${clash.mkString("; ")}")
    }
    val untouched = base.join(delta.select(keys.map(col): _*), keys, "left_anti")
    if (allowEvolution) delta.unionByName(untouched, allowMissingColumns = true)
    else delta.unionByName(untouched)
  }

  /** Upsert + tombstone application: like [[mergeInto]], but delta rows with
    * `deleteCol` = true delete the key instead of replacing it. */
  def applyChanges(
      base: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      deleteCol: String): DataFrame = {
    val survivors = delta.filter(!col(deleteCol)).drop(deleteCol)
    val allKeys   = delta.select(keys.map(col): _*)
    survivors.unionByName(base.join(allKeys, keys, "left_anti"))
  }

  /** SCD type-2 history application: `current` carries versioned rows
    * (attribute columns + [validFromCol, validToCol], open rows have a null
    * validTo); `delta` carries the new attribute state per key stamped
    * `tsCol`. A delta row whose attributes differ from the key's open row
    * CLOSES that row (validTo = ts) and opens a new version (validFrom =
    * ts); an identical delta row is a no-op; an unseen key opens its first
    * version. Closed history rows always pass through untouched. Delta must
    * be key-unique (same contract as [[mergeInto]]).
    *
    * Scale shape: ONE key-hashed join between the OPEN slice and the delta
    * (broadcast when the delta is batch-small), then a narrow per-row
    * explode emitting 1–2 output rows — never one pass per outcome class
    * over the join. Closed history is a pure pass-through union (no
    * shuffle). */
  def scd2Apply(
      current: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      tsCol: String,
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame = {
    require(keys.nonEmpty, "scd2Apply needs at least one key column")
    val attrs = current.columns.toSeq.filterNot(c =>
      keys.contains(c) || c == validFromCol || c == validToCol)
    require(
      delta.columns.sorted.sameElements((keys ++ attrs :+ tsCol).sorted),
      s"delta must carry keys + attrs + $tsCol: expected ${(keys ++ attrs :+ tsCol).mkString(",")}, got ${delta.columns.mkString(",")}")

    val open   = current.filter(col(validToCol).isNull).withColumn("__o", lit(true))
    val closed = current.filter(col(validToCol).isNotNull)
    val d = delta.select(
      keys.map(col) ++ attrs.map(a => col(a).as(s"__d_$a")) ++
        Seq(col(tsCol).as("__d_ts"), lit(true).as("__d")): _*)

    val j = open.join(d, keys, "full_outer")
    val changed = attrs.map(a => !(col(a) <=> col(s"__d_$a"))).reduce(_ || _)
    val oPresent = col("__o").isNotNull
    val dPresent = col("__d").isNotNull

    // candidate output rows per joined row, emitted in one narrow pass:
    //   survive  — open row untouched (no delta, or identical delta)
    //   close    — open row sealed at the delta timestamp
    //   reopen   — new version from the delta attributes
    def out(attrSrc: String => org.apache.spark.sql.Column, vf: org.apache.spark.sql.Column, vt: org.apache.spark.sql.Column) =
      struct(attrs.map(a => attrSrc(a).as(a)) ++ Seq(vf.as(validFromCol), vt.as(validToCol)): _*)
    val survive = when(oPresent && (!dPresent || !changed), out(a => col(a), col(validFromCol), lit(null).cast(open.schema(validToCol).dataType)))
    val close   = when(oPresent && dPresent && changed, out(a => col(a), col(validFromCol), col("__d_ts")))
    val reopen  = when(dPresent && (!oPresent || changed), out(a => col(s"__d_$a"), col("__d_ts"), lit(null).cast(open.schema(validToCol).dataType)))

    val exploded = j
      .select(
        keys.map(col) :+ explode(filter(array(survive, close, reopen), x => x.isNotNull)).as("__r"): _*)
      .select(keys.map(col) ++ attrs.map(a => col(s"__r.$a")) ++
        Seq(col(s"__r.$validFromCol"), col(s"__r.$validToCol")): _*)
    closed.select(keys.map(col) ++ attrs.map(col) ++ Seq(col(validFromCol), col(validToCol)): _*)
      .unionByName(exploded)
  }

  /** Incremental aggregate maintenance (the materialized-view refresh
    * identity): given a stored grouped aggregate `base` (keys → n_rows,
    * sums) and a CDC delta of fact rows tagged `opCol` ∈ {'I', 'D'}
    * (an update is delete-old + insert-new, the [[applyChanges]]
    * convention), produce the refreshed aggregate WITHOUT rescanning the
    * fact table: fold the delta into signed per-key contributions
    * (+row for I, −row for D — count and every sum negate together), one
    * full-outer merge with the stored aggregate, drop keys whose count
    * reaches zero. COUNT and SUM are self-maintainable — this is why
    * incremental view maintenance restricts to them (MIN/MAX are not:
    * deleting the current extremum needs the base table).
    *
    * Correctness identity (the oracle checks it end to end): refresh(base
    * over F, delta D) ≡ full aggregate over (F minus D-deletes plus
    * D-inserts). Sums must be DECIMAL on both sides — float sums would
    * make the identity order-dependent. Scale shape: the delta aggregates
    * map-side to key-cardinality rows; the merge joins two key-sized
    * frames (never the facts); at warehouse scale this is the difference
    * between touching GB and touching TB per refresh. */
  def incrementalAggRefresh(
      base: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      opCol: String,
      countCol: String,
      sumCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    val sign = when(col(opCol) === "I", lit(1L))
      .when(col(opCol) === "D", lit(-1L))
      .otherwise(raise_error(concat(lit(s"unknown $opCol value: "), col(opCol))))
    // sums contribute via NEGATION, not sign multiplication: -decimal keeps
    // the exact type, while bigint×decimal(18,2) hits Spark's 38-precision
    // cap and silently drops the scale (the corpus_dsir_weights trap)
    val dAgg = delta
      .groupBy(keys.map(col): _*)
      .agg(
        sum(sign).as("__dn"),
        sumCols.map(c =>
          sum(when(col(opCol) === "I", col(c)).otherwise(-col(c))).as(s"__d_$c")): _*)
    // using-columns full outer: Spark emits ONE already-coalesced column
    // per join key, so the key projection below is unambiguous
    val merged = base.join(dAgg, keys, "full_outer")
    val refreshedCount = coalesce(col(countCol), lit(0L)) + coalesce(col("__dn"), lit(0L))
    merged
      .select(
        keys.map(col) ++
          Seq(refreshedCount.as(countCol)) ++
          sumCols.map(c =>
            (coalesce(col(c), lit(0).cast(base.schema(c).dataType)) +
              coalesce(col(s"__d_$c"), lit(0).cast(base.schema(c).dataType))).as(c)): _*)
      .filter(col(countCol) > 0)
  }
}
