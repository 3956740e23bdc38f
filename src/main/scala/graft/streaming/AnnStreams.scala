package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Similarity

/** Online ANN serving: a STREAM of query vectors answered from the
  * prebuilt IVF cell index — the product shape behind every
  * retrieval-augmented pipeline (the index is built offline by
  * [[Similarity.ivfAssign]], persisted through the catalog, and queries
  * arrive continuously; rebuilding per query batch is the anti-pattern
  * this module exists to avoid).
  *
  * Plan shape per micro-batch: the native codegen'd
  * [[graft.functions.VecNearestCells]] probe explodes each query into its
  * `nprobe` cells (no boxing, same expression as the batch path), a
  * STREAM-STATIC equi-join on `cell` pulls only the probed cells' index
  * rows (the static side is a plain DataFrame — Catalyst plans the join
  * per batch, broadcasting the stream side when small), exact cosine is
  * the SAME column arithmetic as the batch scorer (bit parity by
  * construction), and the per-query top-k runs as a bounded heap in a
  * stateless flatMapGroupsWithState fold (append mode; each query is
  * one-shot within its batch, so no state survives — the operator exists
  * because window functions don't run on streams, not to hold anything).
  *
  * StreamingSpec pins stream output ≡ [[Similarity.ivfSearch]] rows
  * bit-for-bit on the same queries, index and model.
  */
object AnnStreams {

  final case class ServedHit(query_id: Long, neighbor_id: Long, sim: Double, rn: Int)

  /** LIVE serving over a catalog-persisted index: every micro-batch
    * re-resolves the index state — an [[graft.operators.AnnIndex.append]]
    * or [[graft.operators.AnnIndex.deleteVectors]] issued while the
    * stream runs lands on the NEXT batch, no rebuild, no restart.
    *
    * Why a separate entry point: [[ivfServeStream]]'s stream-static join
    * re-EXECUTES its static side per batch, but the static plan is FIXED
    * at stream start — `readTable` bakes the manifest version's file list
    * into the frame and the tombstone anti-join only exists if the
    * tombstone table existed at construction, so maintenance after start
    * is structurally invisible there (snapshot semantics, documented at
    * [[graft.operators.AnnIndex.liveIndex]]). foreachBatch is the
    * mechanism that makes liveness real: each batch is a static frame, so
    * the full BATCH search path — fresh generation listing, partition-
    * pruned probes, tombstone anti-join, filtered rerank — runs against
    * the catalog as it is NOW, and stream results stay bit-identical to
    * what [[graft.operators.AnnIndex.search]] would return at that
    * moment. Per-batch planning cost is a metadata listing + the same
    * model-sized centroid load the batch path pays — nothing data-sized.
    *
    * `sink` receives each batch's hits (columns: query id, neighbor_id,
    * sim, rn — the batch searcher's schema) plus the batch id; callers
    * start the returned writer (`.start()` / trigger of their choice). */
  def ivfServeStreamLive(
      queryStream: DataFrame,
      cat: graft.sources.Catalog,
      name: String,
      k: Int,
      nprobe: Int = 4)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    queryStream.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      sink(graft.operators.AnnIndex.search(cat, name, batch.toDF(), k, nprobe), batchId)
    }

  def ivfServeStream(
      queryStream: DataFrame,
      cellIndex: DataFrame,
      centroids: Array[Array[Double]],
      k: Int,
      nprobe: Int = 4): Dataset[ServedHit] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = queryStream.sparkSession
    import spark.implicits._
    val probes = graft.functions.VectorFunctions
      .vec_nearest_cells(col("qv"), centroids, nprobe)
    val q = queryStream
      .select(col("vec_id").as("query_id"), col("embedding").cast("array<double>").as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
      .withColumn("cell", explode(probes))
    // stream-static join: only the probed cells' rows are read per batch
    val c = cellIndex.select(col("cell"), col("neighbor_id"), col("cv"), col("cn"))
    val sim = Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))
    val scored = q
      .join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(sim, 9).as("sim9"),
        round(sim, 6).as("sim"))
      .as[(Long, Long, Double, Double)]
    scored
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (qid: Long, rows: Iterator[(Long, Long, Double, Double)], state: GroupState[Int]) => {
          // multi-assigned vectors meet a query in several shared cells with
          // identical (sim9, sim) — dedupe by neighbor exactly like the
          // batch scorer's groupBy...max, then heap-cut with the batch tie
          // order (sim9 desc, neighbor_id asc)
          val best = scala.collection.mutable.LongMap.empty[(Double, Double)]
          rows.foreach { case (_, nid, s9, s6) =>
            best.get(nid) match {
              case Some((old9, _)) if old9 >= s9 => ()
              case _                             => best.update(nid, (s9, s6))
            }
          }
          best.toSeq
            .map { case (nid, (s9, s6)) => (nid, s9, s6) }
            .sortBy { case (nid, s9, _) => (-s9, nid) }
            .take(k)
            .zipWithIndex
            .map { case ((nid, _, s6), i) => ServedHit(qid, nid, s6, i + 1) }
            .iterator
        })
  }
}
