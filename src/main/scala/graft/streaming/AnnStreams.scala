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
