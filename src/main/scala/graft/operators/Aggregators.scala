package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregators — the engine's open-ended per-key aggregation surface.
  *
  * The reference's single aggregation primitive is "feed the whole group to
  * an arbitrary exe" (src/juice_helpers.go:86-125), which is maximally
  * general and minimally scalable (whole-group materialization, no partial
  * aggregation). SURVEY.md §2e maps that generality to typed Aggregators:
  * mergeable partial state, map-side combine, bounded memory — with
  * MapleJuice.juiceExe kept for true any-language UDFs.
  */
object Aggregators {

  /** Bounded top-k per group by score (desc, id tiebreak): the buffer is a
    * size-capped sorted vector, so group size never matters — memory is
    * O(k) and partials merge associatively. */
  final class TopK(k: Int) extends Aggregator[(Long, Double), Vector[(Double, Long)], Seq[Long]] {
    override def zero: Vector[(Double, Long)] = Vector.empty

    private def insert(buf: Vector[(Double, Long)], x: (Double, Long)): Vector[(Double, Long)] = {
      val merged = (buf :+ x).sortBy { case (s, id) => (-s, id) }
      if (merged.length > k) merged.take(k) else merged
    }

    override def reduce(buf: Vector[(Double, Long)], in: (Long, Double)): Vector[(Double, Long)] =
      insert(buf, (in._2, in._1))

    override def merge(a: Vector[(Double, Long)], b: Vector[(Double, Long)]): Vector[(Double, Long)] =
      b.foldLeft(a)(insert)

    override def finish(buf: Vector[(Double, Long)]): Seq[Long] = buf.map(_._2)

    override def bufferEncoder: Encoder[Vector[(Double, Long)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]]              = ExpressionEncoder()
  }

  final case class Welford(n: Long, mean: Double, m2: Double)

  /** Single-pass mergeable mean/variance (Chan et al. parallel Welford):
    * numerically stable, O(1) state, exact partial-aggregation semantics —
    * what the reference's line-count/score exes would become here. */
  final class WelfordAgg extends Aggregator[Double, Welford, (Double, Double, Long)] {
    override def zero: Welford = Welford(0L, 0.0, 0.0)

    override def reduce(s: Welford, x: Double): Welford = {
      val n1    = s.n + 1
      val delta = x - s.mean
      val mean1 = s.mean + delta / n1
      Welford(n1, mean1, s.m2 + delta * (x - mean1))
    }

    override def merge(a: Welford, b: Welford): Welford =
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n     = a.n + b.n
        val delta = b.mean - a.mean
        Welford(n, a.mean + delta * b.n / n, a.m2 + b.m2 + delta * delta * a.n * b.n / n)
      }

    /** (mean, sample variance, count) */
    override def finish(s: Welford): (Double, Double, Long) =
      (s.mean, if (s.n > 1) s.m2 / (s.n - 1) else Double.NaN, s.n)

    override def bufferEncoder: Encoder[Welford]                  = Encoders.product[Welford]
    override def outputEncoder: Encoder[(Double, Double, Long)]   = ExpressionEncoder()
  }

  /** Order-insensitive string reduce with bounded output: the `cap`
    * lexicographically-SMALLEST distinct values of the group (a scalable,
    * deterministic stand-in for "concatenate the group", which at 100 TB
    * must be bounded). Keeping the smallest — rather than the first seen —
    * makes the result independent of partitioning and arrival order. */
  final class DistinctSample(cap: Int) extends Aggregator[String, Set[String], Seq[String]] {
    override def zero: Set[String] = Set.empty
    override def reduce(s: Set[String], x: String): Set[String] =
      if (s.contains(x)) s
      else if (s.size < cap) s + x
      else { val worst = s.max; if (x < worst) s - worst + x else s }
    override def merge(a: Set[String], b: Set[String]): Set[String] =
      (a ++ b).toSeq.sorted.take(cap).toSet
    override def finish(s: Set[String]): Seq[String]         = s.toSeq.sorted
    override def bufferEncoder: Encoder[Set[String]]         = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[String]]         = ExpressionEncoder()
  }
}
