package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The typed `Aggregator[IN, BUF, OUT]` slot SURVEY §2.10 reserves for
  * financial aggregates. [[NetBalance]] is the first resident: a
  * single-pass debit/credit netting that also carries the totals —
  * what trial_balance.py computes with two sums and a subtraction,
  * fused into one partial-aggregable buffer (one shuffle column set
  * instead of two aggregates at 100 TB). */
object FinancialAggregators {

  final case class DebitCredit(debit: Double, credit: Double)
  final case class BalanceResult(
      totalDebits: Double, totalCredits: Double, netBalance: Double)

  /** Σdebit, Σcredit, and net in one buffer. */
  object NetBalance extends Aggregator[DebitCredit, (Double, Double), BalanceResult] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: DebitCredit): (Double, Double) =
      (b._1 + a.debit, b._2 + a.credit)
    def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    def finish(b: (Double, Double)): BalanceResult =
      BalanceResult(b._1, b._2, b._1 - b._2)
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[BalanceResult] = Encoders.product[BalanceResult]
  }

  /** Weighted roll-up: Σ weight×value (calculation-arc semantics,
    * xbrl_graph.py association weights ±1.0). */
  final case class Weighted(weight: Double, value: Double)
  object WeightedSum extends Aggregator[Weighted, Double, Double] {
    def zero: Double = 0.0
    def reduce(b: Double, a: Weighted): Double = b + a.weight * a.value
    def merge(b1: Double, b2: Double): Double = b1 + b2
    def finish(b: Double): Double = b
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
