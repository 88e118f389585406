package graft

import graft.ops.LinkageOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the Fellegi–Sunter linkage family (q312/q313/q315) that the
  * hash oracle can't express: sign structure of the learned weights,
  * blocking recall against the KNOWN derivation, and conservation laws of
  * the golden-record collapse.
  */
class LinkageSpec extends AnyFunSuite {
  import TestSpark._

  test("learned weights separate: agreement evidence positive, disagreement negative (q313)") {
    val w = LinkageOps.linkageWeights(spark, sf).collect()
    assert(w.length === 4)
    w.foreach { r =>
      val f = r.getString(0)
      assert(r.getDouble(5) > 0.0, s"$f: w_agree must be positive evidence")
      assert(r.getDouble(6) < 0.0, s"$f: w_disagree must be negative evidence")
      // name is the near-unique identifier: its agreement weight must
      // dominate the categorical fields' (nation has 25 values, seg 5-6)
      if (f == "name") assert(r.getDouble(5) > 5.0, "name agreement should be decisive")
    }
  }

  test("multi-pass blocking recall: candidates cover ≥ 90% of true pairs (q312)") {
    val cust = Tables.customer(spark, sf)
    val nTrue = cust.filter(col("c_custkey") % 10 =!= 9).count()
    // the confusion matrix's is_true rows = true pairs that SURVIVED blocking
    val m = LinkageOps.recordLinkage(spark, sf)
      .filter(col("is_true")).agg(sum(col("n_pairs"))).head.getLong(0)
    assert(m >= (nTrue * 9) / 10,
      s"blocking found $m of $nTrue true pairs — multi-pass recall regressed")
    // and only records with BOTH sort keys perturbed may escape: the bound
    // is loose on purpose (rank neighborhoods shift), the 90% is the contract
  }

  test("golden-record collapse conserves records; matched clusters absorb one A and one B (q315)") {
    val g = LinkageOps.goldenRecords(spark, sf).collect()
    val total = g.map(_.getLong(1)).sum
    val nA = Tables.customer(spark, sf).count()
    val nB = Tables.customer(spark, sf).filter(col("c_custkey") % 10 =!= 9).count()
    assert(total === nA + nB, "every record lands in exactly one cluster")
    // survivor is the cluster-min record, so its name is never null
    assert(g.forall(!_.isNullAt(3)))
    // pairs dominate: most clusters are {A-original, B-reobservation}
    val pairs = g.count(r => r.getLong(1) == 2L && r.getLong(2) == 1L)
    assert(pairs * 2 > g.length, s"expected mostly A+B pairs, got $pairs of ${g.length}")
    graft.ops.Caches.release()
  }
}
