package graft

import graft.ops.RetrievalOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the retrieval / split-hygiene family (q157/q159/q160):
  * ranking and scoring invariants for BM25, eval-train disjointness and
  * broadcast shape for the contamination check, and the zero-leakage
  * guarantee of the cluster-aware split.
  */
class RetrievalSpec extends AnyFunSuite {
  import TestSpark._

  test("q157 BM25: dense ranks, monotone scores, global top-k without a single-partition sort") {
    val df = RetrievalOps.bm25TopK(spark, sf)
    val rows = df.collect()
    assert(rows.length == RetrievalOps.Bm25TopK)
    assert(rows.map(_.getAs[Long]("rnk")).toSeq == (1L to RetrievalOps.Bm25TopK).toSeq)
    val totals = rows.map(_.getAs[Double]("score_total"))
    assert(totals.zip(totals.tail).forall { case (a, b) => a >= b }, "scores not monotone by rank")
    // per-term scores are nonnegative and the rounded total matches the parts
    // within rounding slack (both sides 4-dp rounded)
    rows.foreach { r =>
      val parts = RetrievalOps.Bm25Terms.map(t => r.getAs[Double](s"s_$t"))
      assert(parts.forall(_ >= 0.0))
      assert(math.abs(parts.sum - r.getAs[Double]("score_total")) < 2e-4)
    }
    // the global top-k must compile to TakeOrderedAndProject (per-partition
    // heaps + driver merge), not a 1-partition window sort over all docs
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-k should be TakeOrderedAndProject")
  }

  test("q159 contamination: eval slice is disjoint, small, and broadcast; counts bounded") {
    val e = Tables.embeddings(spark, sf)
    val isEval = pmod(col("vec_id") * lit(RetrievalOps.EvalHashMult), lit(100L)) <
      lit(RetrievalOps.EvalPct)
    val nEval = e.filter(isEval).count()
    val nAll = e.count()
    assert(nEval > 0, "eval slice empty — hash constants degenerate on this SF")
    assert(nEval < nAll / 5, "eval slice too large to justify the broadcast design")

    val df = RetrievalOps.embedContamination(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("n_train")).sum == nAll - nEval)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_train"))
      assert(r.getAs[Double]("max_sim") <= 1.0 + 1e-9)
    }
    // the train side must never shuffle: the eval side is the broadcast input
    // of a nested-loop join
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), "eval side should broadcast")
  }

  test("q161 IVF recall: bounded, exact at nprobe=all-lists") {
    val out = RetrievalOps.ivfRecall(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0 && hits <= RetrievalOps.IvfK)
      assert(math.abs(r.getAs[Double]("recall") - hits.toDouble / RetrievalOps.IvfK) < 1e-9)
    }
    // probing every coarse list makes the IVF candidate set the whole train
    // side, so the measured recall must be exactly 1.0 for every query —
    // the index's correctness envelope, not a statistical statement
    val full = RetrievalOps.ivfRecall(spark, sf, nprobe = 10).collect()
    assert(full.forall(_.getAs[Double]("recall") == 1.0),
      "nprobe=all-lists must reproduce the exact top-k")
  }

  test("q162 BPE: replace() is greedy left-to-right merge; rounds well-formed, freqs non-increasing") {
    import graft.ops.TextOps
    // the engine assumption the whole operator rests on: Spark's replace()
    // consumes matches left-to-right without overlap, so on the boundary-
    // marked rendering it implements exactly greedy BPE merge application
    val r = spark.sql(
      "SELECT replace('·a··b··a··b·', '·a··b·', '·ab·') AS abab, " +
      "       replace('·a··a··a·',    '·a··a·', '·aa·') AS aaa").head()
    assert(r.getString(0) == "·ab··ab·", "a b a b must merge to ab ab")
    assert(r.getString(1) == "·aa··a·", "a a a must merge greedily to aa a")

    val out = TextOps.bpeMerges(spark, sf).collect().sortBy(_.getAs[Long]("round"))
    assert(out.length == TextOps.BpeRounds)
    out.foreach { m =>
      assert(m.getAs[String]("merged") == m.getAs[String]("sym_a") + m.getAs[String]("sym_b"))
    }
    // each merge only removes occurrences of existing pairs and creates new
    // pairs no more frequent than the pair just merged, so the argmax
    // frequency can never increase across rounds
    val freqs = out.map(_.getAs[Long]("freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b }, "BPE merge freqs must be non-increasing")
    assert(out.map(r2 => (r2.getAs[String]("sym_a"), r2.getAs[String]("sym_b"))).distinct.length == out.length)
  }

  test("q163 BPE encode: subword counts bounded by words below and chars above") {
    import graft.ops.TextOps
    val out = TextOps.bpeEncode(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, s, c) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_subwords"), r.getAs[Long]("n_chars"))
      assert(s >= w, "every word is at least one subword")
      assert(s <= c, "every subword is at least one char")
      assert(math.abs(r.getAs[Double]("chars_per_token") - c.toDouble / s) < 1e-3)
    }
    // 8 merges must have actually compressed: strictly fewer subwords than chars
    assert(out.map(_.getAs[Long]("n_subwords")).sum < out.map(_.getAs[Long]("n_chars")).sum)
  }

  test("q164 streaming bitmap distinct equals batch exact distinct") {
    val streamed = graft.streaming.EventsStream.bitmapDistinctStreaming(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getAs[Long]("n_users")).toMap
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getAs[Long]("n_users")).toMap
    assert(streamed == batch, "bitmap OR is lossless — streaming must EQUAL batch distinct")
  }

  test("q165 skew profile: totals reconcile, ratios and salt factor well-formed") {
    val nRows = Tables.lineitem(spark, sf).count()
    val out = graft.ops.CoreOps.keySkewProfile(spark, sf).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_rows") == nRows)
      assert(r.getAs[Double]("skew_ratio") >= 1.0 - 1e-9, "max >= mean always")
      assert(r.getAs[Long]("salt_factor") >= 1L)
      assert(r.getAs[Double]("p50_cnt") <= r.getAs[Double]("p99_cnt"))
      assert(r.getAs[Long]("max_cnt") >= r.getAs[Double]("p99_cnt").toLong)
    }
  }

  test("q158 manifest: totals reconcile; checksum invariant to partitioning") {
    import graft.ops.SamplingOps
    val docs = Tables.documents(spark, sf)
    val out = SamplingOps.exportManifest(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // the content checksum must be a pure function of the data — identical
    // under a different partitioning (the retry/cluster-size invariance the
    // manifest exists to provide)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "3")
    val out2 = SamplingOps.exportManifest(s2, sf).collect()
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("content_checksum"))).sortBy(_._1).toSeq
    assert(key(out) == key(out2), "manifest must be partitioning-invariant")
  }

  test("q166 drift monitor: warm-up days excluded, flag consistent with drift") {
    val nDays = Tables.events(spark, sf)
      .select(date_trunc("day", col("ts")).as("d")).distinct().count()
    val out = graft.ops.EventOps.valueDrift(spark, sf).collect()
    // the first 3 days lack a >= 3-day trailing window and must be excluded
    assert(out.length == nDays - 3)
    out.foreach { r =>
      assert(r.getAs[Boolean]("flagged") == (math.abs(r.getAs[Double]("drift_pct")) > 10.0))
      assert(r.getAs[Double]("vol_ratio") > 0.0)
    }
  }

  test("q160 split: partitions the corpus, zero cluster straddle, naive straddle reproduced") {
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()
    val out = RetrievalOps.clusterSafeSplit(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs, "splits must partition the corpus")

    // independent recomputation: per-DOC split assignment via the group key
    // must never straddle a wordset group (leak-free by construction), and
    // the naive per-doc hash split's straddle count must match the operator's
    val perDoc = docs.select(col("doc_id"), col("n_chars"),
      md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " ")).as("wkey"),
      (pmod(col("doc_id") * lit(RetrievalOps.SplitHashMultNaive), lit(100L)) <
        lit(RetrievalOps.SplitTrainPct)).as("naive_train"))
      .withColumn("cluster_split",
        pmod(conv(substring(col("wkey"), 1, 12), 16, 10).cast("long"), lit(100L)) <
          lit(RetrievalOps.SplitTrainPct))
    val straddleCluster = perDoc.groupBy("wkey")
      .agg(countDistinct(col("cluster_split")).as("k")).filter(col("k") > 1).count()
    assert(straddleCluster == 0L, "a wordset group straddles the cluster-aware split")
    val straddleNaive = perDoc.groupBy("wkey")
      .agg(countDistinct(col("naive_train")).as("k")).filter(col("k") > 1).count()
    assert(out.map(_.getAs[Long]("naive_leaky_groups")).sum == straddleNaive)
  }
}
