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

  test("q238 MMR: in-JVM greedy replay matches; selection is diverse, relevant, and k-bounded") {
    import graft.ops.{OracleMath, SimilarityOps}
    val got = RetrievalOps.mmrRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length === RetrievalOps.MmrK)
    assert(got.map(_._1).toSeq === (1L to RetrievalOps.MmrK.toLong))
    // rebuild the candidate list + pairwise sims in-JVM and replay the greedy
    val e: Array[(Long, Array[Float])] = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val q = e.find(_._1 == 0L).get._2
    val cand = e.filter(_._1 != 0L)
      .map { case (id, v) => (id, r6(cos(v, q)), v) }
      .sortBy { case (id, rel, _) => (-rel, id) }
      .take(RetrievalOps.MmrCandidates)
    val sims = (for (a <- cand; b <- cand if a._1 != b._1)
      yield (a._1, b._1) -> r6(cos(a._3, b._3))).toMap
    val lam = RetrievalOps.MmrLambda
    var selected = Vector.empty[(Long, Double, Double)] // (id, rel, score)
    for (_ <- 1 to RetrievalOps.MmrK) {
      val pick = cand.filter(c => !selected.exists(_._1 == c._1)).map { case (id, rel, _) =>
        val maxSim = selected.map(s => sims((id, s._1))).reduceOption(_ max _).getOrElse(0.0)
        (id, rel, lam * rel - (1.0 - lam) * maxSim)
      }.minBy { case (id, _, score) => (-score, id) }
      selected :+= pick
    }
    assert(got.map(g => (g._2, g._3)).toSeq === selected.map(s => (s._1, s._2)))
    got.zip(selected).foreach { case (g, s) => assert(math.abs(g._4 - r6(s._3)) < 1e-9) }
    // the trade-off actually bites on this data: the selection order differs
    // from pure relevance order (otherwise MMR degenerated to top-k)
    val pureRel = cand.take(RetrievalOps.MmrK).map(_._1).toSeq
    assert(got.map(_._2).toSeq !== pureRel, "MMR must diverge from pure relevance ranking")
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

  test("q276 probe curve: recall and candidate cost strictly ordered in nprobe") {
    val rows = RetrievalOps.ivfProbeCurve(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq ==
      RetrievalOps.IvfProbeCurve.map(_.toLong))
    // a larger probe budget can only ADD candidates, so recall is monotone
    // non-decreasing and the candidate cost strictly increasing (every
    // query probes at least one more non-empty... list may be empty, so
    // candidates are non-decreasing; recall likewise)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Double]("mean_candidates") >= a.getAs[Double]("mean_candidates"))
      assert(b.getAs[Double]("mean_recall") >= a.getAs[Double]("mean_recall"))
    }
    rows.foreach { r =>
      val rec = r.getAs[Double]("mean_recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // the curve must actually bend upward on this data (nprobe matters)
    assert(rows.last.getAs[Double]("mean_recall") >
      rows.head.getAs[Double]("mean_recall"))
  }

  test("q279 quantization curve: more bits => less error, no worse recall") {
    val rows = RetrievalOps.sqRecallCurve(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("bits")).toSeq ==
      RetrievalOps.SqBitsCurve.map(_.toLong))
    rows.sliding(2).foreach { case Array(lo, hi) =>
      // reconstruction error strictly shrinks with bit depth; recall is
      // monotone up to rank-tie noise at the 6-dp sim rounding — require
      // non-decreasing, which quantization theory guarantees only in
      // expectation but this deterministic dataset satisfies exactly
      assert(hi.getAs[Double]("mean_abs_err") < lo.getAs[Double]("mean_abs_err"))
      assert(hi.getAs[Double]("mean_recall") >= lo.getAs[Double]("mean_recall"))
    }
    rows.foreach { r =>
      val rec = r.getAs[Double]("mean_recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
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
      // the task-relative columns replay chooseSaltFactor's exact rule at
      // the reference 32-slot layout
      val expectAuto =
        if (r.getAs[Long]("max_cnt") * 64L <= 3L * nRows) 1L
        else math.min(64L, (r.getAs[Long]("max_cnt") * 32L + nRows - 1L) / nRows)
      assert(r.getAs[Long]("ref32_auto_salt") == expectAuto)
      assert(math.abs(r.getAs[Double]("ref32_straggler_ratio") -
        r.getAs[Long]("max_cnt") * 32.0 / nRows) < 2e-4)
    }
  }

  test("q241 compaction plan: in-JVM NFD replay; groups partition shards under the target") {
    import graft.ops.SamplingOps
    val got = SamplingOps.compactionPlan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val shards = SamplingOps.exportManifest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))) // (shard, n_tokens)
    val total = shards.map(_._2).sum
    val target = (total + SamplingOps.CompactionTargetDiv - 1) / SamplingOps.CompactionTargetDiv
    // replay next-fit-decreasing
    var gid = 0L; var fill = 0L
    val groups = scala.collection.mutable.Map.empty[Long, (Long, Long)] // gid -> (nShards, tokens)
    shards.sortBy { case (s, t) => (-t, s) }.foreach { case (_, t) =>
      if (gid == 0L || fill + t > target) { gid += 1; fill = t }
      else fill += t
      val (c, tt) = groups.getOrElse(gid, (0L, 0L))
      groups(gid) = (c + 1, tt + t)
    }
    assert(got.map(g => (g._1, g._2, g._3)).toSet ===
      groups.map { case (g, (c, t)) => (g, c, t) }.toSet)
    assert(got.forall(_._4 === target))
    // every group fits the target unless it is a single oversized shard
    got.foreach { case (_, nShards, tokens, tgt) =>
      assert(tokens <= tgt || nShards === 1L)
    }
    assert(got.map(_._2).sum === shards.length.toLong)
  }

  test("q242 weighted quantiles: one crossing row per pct, equals in-JVM weighted quantile") {
    import graft.ops.WeightedQuantiles
    val got = WeightedQuantiles.weightedPriceQuantiles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq === WeightedQuantiles.QuantilePcts)
    val cells = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .groupBy(_._1).map { case (v, xs) => (v, xs.map(_._2).sum) }.toSeq.sortBy(_._1)
    val w = cells.map(_._2).sum
    for ((p, v, cumW, totalW) <- got) {
      assert(totalW === w)
      var cum = 0L
      val expected = cells.find { case (_, cw) => cum += cw; cum * 100 >= p * w }.get
      assert(v === expected._1)
      assert(cumW === cum)
    }
  }

  test("q243 CUSUM: deviations sum to zero; clamped fold replayed in-JVM") {
    import graft.ops.EventOps
    val got = EventOps.cusumChangePoints(spark, sf).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(got.map(_._3).sum === 0L, "scaled deviations are zero-mean by construction")
    val total = got.map(_._2).sum
    var sp = 0L; var sn = 0L
    got.sortBy(_._1).foreach { case (_, _, dev, gsp, gsn, fl) =>
      sp = math.max(0L, sp + dev); sn = math.max(0L, sn - dev)
      assert(gsp === sp && gsn === sn)
      assert(fl === (sp > EventOps.CusumThresholdMult * total || sn > EventOps.CusumThresholdMult * total))
    }
  }

  test("q244 overlap: Jaccard bounds, intersection bounds, full pair coverage") {
    import graft.ops.EventOps
    val got = EventOps.audienceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    val nTypes = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(got.length === (nTypes * (nTypes - 1) / 2).toInt)
    got.foreach { case (ta, tb, na, nb, both, union, j) =>
      assert(ta < tb)
      assert(both <= math.min(na, nb) && union >= math.max(na, nb))
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("q245 paths: depth <= 3, counts positive and ordered, sessions reconcile") {
    import graft.ops.EventOps
    val got = EventOps.sessionPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty && got.length <= EventOps.SessionPathTopK)
    got.foreach { case (p, n) =>
      assert(p.split(">").length <= 3 && n > 0L)
    }
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
    // a multi-step path exists (sessions really chain events)
    assert(got.exists(_._1.contains(">")))
  }

  test("q246 sliding bitmap distinct: window >= single day, equals brute distinct for a spot window") {
    import graft.ops.EventOps
    val got = EventOps.bitmapSliding(spark, sf).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toMap
    val perDay = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toMap
    perDay.foreach { case (d, n) => assert(got(d) >= n) }
    // spot-check one mid-range window against brute-force distinct
    val spot = perDay.keys.toSeq.sorted.apply(perDay.size / 2)
    val hi = new java.sql.Timestamp(spot)
    val lo = new java.sql.Timestamp(spot - 6L * 86400000L)
    val brute = Tables.events(spark, sf)
      .filter(date_trunc("day", col("ts")).between(lit(lo), lit(hi)))
      .select(col("user_id")).distinct().count()
    assert(got(spot) === brute)
  }

  test("q247 divergence: in_sync iff no deletions landed in the shard; totals reconcile") {
    import graft.ops.SamplingOps
    val got = SamplingOps.replicaDivergence(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4), r.getLong(5)))
    // divergence here is pure deletion, so checksum sync == zero repair docs
    got.foreach { case (_, da, db, sync, rd, rt) =>
      assert(rd === da - db && sync === (rd == 0L))
      assert(rd >= 0L && (rd > 0L || rt === 0L))
    }
    val totalDropped = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(SamplingOps.ReplicaDropMod)) === 0L).count()
    assert(got.map(_._5).sum === totalDropped)
  }

  test("q248 kappa: recomputed from the emitted exact counts; bounded by agreement") {
    import graft.ops.TextOps
    val r = TextOps.kappaLangId(spark, sf).collect().head
    val n = r.getLong(0).toDouble
    val agree = r.getLong(1).toDouble
    val po = agree / n
    val pe = (r.getLong(2) * r.getLong(3) + r.getLong(4) * r.getLong(5) +
      r.getLong(6) * r.getLong(7)).toDouble / (n * n)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(8) === r6(po) && r.getDouble(9) === r6(pe))
    assert(math.abs(r.getDouble(10) - r6((po - pe) / (1.0 - pe))) < 1e-9)
    assert(r.getDouble(10) <= r.getDouble(8) + 1e-9, "kappa never exceeds raw agreement")
  }

  test("q250 percentiles: bounds, tie-sharing, monotone with quality, full coverage") {
    import graft.ops.TextOps
    val got = TextOps.qualityPercentiles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length === Tables.documents(spark, sf).count().toInt)
    got.foreach { case (_, _, p) => assert(p >= 0.0 && p <= 1.0) }
    // same quality -> same rank; higher quality -> strictly higher rank
    val byQ = got.groupBy(_._2).map { case (q, xs) => q -> xs.map(_._3).toSet }
    byQ.foreach { case (_, ps) => assert(ps.size === 1) }
    val ordered = byQ.toSeq.sortBy(_._1).map(_._2.head)
    assert(ordered === ordered.sorted)
    assert(ordered.head === 0.0)
  }

  test("q251 interpolation: observed values pass through; gaps bounded by their neighbors") {
    import graft.ops.EventOps
    val got = EventOps.interpolateDaily(spark, sf).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).getTime, r.getBoolean(2), r.getDouble(3)))
    assert(got.exists(!_._3), "the deterministic sparsifier must create gaps")
    // every interpolated value lies within [min, max] of its type's observed values
    got.groupBy(_._1).foreach { case (_, rows) =>
      val obs = rows.filter(_._3).map(_._4)
      val lo = obs.min; val hi = obs.max
      rows.filterNot(_._3).foreach { case (_, _, _, v) =>
        assert(v >= lo - 1e-9 && v <= hi + 1e-9)
      }
      // strict interior gap: value strictly between unequal neighbors
      val sorted = rows.sortBy(_._2).toSeq
      sorted.sliding(3).foreach {
        case Seq(a, b, c) if a._3 && !b._3 && c._3 && math.abs(a._4 - c._4) > 1e-9 =>
          assert(v_between(b._4, a._4, c._4))
        case _ =>
      }
    }
  }
  private def v_between(v: Double, a: Double, b: Double): Boolean =
    v >= math.min(a, b) - 1e-9 && v <= math.max(a, b) + 1e-9

  test("q252 also-bought: support bounds, confidence/lift recomputed from emitted counts") {
    import graft.ops.CoreOps
    val got = CoreOps.alsoBought(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))
    assert(got.nonEmpty && got.length <= CoreOps.BasketTopK)
    val nOrders = Tables.lineitem(spark, sf).select("l_orderkey").distinct().count()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (a, b, pair, na, nb, conf, lift) =>
      assert(a < b && pair >= 1L && pair <= math.min(na, nb))
      assert(conf === r6(pair.toDouble / na))
      assert(math.abs(lift - r6(pair.toDouble * nOrders / (na.toDouble * nb))) < 1e-9)
    }
  }

  test("q253 time-decay: shares sum to 1 per purchase; weights are the exact dyadics") {
    import graft.ops.EventOps
    val got = EventOps.timeDecayAttribution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.nonEmpty)
    val allowed = Set(1L, 2L, 4L, 8L, 16L, 32L)
    got.foreach { case (_, _, gap, w, _, _) =>
      assert(gap >= 0L && gap < EventOps.DecayWindowSec)
      assert(allowed.contains(w))
      assert(w === (1L << (5 - gap / EventOps.DecayStepSec)).toLong)
    }
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sum === rows.head._5)
      assert(math.abs(rows.map(_._6).sum - 1.0) < 1e-4)
    }
    // decay actually bites: some click landed past the first 5-min bucket
    // (at sf0.001 every purchase is single-touch, so the multi-weight case
    // is exercised by the sf0.01/0.1 oracle sweeps instead)
    assert(got.exists(_._4 < 32L))
  }

  test("q254 grouped quantiles: one crossing per (group, pct), monotone, equals in-JVM") {
    import graft.ops.WeightedQuantiles
    val got = WeightedQuantiles.groupedWeightedQuantiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val groups = got.map(_._1).distinct
    groups.foreach { g =>
      val rows = got.filter(_._1 == g).sortBy(_._2)
      assert(rows.map(_._2).toSeq === WeightedQuantiles.QuantilePcts)
      assert(rows.map(_._3).toSeq === rows.map(_._3).sorted.toSeq, s"quantiles monotone in $g")
    }
    // in-JVM replay for one group
    val g0 = groups.min
    val cells = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === g0)
      .select(col("l_extendedprice"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .groupBy(_._1).map { case (v, xs) => (v, xs.map(_._2).sum) }.toSeq.sortBy(_._1)
    val w = cells.map(_._2).sum
    for ((_, p, v) <- got.filter(_._1 == g0)) {
      var cum = 0L
      val exp = cells.find { case (_, cw) => cum += cw; cum * 100 >= p * w }.get._1
      assert(v === exp, s"group $g0 p$p")
    }
  }

  test("q255 zone-map audit: skipping is SOUND (matches fit in unskipped rows), full coverage") {
    import graft.ops.CoreOps
    val got = CoreOps.zoneMapAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    val totalRows = Tables.orders(spark, sf).count()
    got.foreach { case (_, nBlocks, nSkip, rowsSkipped, nMatch, pct) =>
      assert(nSkip <= nBlocks && rowsSkipped <= totalRows)
      // soundness: every matching row lives in an unskipped block
      assert(nMatch <= totalRows - rowsSkipped)
      assert(math.abs(pct - BigDecimal(nSkip.toDouble / nBlocks)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    assert(got.map(_._5).sum > 0L, "1996 quarters must match rows in this data")
  }

  test("q256 containment: in-JVM brute force matches; catches subsets Jaccard misses") {
    import graft.ops.DedupOps
    val got = DedupOps.containmentPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").distinct.toSet))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = docs
      .filter { case (_, ws) => ws.size >= DedupOps.ContainMinSrcTokens &&
        ws.size <= DedupOps.ContainMaxSrcTokens }
      .flatMap { case (a, wa) =>
        val matches = docs.filter { case (b, wb) =>
          b != a && wb.size * 1000L >= wa.size * 900L &&
            (wa & wb).size * 1000L >= wa.size * 900L
        }.map { case (b, wb) => (b, r4((wa & wb).size.toDouble / wa.size)) }
        if (matches.isEmpty) None
        else {
          val best = matches.minBy { case (b, c) => (-c, b) }
          Some((a, wa.size.toLong, matches.length.toLong, best._2, best._1))
        }
      }.toSet
    assert(got.toSet === expected)
    // the asymmetric semantics earn their keep: some contained doc's best
    // container is strictly larger (small Jaccard, high containment)
    val sizes = docs.toMap.view.mapValues(_.size.toLong).toMap
    assert(got.exists { case (a, szA, _, c, b) => c >= 0.9 && sizes(b) > szA })
  }

  test("q257 scorecard: wilson bound below rate, p90 replayed in-JVM for a spot supplier") {
    import graft.ops.CoreOps
    val got = CoreOps.supplierScorecard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))
    assert(got.nonEmpty)
    got.foreach { case (_, n, mean, p90, nSlow, rate, lo) =>
      assert(nSlow <= n && lo <= rate + 1e-9)
      assert(p90.toDouble >= 0.0 && mean >= 0.0)
    }
    assert(got.exists(_._5 > 0L), "the slow threshold must bite on this data")
    // in-JVM p90 replay for the busiest supplier
    val spot = got.maxBy(_._2)._1
    val lags = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_suppkey") === spot)
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .collect().map(_.getLong(0)).sorted
    var cum = 0L
    val exp = lags.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (v, xs) => (v, xs.length.toLong) }
      .find { case (_, w) => cum += w; cum * 100 >= 90L * lags.length }.get._1
    assert(got.find(_._1 == spot).get._4 === exp)
  }

  test("q258 growth accounting: active identity holds daily; flows reconcile with users") {
    import graft.ops.EventOps
    val got = EventOps.growthAccounting(spark, sf).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    got.foreach { case (_, nw, ret, res, _, act) => assert(nw + ret + res === act) }
    // every user is new exactly once
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(got.map(_._2).sum === nUsers)
    // all four flows genuinely fire under the 1-day window
    assert(got.exists(_._3 > 0L) && got.exists(_._4 > 0L) && got.exists(_._5 > 0L))
  }

  test("q259 vocab drift: chi2 replayed from emitted counts; ordered and floored") {
    import graft.ops.TextOps
    val got = TextOps.vocabDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.nonEmpty && got.length <= TextOps.VocabDriftTopK)
    assert(got.map(_._5).toSeq === (1L to got.length.toLong))
    assert(got.map(_._4).toSeq === got.map(_._4).sortBy(-_).toSeq)
    got.foreach { case (_, e, l, c, _) =>
      assert(e + l >= TextOps.VocabDriftMinFreq && c >= 0.0)
    }
    // replay chi2 for the top term from exact marginals
    val eras = Tables.documents(spark, sf)
      .select(pmod(col("doc_id"), lit(2L)).as("era"),
        explode(split(col("text"), " ")).as("term"))
      .groupBy(col("era")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (te, tl) = (eras(0L).toDouble, eras(1L).toDouble)
    val top = got.head
    val (e, l) = (top._2.toDouble, top._3.toDouble)
    val expE = (e + l) * te / (te + tl); val expL = (e + l) * tl / (te + tl)
    val chi2 = (e - expE) * (e - expE) / expE + (l - expL) * (l - expL) / expL
    assert(math.abs(top._4 - BigDecimal(chi2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("q260 dataset card: all nine metrics present and internally consistent") {
    import graft.ops.TextOps
    val got = TextOps.datasetCard(spark, sf).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(got.size === 9)
    val nDocs = Tables.documents(spark, sf).count().toDouble
    assert(got("n_docs") === nDocs)
    assert(got("mean_tokens_per_doc") > 0.0 &&
      math.abs(got("n_tokens") / nDocs - got("mean_tokens_per_doc")) < 1e-3)
    assert(got("exact_dup_pct") >= 0.0 && got("exact_dup_pct") < 1.0)
    // a wordset group is at least as coarse as exact-text identity
    assert(got("wordset_dup_pct") >= got("exact_dup_pct") - 1e-9)
    assert(got("p50_tokens") >= 1.0 && got("p50_tokens") <= 100.0)
    assert(got("mean_quality") > 0.0 && got("mean_quality") <= 1.0)
    assert(got("top_lang_share") >= 1.0 / got("n_languages") &&
      got("top_lang_share") <= 1.0)
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

  /** Quantized embeddings collected for the in-JVM replays below (test-only
    * materialization at sf0.001).
    */
  private def quantizedEmbeddings(scale: Double): Map[Long, Array[Long]] =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT))"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

  test("q293 PCA: in-JVM integer power-iteration replay matches exactly") {
    import graft.ops.SimilarityOps
    val got = SimilarityOps.pcaPower(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 64)
    assert(got.map(_._2).map(math.abs).max == SimilarityOps.PcaScale,
      "renormalized eigenvector must peak at exactly the scale")
    val share = got.head._3
    assert(share > 0.0 && share <= 1.0)

    // replay: same quantization, truncating means, scatter, renorm, rounds
    def tdiv(a: Long, b: Long): Long = if (a >= 0) a / b else -((-a) / b)
    val eq = quantizedEmbeddings(SimilarityOps.PcaQuant.toDouble).values.toArray
    val n = eq.length
    val means = Array.tabulate(64)(d => tdiv(eq.map(_(d)).sum, n.toLong))
    val c = eq.map(row => Array.tabulate(64)(d => row(d) - means(d)))
    val s = Array.tabulate(64, 64)((i, j) => c.map(r => r(i) * r(j)).sum)
    val smax = s.flatten.map(math.abs).max
    val sn = s.map(_.map(x => tdiv(x, math.max(tdiv(smax, SimilarityOps.PcaScale), 1L))))
    var v = Array.fill(64)(SimilarityOps.PcaScale)
    for (_ <- 1 to SimilarityOps.PcaRounds) {
      val w = Array.tabulate(64)(i => (0 until 64).map(j => sn(i)(j) * v(j)).sum)
      val wmax = w.map(math.abs).max
      v = w.map(x => tdiv(x, math.max(tdiv(wmax, SimilarityOps.PcaScale), 1L)))
    }
    assert(got.map(_._2).toSeq == v.toSeq, "engine eigenvector != in-JVM replay")
  }

  test("q296 k-center: greedy replay matches; radii non-increasing; picks distinct") {
    import graft.ops.SamplingOps
    val got = SamplingOps.kcenterCoreset(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.length == SamplingOps.KCenterK)
    assert(got.map(_._2).distinct.length == got.length, "picks must be distinct")
    val radii = got.flatMap(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      "k-center selection radii must be non-increasing")

    // brute-force greedy replay on the quantized vectors
    val eq = quantizedEmbeddings(1000000.0)
    def d2(a: Array[Long], b: Array[Long]): Long =
      (0 until 64).map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var selected = Vector(0L)
    var md = eq.map { case (id, v) => id -> d2(v, eq(0L)) }
    for (_ <- 2 to SamplingOps.KCenterK) {
      val (pick, _) = md.filterNot(kv => selected.contains(kv._1))
        .minBy { case (id, m) => (-m, id) }
      selected :+= pick
      md = md.map { case (id, m) => id -> math.min(m, d2(eq(id), eq(pick))) }
    }
    assert(got.map(_._2).toSeq == selected, "engine picks != in-JVM greedy replay")
  }

  test("q297 Neyman: seats total exactly the budget; never negative; sigma sane") {
    import graft.ops.SamplingOps
    val rows = SamplingOps.neymanAllocation(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("k_neyman")).sum == SamplingOps.NeymanBudget,
      "largest-remainder seats must total exactly B")
    assert(rows.forall(_.getAs[Long]("k_neyman") >= 0L))
    assert(rows.forall(_.getAs[Double]("sigma") >= 0.0))
    // proportional baseline never exceeds the budget either
    assert(rows.map(_.getAs[Long]("k_proportional")).sum <= SamplingOps.NeymanBudget)
  }

  test("q298 rank metrics: bounded in [0,1]; probing ALL lists is a perfect retriever") {
    val got = RetrievalOps.retrievalRankMetrics(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (m, n) = (r.getAs[Double]("mrr"), r.getAs[Double]("ndcg"))
      assert(m >= 0.0 && m <= 1.0, s"mrr out of range: $m")
      assert(n >= 0.0 && n <= 1.0 + 1e-9, s"ndcg out of range: $n")
    }
    // with nprobe = all lists the IVF path IS exact search: both metrics 1
    val full = RetrievalOps.retrievalRankMetrics(spark, sf, nprobe = 10).collect()
    assert(full.forall(_.getAs[Double]("mrr") == 1.0))
    assert(full.forall(_.getAs[Double]("ndcg") == 1.0))
  }

  test("q294 Chao1: estimate >= observed; saturated source collapses to V") {
    import graft.ops.TextOps
    val rows = TextOps.chao1Vocab(spark, sf).collect()
    rows.foreach { r =>
      val (v, f1, chao1, cov) = (r.getAs[Long]("v_obs"), r.getAs[Long]("f1"),
        r.getAs[Double]("chao1"), r.getAs[Double]("gt_coverage"))
      assert(chao1 >= v.toDouble, "Chao1 can never fall below the observed richness")
      assert(cov >= 0.0 && cov <= 1.0)
      if (f1 == 0L) assert(chao1 == v.toDouble, "no singletons => nothing unseen estimated")
    }
  }

  test("q295 centroid drift: full pair matrix, symmetric-free, nonnegative") {
    import graft.ops.SimilarityOps
    val rows = SimilarityOps.centroidDrift(spark, sf).collect()
    val srcs = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.length
    assert(rows.length == srcs * (srcs - 1) / 2, "one row per unordered source pair")
    assert(rows.forall(_.getAs[Double]("mmd2") >= 0.0))
  }

  test("q299 Mann-Kendall: S bounded by pair count; trend label consistent with z") {
    import graft.ops.EventOps
    val rows = EventOps.mannKendall(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s) = (r.getAs[Long]("n_days"), r.getAs[Long]("s_stat"))
      assert(math.abs(s) <= n * (n - 1) / 2, "S cannot exceed the pair count")
      val z = if (r.isNullAt(r.fieldIndex("z_stat"))) 0.0 else r.getAs[Double]("z_stat")
      val trend = r.getAs[String]("trend")
      if (math.abs(z) > 1.96) assert(trend == (if (s > 0) "rising" else "falling"))
      else assert(trend == "none")
    }
  }

  test("q300 Spearman: rho in [-1,1]; shared vocab bounded by the head size") {
    import graft.ops.TextOps
    val rows = TextOps.spearmanSources(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("m_shared") <= TextOps.SpearmanTopK)
      if (!r.isNullAt(r.fieldIndex("rho"))) {
        val rho = r.getAs[Double]("rho")
        assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9, s"rho out of range: $rho")
      }
    }
  }

  test("q301 k-core: nodes and edges are non-increasing over peel rounds") {
    import graft.ops.EventOps
    val rows = EventOps.kcorePeel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.length == EventOps.KCoreRounds + 1)
    rows.zip(rows.tail).foreach { case ((_, n1, e1), (_, n2, e2)) =>
      assert(n2 <= n1 && e2 <= e1, "peeling can never grow the graph")
    }
  }

  test("q302 k-fold: folds partition the corpus; chi2 nonnegative") {
    import graft.ops.SamplingOps
    val rows = SamplingOps.kfoldAssign(spark, sf).collect()
    assert(rows.length == SamplingOps.CvFolds)
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs, "folds must partition the corpus")
    assert(rows.forall(_.getAs[Double]("chi2") >= 0.0))
  }

  test("q303 Hill: k matches the available order statistics; shares bounded") {
    import graft.ops.TextOps
    val r = TextOps.hillTail(spark, sf).collect()(0)
    val nDocs = r.getAs[Long]("n_docs")
    assert(r.getAs[Long]("k") == math.min(TextOps.HillK.toLong, nDocs))
    val share = r.getAs[Double]("tail_char_share")
    assert(share > 0.0 && share <= 1.0)
    if (!r.isNullAt(r.fieldIndex("hill_alpha")))
      assert(r.getAs[Double]("hill_alpha") > 0.0)
  }

  test("q305 Wasserstein: nonnegative, symmetric-free pair matrix, triangle inequality") {
    import graft.ops.TextOps
    val rows = TextOps.wassersteinLengths(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Double]("w1_chars")))
    val srcs = rows.flatMap(r => Seq(r._1, r._2)).distinct.sorted
    assert(rows.length == srcs.length * (srcs.length - 1) / 2)
    assert(rows.forall(_._3 >= 0.0))
    // W1 is a metric: check the triangle inequality on every source triple
    // (rounding at 4 dp injects ≤ 2e-4 slack per term)
    val d = rows.flatMap(r => Seq((r._1, r._2) -> r._3, (r._2, r._1) -> r._3)).toMap
    for {
      a <- srcs; b <- srcs if a < b; c <- srcs if c != a && c != b
    } assert(d((a, b)) <= d((a, c)) + d((c, b)) + 5e-4,
      s"triangle violated: d($a,$b) > d($a,$c) + d($c,$b)")
  }
}
