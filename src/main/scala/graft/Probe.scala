package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for timing experiments (not part of the driver
  * contract; Bench/Verify are the real entry points).
  */
object Probe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption.getOrElse("all") match {
      case q => Steps.run(spark, sfDir, q)
    }
    spark.stop()
  }
}

/** Editable playground — keep experiments here. */
object Steps {
  import org.apache.spark.sql.functions._
  import Probe.time

  def run(spark: SparkSession, dir: String, what: String): Unit = what match {
    case "plan261" =>
      val df = ops.CoreOps.scd2IntervalAttribution(spark, dir)
      df.collect()
      println(df.queryExecution.executedPlan.toString.take(4000))
    case "plan265" =>
      val df = ops.CoreOps.scd2CoverageAudit(spark, dir)
      df.collect()
      println(df.queryExecution.executedPlan.toString.take(5000))
    case "winaudit" =>
      // enumerate every query whose optimized plan contains a partition-less
      // window spec (the PlanSpec structural audit's discovery pass)
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        try {
          val a = PlanAudit.auditQuery(spark, name, dir)
          if (a.unpartWindows.nonEmpty)
            println(s"[winaudit] $name: ${a.unpartWindows.size} unpartitioned window(s): " +
              a.unpartWindows.map(_.take(80)).mkString(" | "))
          if (a.cartesian)
            println(s"[winaudit] $name: CARTESIAN product planned")
        } catch { case e: Throwable =>
          println(s"[winaudit] $name: ERROR ${e.getMessage}")
        } finally ops.Caches.release()
      }
    case "q38" =>
      time("q38 full")(ops.DedupOps.nearDupJaccard(spark, dir).count())
    case "q39" =>
      time("q39 full")(ops.DedupOps.lshNearDupPairs(spark, dir).count())
    case "q39parts" =>
      graft.functions.VectorFunctions.register(spark)
      import graft.functions.VectorFunctions.minhashSigs
      import ops.TextFunctions._
      import ops.DedupOps.{LshBands, LshRows}
      val hs = wordSetHashes(col("text"))
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), sort_array(transform(hs, _.cast("int"))).as("ws"),
          minhashSigs(hs, LshBands * LshRows).as("sig"))
        .withColumn("sz", size(col("ws")))
      time("docs+sigs")(docs.count())
      val banded = docs.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(LshBands - 1)),
          b => xxhash64(b, slice(col("sig"), b * LshRows + 1, lit(LshRows))))).as("band"))
      time("banded")(banded.count())
      val cands = banded.as("a").join(banded.as("b"), Seq("band"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      time("cands")(println("n_cands=" + cands.count()))
      time("q39 full")(ops.DedupOps.lshNearDupPairs(spark, dir).count())
    case "q38parts" =>
      import ops.TextFunctions._
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), array_distinct(words(col("text"))).as("ws0"))
      val vocab = time("vocab collect")(
        docs.select(explode(col("ws0")).as("word")).distinct()
          .collect().map(_.getString(0)).sorted)
      val bitMap = map(vocab.zipWithIndex.flatMap {
        case (w, i) => Seq(lit(w), lit(1L << i))
      }: _*)
      val masks = docs.select(col("doc_id"),
        aggregate(transform(col("ws0"), w => element_at(bitMap, w)),
          lit(0L), (acc, b) => acc.bitwiseOR(b)).as("mask"))
      time("masks")(masks.count())
      val groups = masks.groupBy(col("mask"))
        .agg(collect_list(col("doc_id")).as("ids"), count(lit(1)).as("n"))
      time("groups")(groups.count())
      val par = spark.sparkContext.defaultParallelism
      val a = groups.repartition(par)
        .select(col("mask").as("mask_a"), col("ids").as("ids_a"))
      val b = groups.select(col("mask").as("mask_b"), col("ids").as("ids_b"))
      val j = bit_count(col("mask_a").bitwiseAND(col("mask_b"))).cast("double") /
        bit_count(col("mask_a").bitwiseOR(col("mask_b")))
      val crossG = a.join(broadcast(b), col("mask_a") < col("mask_b") && j >= lit(0.9))
      time("cross group pairs")(println("n=" + crossG.count()))
      val crossPairs = crossG
        .select(col("ids_a"), col("ids_b"), j.as("j"))
        .select(explode(col("ids_a")).as("x"), col("ids_b"), col("j"))
        .select(col("x"), explode(col("ids_b")).as("y"), col("j"))
      time("expanded")(println("n=" + crossPairs.count()))
      time("q38 full")(ops.DedupOps.nearDupJaccard(spark, dir).count())
      time("q38 again")(ops.DedupOps.nearDupJaccard(spark, dir).count())
    case "q71parts" =>
      import ops.TextFunctions._
      val ws = words(col("text"))
      val bigrams = array_distinct(transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      val docs = Tables.documents(spark, dir)
        .filter(size(ws) >= 2)
        .select(col("doc_id"), bigrams.as("ws0"))
      time("docs")(docs.count())
      val ranks = docs
        .select(explode(col("ws0")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("df"))
        .select(col("word"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("df"), col("word"))).as("tok"))
      time("ranks")(ranks.count())
      val ids = docs
        .select(col("doc_id"), explode(col("ws0")).as("word"))
        .join(broadcast(ranks), "word")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("tok"))).as("ws"), count(lit(1)).as("sz"))
      time("ids")(ids.count())
      val prefixLen = (col("sz") - floor((col("sz") * 800 + 999) / 1000) + 1).cast("int")
      val prefixes = ids.select(col("doc_id"), col("sz"),
        explode(slice(col("ws"), lit(1), prefixLen)).as("tok"))
      time("prefixes")(prefixes.count())
      val cands = prefixes.as("a").join(prefixes.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id")
            && col("a.sz") * 1000 >= col("b.sz") * 800
            && col("b.sz") * 1000 >= col("a.sz") * 800)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      time("cands")(println("n=" + cands.count()))
      time("q71 full")(ops.DedupOps.ngramJaccard(spark, dir).count())
    case "bloom" =>
      for (k <- Seq("spark.sql.optimizer.runtime.bloomFilter.enabled",
                    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
                    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
                    "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems"))
        println(s"$k = ${spark.conf.get(k)}")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      println(ops.CoreOps.urgentLineRevenue(spark, dir)
        .queryExecution.optimizedPlan.toString.take(3000))
    case "hot" =>
      // warmup
      Tables.orders(spark, dir).count(); Tables.events(spark, dir).count()
      time("q22 pipeline 1st")(graft.pipeline.Pipeline.pipelineQuery(spark, dir).count())
      time("q22 pipeline 2nd")(graft.pipeline.Pipeline.pipelineQuery(spark, dir).count())
      time("q71 ngram 1st")(ops.DedupOps.ngramJaccard(spark, dir).count())
      time("q70 part scan 1st")(ops.EventOps.partitionedScan(spark, dir).count())
      time("q70 part scan 2nd")(ops.EventOps.partitionedScan(spark, dir).count())
      time("q67 orc 1st")(ops.EventOps.orcRoundTrip(spark, dir).count())
      time("q67 orc 2nd")(ops.EventOps.orcRoundTrip(spark, dir).count())
      time("q65 bigram 1st")(ops.TextOps.bigramFreq(spark, dir).count())
      time("q65 bigram 2nd")(ops.TextOps.bigramFreq(spark, dir).count())
      time("q101 clusters")(ops.DedupOps.dedupClusters(spark, dir).count())
      time("q102 packing")(ops.TextOps.packSequences(spark, dir).count())
    case "q101parts" =>
      import ops.TextFunctions._
      import org.apache.spark.storage.StorageLevel
      val ds = Tables.documents(spark, dir)
        .select(col("doc_id"), array_sort(array_distinct(words(col("text")))).as("ws0"))
      val groups = ds.groupBy(col("ws0"))
        .agg(min(col("doc_id")).as("rep"), collect_list(col("doc_id")).as("ids"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("groups")(groups.count())
      val reps = groups.select(col("rep").as("doc_id"), col("ws0"))
      val vocab = time("vocab")(reps.select(explode(col("ws0")).as("word")).distinct()
        .collect().map(_.getString(0)).sorted)
      println("n_vocab=" + vocab.length)
      val pairs = ops.DedupOps.nearDupJaccard(spark, dir) // full doc pairs for comparison
      time("full doc pairs")(println("n=" + pairs.count()))
      // loop anatomy on the REP graph: how many rounds, what does one cost?
      val repDocs = groups.select(col("rep").as("doc_id"), col("ws0"))
      val p2 = time("rep pairs")(ops.DedupOps.nearDupPairsOn(spark, repDocs, 0.9)
        .select(col("doc_a"), col("doc_b")))
      val edges = p2.unionByName(p2.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .toDF("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
      time("edges mat")(println("edges=" + edges.count()))
      var labels = repDocs.select(col("doc_id"), col("doc_id").as("label")).localCheckpoint()
      var last = -1L
      var it = 0
      var done = false
      while (!done && it < 30) {
        val t0 = System.nanoTime()
        val nm = edges.join(labels, edges("src") === labels("doc_id"))
          .groupBy(col("dst")).agg(min(col("label")).as("nmin"))
        val prop = labels.join(nm, labels("doc_id") === nm("dst"), "left")
          .select(labels("doc_id"), least(labels("label"), coalesce(col("nmin"), labels("label"))).as("label"))
        val next = prop.as("l")
          .join(prop.select(col("doc_id").as("p_id"), col("label").as("p_label")),
            col("l.label") === col("p_id"))
          .select(col("l.doc_id").as("doc_id"), col("p_label").as("label"))
          .localCheckpoint()
        val s = next.agg(sum(col("label"))).head.getLong(0)
        println(f"iter $it: sum=$s took ${(System.nanoTime()-t0)/1e9}%.2f s")
        done = s == last; last = s; labels = next; it += 1
      }
    case "q101warm" =>
      time("warm: checkpoint+window+explode") {
        import org.apache.spark.sql.expressions.Window
        val t = spark.range(10000).toDF("x").localCheckpoint()
        t.withColumn("r", row_number().over(Window.partitionBy(col("x") % 10).orderBy(col("x"))))
          .select(explode(array(col("x"), col("r"))).as("v"))
          .groupBy(col("v") % 7).count().count()
        t.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
        t.unpersist()
      }
      time("q101 run 1")(ops.DedupOps.dedupClusters(spark, dir).count())
      time("q101 run 2")(ops.DedupOps.dedupClusters(spark, dir).count())
    case "naaj" =>
      val df = ops.CoreOps.notInNullAware(spark, dir)
      df.collect()
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join")).mkString("\n"))
    case "variant" =>
      val df = Tables.events(spark, dir)
        .select(col("event_type"), expr("parse_json(props)").as("v"))
        .select(col("event_type"), expr("variant_get(v, '$.k', 'bigint')").as("k"))
        .groupBy(col("event_type")).agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))
      df.show()
      df.explain()
    case "lateral" =>
      Tables.customer(spark, dir).createOrReplaceTempView("customer")
      Tables.orders(spark, dir).createOrReplaceTempView("orders")
      val df = spark.sql("""
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM customer, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c_custkey <= 100
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey LIMIT 5""")
      df.show()
      df.explain()
    case "q101x2" =>
      time("q101 run 1")(ops.DedupOps.dedupClusters(spark, dir).count())
      time("q101 run 2")(ops.DedupOps.dedupClusters(spark, dir).count())
    case "metrics" =>
      val df = ops.DedupOps.nearDupJaccard(spark, dir)
      df.collect()
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        if (p.metrics.nonEmpty)
          println(p.nodeName + " -> " + p.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(", "))
        p.children.foreach(walk)
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
          case _ =>
        }
      }
      walk(df.queryExecution.executedPlan)
    // plan:<prefix> — executed plan of any registry query after one run
    // (post-AQE: the plan the bench actually pays for)
    case p if p.startsWith("plan:") =>
      val pref = p.drop(5)
      SparkEntry.queries.filter(_._1.startsWith(pref)).foreach { case (n, fn) =>
        val q = fn(spark, dir)
        println(s"===== $n")
        time(n)(q.count())
        println(q.queryExecution.executedPlan.toString.take(8000))
        graft.ops.Caches.release()
      }
    case "plans" =>
      for ((n, q) <- Seq[(String, org.apache.spark.sql.DataFrame)](
        ("q113", ops.CoreOps.scd2History(spark, dir)),
        ("q114", ops.CoreOps.transitSweep(spark, dir)))) {
        println(s"===== $n")
        q.collect()
        println(q.queryExecution.executedPlan.toString.take(4000))
      }
    case "q64" =>
      val df = ops.CoreOps.rangeJoinMonthly(spark, dir)
      df.explain("formatted")
      time("q64 binned")(df.count())
      time("q64 binned again")(ops.CoreOps.rangeJoinMonthly(spark, dir).count())
      // equivalence vs the date_trunc formulation
      val truncd = Tables.orders(spark, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"))
      val diff = df.select(col("month"), col("n_orders"))
        .except(truncd.select(col("month"), col("n_orders")))
      println("diff rows = " + diff.count())
    case "asof" =>
      val df = ops.EventOps.asofAttribution(spark, dir)
      df.explain("formatted")
      println("rows=" + df.count())
      df.show(5, false)
    case "rcte" =>
      val df = spark.sql(
        """WITH RECURSIVE t(n) AS (
          |  SELECT 1
          |  UNION ALL
          |  SELECT n + 1 FROM t WHERE n < 5
          |) SELECT * FROM t""".stripMargin)
      df.show()
    case "q187parts" =>
      val nb = expr("octet_length(encode(text, 'UTF-8'))")
      val hashed = Tables.documents(spark, dir)
        .select(col("doc_id"), nb.cast("long").as("nb"), col("text"))
        .filter(col("nb") > 0)
        .withColumn("bs", expr(
          "transform(sequence(0, 63), i -> CAST(ascii(substring(text, CAST((i * nb) DIV 64 AS INT) + 1, 1)) AS BIGINT))"))
        .withColumn("total", expr("aggregate(bs, 0L, (acc, b) -> acc + b)"))
        .withColumn("phash", expr(
          "aggregate(sequence(0, 63), 0L, (acc, i) -> acc + IF(element_at(bs, i + 1) * 64 > total, shiftleft(1L, CAST(i AS INT)), 0L))"))
        .select(col("doc_id"), col("phash"))
      time("hashed")(hashed.count())
      time("hashed2")(hashed.count())
      time("q187 full")(ops.MultimodalOps.phashNearDup(spark, dir).count())
      ops.MultimodalOps.phashNearDup(spark, dir).explain("formatted")
    case "all" =>
      time("q38")(ops.DedupOps.nearDupJaccard(spark, dir).count())
      time("q39")(ops.DedupOps.lshNearDupPairs(spark, dir).count())
      time("q59")(ops.DedupOps.simhashNearDup(spark, dir).count())
    case "r11" =>
      val df = time("q331")(ops.CoreOps.adaptiveSaltedHotKeyAudit(spark, dir))
      df.show(10, false)
      println(df.queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("__salt") || l.contains("sequence(0"))
        .take(6).mkString("\n"))
      val g = time("q332")(ops.SimilarityOps.autoGatedDerivedNearDup(spark, dir))
      println(s"q332 rows=${g.count()}; gate in plan: " +
        g.queryExecution.executedPlan.toString.contains("bit_count"))
      val ungated = ops.SimilarityOps.derivedNearDup(spark, dir)
      println("q332 == q319: " + (g.collect().toSeq == ungated.collect().toSeq))
      println("q135 gate absent: " + !ops.SimilarityOps.annNearDup(spark, dir)
        .queryExecution.executedPlan.toString.contains("bit_count"))
    case "q315jobs" =>
      val n = new java.util.concurrent.atomic.AtomicInteger
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = { n.incrementAndGet(); () }
      })
      time("q315")(ops.LinkageOps.goldenRecords(spark, dir).collect())
      Thread.sleep(500)
      println("jobs: " + n.get)
    case "idxcurve" =>
      // probe latency vs files-per-bucket at CONSTANT row count — the
      // measurement behind SimilarityOps.CompactTriggerFilesPerBucket.
      // The same band rows are rewritten with k×buckets upstream tasks:
      // hash(bk,bv) spreads the 128 (bk,bv) combos over k×8 partitions and
      // the V1 bucketed writer emits one file per (task × bucket it holds),
      // so files-per-bucket grows ~k while total rows stay identical —
      // isolating the small-files effect from data volume.
      val s = spark.newSession()
      graft.functions.VectorFunctions.register(s)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val nb = ops.SimilarityOps.BandIndexBuckets
      val tIdx = "graft_band_curve_probe"
      val path = new java.io.File(sys.props("java.io.tmpdir"), "graft_bkt_curve_probe")
      val rows = ops.SimilarityOps.explodeBands(ops.SimilarityOps.withBandSketch64(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))), Seq("srp"))
      def files = Option(path.listFiles()).getOrElse(Array.empty)
        .count(_.getName.startsWith("part-"))
      Seq(1, 2, 4, 8, 16, 32).foreach { k =>
        if (s.catalog.tableExists(tIdx)) s.sql(s"DROP TABLE $tIdx")
        def rmrf(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
        }
        rmrf(path)
        rows.repartition(k * nb, col("bk"), col("bv"))
          .write.format("parquet")
          .bucketBy(nb, "bk", "bv").sortBy("bk", "bv")
          .option("path", path.getAbsolutePath)
          .mode("overwrite").saveAsTable(tIdx)
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          ops.SimilarityOps.probeIndex(s, dir, tIdx).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[idxcurve] k=$k%3d files=$files files_per_bucket=${files.toDouble / nb}%5.1f probe_min3=$t%6.3f s")
      }
    case "q256reps" =>
      // q256 variance adjudication: rep-by-rep timing in one session —
      // does the min-to-median spread equal the cold `ids` persist build?
      (1 to 5).foreach { i =>
        time(s"q256 rep$i")(ops.DedupOps.containmentPairs(spark, dir).count())
      }
      ops.Caches.release()
      (1 to 2).foreach { i =>
        time(s"q256 cold$i")(ops.DedupOps.containmentPairs(spark, dir).count())
        ops.Caches.release()
      }
    case "q149parts" =>
      graft.functions.VectorFunctions.register(spark)
      val pairs = time("pairs")(ops.SimilarityOps.annNearDup(spark, dir)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
      val edges = pairs.select(explode(array(
          struct(col("doc_a").as("src"), col("doc_b").as("dst")),
          struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .persist()
      println("edges: " + time("edges.count")(edges.count()))
      val nodes = Tables.embeddings(spark, dir).select(col("vec_id").as("doc_id")).distinct()
      val lp = time("labelProp")(ops.DedupOps.labelPropagation(nodes, edges, 8))
      println("labelProp converged: " + lp.isDefined)
    case "streamprog" =>
      // per-microbatch duration breakdown of a representative streaming query
      import org.apache.spark.sql.streaming.Trigger
      graft.streaming.EventsStream.stageStreamDirMulti(spark, dir, nFiles = 2)
      val nParts = sys.env.getOrElse("PROBE_STATE_PARTS", "2").toInt
      (1 to 3).foreach { rep =>
        val name = "graft_probe_sesswin_" + nParts + "_" + rep
        graft.streaming.StreamJoinOps.withStatePartitions(spark, nParts) { s =>
          val t0 = System.nanoTime()
          val q = s.readStream
            .schema(graft.streaming.SessionStream.rawSchema)
            .option("maxFilesPerTrigger", 1)
            .parquet(graft.streaming.EventsStream.stageStreamDirMulti(spark, dir, nFiles = 2))
            .withColumn("ts", date_trunc("second", timestamp_micros(col("ts"))))
            .withColumn("cents", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .withWatermark("ts", "1 hour")
            .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
            .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("spend_cents"))
            .writeStream.outputMode("append").format("memory")
            .queryName(name).trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          println(f"[stream] rep $rep total ${(System.nanoTime() - t0) / 1e9}%.3f s")
          q.recentProgress.foreach { p =>
            println(s"[batch ${p.batchId}] rows=${p.numInputRows} durationMs=${p.durationMs}")
          }
        }
      }
    case "streamreuse" =>
      // r14 verdict #3's "reuse one cloned session" suggestion, measured:
      // same q240 shape as `streamprog`, but ONE clone serves all reps —
      // does the first-batch queryPlanning (~0.2-0.7 s/rep fresh) or the
      // per-rep compile count drop when the session is warm?
      import org.apache.spark.sql.streaming.Trigger
      import org.apache.spark.metrics.source.CodegenMetrics
      val srcDirR = graft.streaming.EventsStream.stageStreamDirMulti(spark, dir, nFiles = 2)
      val s = spark.newSession()
      s.conf.set("spark.sql.session.timeZone", spark.conf.get("spark.sql.session.timeZone"))
      s.conf.set("spark.sql.shuffle.partitions", "2")
      (1 to 4).foreach { rep =>
        val name = "graft_probe_reuse_" + rep
        val ckpt = s"/dev/shm/graft_probe_ck_$rep"
        s.conf.set("spark.sql.streaming.checkpointLocation", ckpt)
        val c0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
        val t0 = System.nanoTime()
        val q = s.readStream
          .schema(graft.streaming.SessionStream.rawSchema)
          .option("maxFilesPerTrigger", 1)
          .parquet(srcDirR)
          .withColumn("ts", date_trunc("second", timestamp_micros(col("ts"))))
          .withColumn("cents", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .withWatermark("ts", "1 hour")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("spend_cents"))
          .writeStream.outputMode("append").format("memory")
          .queryName(name).trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val dt = (System.nanoTime() - t0) / 1e9
        val c1 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
        println(f"[reuse] rep $rep wall=$dt%7.3f s compiles=${c1 - c0}")
        q.recentProgress.foreach { p =>
          println(s"  [batch ${p.batchId}] rows=${p.numInputRows} dur=${p.durationMs}")
        }
        s.catalog.dropTempView(name)
        org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        val pth = new org.apache.hadoop.fs.Path(ckpt)
        pth.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pth, true)
        ()
      }
    case "ensureparts" =>
      graft.functions.VectorFunctions.register(spark)
      // warm everything once
      time("q342 cold")(SparkEntry.queries("q342_manifest_index")(spark, dir).count())
      (1 to 2).foreach { i =>
        val s = spark.newSession()
        graft.functions.VectorFunctions.register(s)
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val (tIdx, root, _) = time(s"ensureManifestIndex mfx $i")(
          ops.SimilarityOps.ensureManifestIndex(s, dir, "mfx", Some(col("vec_id") % 2 === 0)))
        time(s"probeIndex $i")(ops.SimilarityOps.probeIndex(s, dir, tIdx).count())
      }
      time("q342 warm")(SparkEntry.queries("q342_manifest_index")(spark, dir).count())
      time("q343 warm")(SparkEntry.queries("q343_index_knn")(spark, dir).count())
      time("q339 warm")(SparkEntry.queries("q339_nightly_dedup")(spark, dir).count())
    case "q341parts" =>
      graft.functions.VectorFunctions.register(spark)
      import graft.ops.SimilarityOps
      // warm the caches/codegen once
      time("q341 cold")(SparkEntry.queries("q341_two_day_incremental")(spark, dir).count())
      time("q341 warm")(SparkEntry.queries("q341_two_day_incremental")(spark, dir).count())
      // phase decomposition (warm): ann pairs, per-day incrementalCC, window
      val emb = Tables.embeddings(spark, dir).select(col("vec_id"))
      // exact path via the operator's own formula (r14 advice: the old
      // tmpdir prefix-glob could pick a stale pre-fingerprint dir or a
      // leftover lock file, or throw if absent)
      time("ylab read")(println("ylab rows=" +
        spark.read.parquet(
          ops.SimilarityOps.yesterdayLabelsPath(dir, 0.35).getAbsolutePath).count()))
      val pairs = ops.SimilarityOps.annNearDup(spark, dir, 0.35)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")).persist()
      time("ann pairs materialize")(println("pairs=" + pairs.count()))
      time("ann pairs again")(pairs.count())
      time("q341 warm2")(SparkEntry.queries("q341_two_day_incremental")(spark, dir).count())
      time("q341 warm3")(SparkEntry.queries("q341_two_day_incremental")(spark, dir).count())
    case jq if jq.startsWith("streamfloor:") =>
      // per-batch floor decomposition of REAL registry streaming queries
      // (r14 verdict #3 — measure the microbatch floor before touching it):
      // durationMs phases + state-operator commit/update times via the
      // withStatePartitions probe listener, plus whole-stage-codegen
      // compilation counts and time per rep (CodegenMetrics' static
      // histograms — compiles inside warm reps mean the codegen cache is
      // missing per batch, e.g. per-batch watermark literals).
      val prefixes = jq.drop(12).split(",")
      val names = SparkEntry.queries.keys.toSeq.sorted
        .filter(n => prefixes.exists(n.startsWith))
      val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      graft.streaming.StreamJoinOps.probeListener.set(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit = {
            val p = e.progress
            val so = p.stateOperators.map(s =>
              s"${s.operatorName}{commit=${s.commitTimeMs}ms upd=${s.allUpdatesTimeMs}ms " +
                s"rowsTot=${s.numRowsTotal}}").mkString(" ")
            progress.add(s"  [batch ${p.batchId}] rows=${p.numInputRows} " +
              s"dur=${p.durationMs} $so")
          }
        })
      import org.apache.spark.metrics.source.CodegenMetrics
      def comp() = (CodegenMetrics.METRIC_COMPILATION_TIME.getCount,
        CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getMean)
      names.foreach { n =>
        (1 to 3).foreach { rep =>
          val c0 = comp()._1
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, dir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          org.apache.spark.sql.graftbridge.GraftSqlBridge.waitListenerEmpty(spark)
          val (c1, mean1) = comp()
          println(f"[floor] $n rep$rep wall=$dt%7.3f s  compiles=${c1 - c0} (hist mean ${mean1}%.1f ms)")
          progress.forEach(l => println(l)); progress.clear()
          ops.Caches.release()
        }
      }
      graft.streaming.StreamJoinOps.probeListener.set(null)
    case jq if jq.startsWith("plansdump:") =>
      // plansdump:<outdir>:<suffix>:<prefix,prefix,...> — write each query's
      // POST-EXECUTION .explain("formatted") (the AQE-final plan) to
      // <outdir>/<name>_<suffix>.txt (the r14 optimization-evidence files)
      val Array(outDir, suffix, prefixStr) = jq.drop(10).split(":", 3)
      val prefixes = prefixStr.split(",")
      val od = new java.io.File(outDir); od.mkdirs()
      SparkEntry.queries.keys.toSeq.sorted
        .filter(n => prefixes.exists(n.startsWith)).foreach { n =>
          val df = SparkEntry.queries(n)(spark, dir)
          df.count() // execute so AQE finalizes
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val f = new java.io.File(od, s"${n}_$suffix.txt")
          val w = new java.io.PrintWriter(f, "UTF-8")
          try w.write(plan) finally w.close()
          println(s"[plansdump] wrote ${f.getPath} (${plan.length} chars)")
          ops.Caches.release()
        }
    case jq if jq.startsWith("warm:") =>
      // warm-vs-cold timing for a comma-separated prefix list, one JVM
      val prefixes = jq.drop(5).split(",")
      val names = SparkEntry.queries.keys.toSeq.sorted
        .filter(n => prefixes.exists(n.startsWith))
      names.foreach { n =>
        time(s"$n cold")(SparkEntry.queries(n)(spark, dir).count())
        time(s"$n warm")(SparkEntry.queries(n)(spark, dir).count())
        time(s"$n warm2")(SparkEntry.queries(n)(spark, dir).count())
        ops.Caches.release()
      }
    case jq if jq.startsWith("jobtrace:") && SparkEntry.queries.contains(jq.drop(9)) =>
      // per-job callsite + duration trace — where does a loop query's job
      // count (and wall) go? Second run is traced (warm: caches + codegen).
      val name = jq.drop(9)
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
      @volatile var trace = false
      @volatile var traceT0 = 0L
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          if (trace) {
            val cs = Option(e.properties.getProperty("callSite.short")).getOrElse("?")
            starts.put(e.jobId, (System.nanoTime(), cs, e.stageInfos.size)); ()
          }
        }
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          if (trace) Option(starts.get(e.jobId)).foreach { case (t0, cs, ns) =>
            println(f"[job ${e.jobId}%3d] t=${(t0 - traceT0) / 1e9}%7.3f +${(System.nanoTime() - t0) / 1e9}%6.3f s  $ns%2d stages  $cs")
          }
        }
      })
      time(s"$name cold")(SparkEntry.queries(name)(spark, dir).count())
      trace = true
      traceT0 = System.nanoTime()
      time(s"$name warm")(SparkEntry.queries(name)(spark, dir).count())
      Thread.sleep(500)
    case jq if jq.startsWith("jobs:") && SparkEntry.queries.contains(jq.drop(5)) =>
      // Spark-job count for any registry query — the wall-clock-independent
      // round-economy metric (the q315 77→68 measurement generalized)
      val name = jq.drop(5)
      val n = new java.util.concurrent.atomic.AtomicInteger
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = { n.incrementAndGet(); () }
      })
      time(name)(SparkEntry.queries(name)(spark, dir).count())
      Thread.sleep(500)
      println(s"jobs($name): " + n.get)
    case name if SparkEntry.queries.contains(name) =>
      val df = time(name)(SparkEntry.queries(name)(spark, dir))
      time(s"$name collect")(df.show(20, false))
  }
}
