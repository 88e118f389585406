package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming face of the near-dup dedup family: MinHash-LSH banding run as a
  * Structured Streaming query over a documents landing directory — the shape
  * of a continuously-ingesting corpus where dedup must keep up with arrival
  * instead of re-sweeping the world nightly (the incremental cousin of q142's
  * delta-vs-corpus batch join).
  */
object DocsStream {

  /** Explicit landing schema (streaming sources require one; the stagers
    * write exactly this layout, same discipline as [[EventsStream]]).
    */
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Stage the documents table as `nFiles` hash-split parquet files with
    * strictly increasing mtimes — microbatch k delivers docs with
    * doc_id ≡ k (mod nFiles), so band buckets genuinely accumulate members
    * ACROSS batches (a near-dup pair split across files can only be found by
    * state carried between microbatches, which is the thing this operator
    * exists to prove).
    */
  private[graft] def stageDocsDirMulti(spark: SparkSession, dir: String,
                                       nFiles: Int = 2): String = {
    val base = sys.props("java.io.tmpdir") +
      s"/graft_stream_docs_${math.abs(dir.hashCode)}_$nFiles"
    graft.ops.Staging.ensure(spark, base,
      (0 until nFiles).map(k => f"docs_$k%02d.parquet")) {
      val docs = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      (0 until nFiles).foreach { k =>
        EventsStream.writeOneFile(spark,
          docs.filter(pmod(col("doc_id"), lit(nFiles)) === k),
          base, f"docs_$k%02d.parquet", 1000L * (k + 1))
      }
    }
  }

  /** Streaming MinHash-LSH near-dup pairs — q39's banded sweep as a stateful
    * streaming aggregation, hash-matched against the SAME oracle as batch
    * q39 ([[graft.ops.DedupOps.lshPairsOracleSql]]).
    *
    * Dataflow: each microbatch computes per-doc band keys row-locally (the
    * one-pass [[graft.functions.MinhashSigs]] codegen kernel — identical to
    * the batch operator), explodes to (band, key, doc_id), and folds into a
    * streaming aggregation keyed on (band, key) whose state value is the
    * bucket's member set. `collect_set` is a mergeable declarative aggregate,
    * so cross-batch accumulation is set-union in state — order-independent,
    * which is what makes the streaming result DETERMINISTIC and equal to the
    * batch banding regardless of arrival order. Candidate expansion and the
    * exact-Jaccard verify run batch-side on the drained buckets (only
    * buckets with ≥ 2 members expand; precision is exact because every
    * candidate is re-verified on true word sets).
    *
    * Scale honesty: complete-mode bucket state is the corpus's banded
    * membership — the right shape for proving batch≡streaming equality, and
    * bounded by (docs × bands) longs, but a production 100 TB stream would
    * run update-mode with `flatMapGroupsWithState` emitting each NEW
    * (arrival × existing-member) candidate per batch and watermark-expiring
    * cold buckets; the banding math, state key, and verify are unchanged.
    * State lives in the state store (2 partitions here; RocksDB-provider
    * equality is covered by StreamScaleSpec for the events family).
    */
  /** Streaming Misra-Gries heavy hitters — the q147 sketch as STREAMING
    * aggregation state: each microbatch's word stream folds into one ≤k-entry
    * MG counter table held in the state store (the same
    * `TypedImperativeAggregate` buffer the batch op uses; streaming state
    * stores the serialized buffer and merges per batch, exactly the
    * mergeability MG was chosen for). The drained sketch is audited
    * batch-side: the exact global top-10 words must all sit inside the MG
    * theorem envelope est ∈ [exact − N/(k+1), exact]. The envelope — not the
    * raw counters — is the output contract, because MG counter values
    * depend on merge order (q147's same discipline); the BOOLEANS are
    * deterministic theorems. At 100 TB the state is k counters per group
    * TOTAL, the only way streaming heavy hitters fits in a state store at
    * web-vocabulary cardinality.
    */
  def mgHeavyHittersStreaming(spark: SparkSession, dir: String, k: Int = 16): DataFrame = {
    import graft.ops.TextFunctions
    import org.apache.spark.sql.expressions.Window
    val name = "graft_stream_mg_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val srcDir = stageDocsDirMulti(spark, dir, nFiles = 2)
    val drained = StreamJoinOps.withStatePartitions(spark, 2, skipFinalize = true) { s =>
      graft.functions.VectorFunctions.register(s)
      val q = s.readStream
        .schema(docSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
        .select(explode(TextFunctions.words(col("text"))).as("word"))
        .groupBy()
        .agg(call_function("graft_mg", col("word"), lit(k)).as("sk"),
          count(lit(1)).as("n"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      StreamJoinOps.drainMemorySink(s, name)
    }
    val est = drained.select(col("n"), explode(col("sk")).as(Seq("word", "est")))
    val top10 = graft.Tables.documents(spark, dir)
      .select(explode(TextFunctions.words(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt_exact"))
      .withColumn("rk", row_number().over(
        Window.orderBy(desc("cnt_exact"), col("word"))))
      .filter(col("rk") <= 10)
    top10
      .crossJoin(broadcast(drained.select(col("n"))))
      .join(est.select(col("word"), col("est")), Seq("word"), "left")
      .select(col("word"), col("cnt_exact"),
        (coalesce(col("est"), lit(0L)) <= col("cnt_exact") &&
          coalesce(col("est"), lit(0L)) >= col("cnt_exact") - expr(s"n DIV ${k + 1}"))
          .as("mg_ok"))
      .orderBy(col("word"))
  }

  val mgHeavyHittersOracle: String =
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |cnt AS (SELECT word, count(*) AS cnt_exact FROM toks GROUP BY 1),
      |top10 AS (SELECT word, cnt_exact FROM (
      |  SELECT *, row_number() OVER (ORDER BY cnt_exact DESC, word) AS rk FROM cnt)
      |  WHERE rk <= 10)
      |SELECT word, cnt_exact, TRUE AS mg_ok FROM top10 ORDER BY word""".stripMargin

  def lshNearDupStreaming(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.{DedupOps, OracleMath, TextFunctions}
    val name = "graft_stream_lsh_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val srcDir = stageDocsDirMulti(spark, dir, nFiles = 2)
    val drained = StreamJoinOps.withStatePartitions(spark, 2, skipFinalize = true) { s =>
      graft.functions.VectorFunctions.register(s)
      val hashes = transform(array_distinct(TextFunctions.words(col("text"))),
        w => TextFunctions.wordHash(w))
      val q = s.readStream
        .schema(docSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
        .select(col("doc_id"), posexplode(DedupOps.bandKeys(hashes)).as(Seq("band", "key")))
        .groupBy(col("band"), col("key"))
        .agg(collect_set(col("doc_id")).as("ids"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      StreamJoinOps.drainMemorySink(s, name)
    }
    // batch-side: expand buckets to candidate pairs and verify. r15 (verdict
    // #4): the verify now follows batch q39's MASK-GROUP CONTRACTION, not
    // just its skinny-row discipline — the duplicate-heavy corpus used to
    // expand ~27M doc-level candidates per run (identical word sets share
    // every band, so their buckets explode quadratically in doc count).
    // Identical word sets have identical masks AND identical band keys
    // (MinHash is order-independent over the set), so the bucket membership
    // collapses to DISTINCT MASKS per bucket: the candidate self-join runs
    // at mask level with the popcount Jaccard INLINE in the join condition
    // (only passing pairs become rows), mask pairs dedupe pre-expansion
    // (≤ LshBands duplicates), and doc pairs are produced by exploding the
    // two mask groups' id lists — identical-mask pairs are J = 1 ≥ t by
    // definition and always co-bucketed, exactly batch q39's withinPairs.
    // A general (> 64-word) vocabulary degrades to the r14 doc-level path.
    val members = drained.filter(size(col("ids")) >= 2)
      .select(col("band"), col("key"), explode(col("ids")).as("doc_id"))
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(TextFunctions.words(col("text"))).as("ws0"))
    DedupOps.smallVocab(docs) match {
      case Some(vocab) =>
        val docMask = docs.select(col("doc_id"), DedupOps.maskExpr(vocab, col("ws0")).as("mask"))
        val groups = docMask.groupBy(col("mask"))
          .agg(collect_list(col("doc_id")).as("ids"), count(lit(1)).as("n"))
        val bucketMasks = members
          .join(broadcast(docMask), "doc_id")
          .select(col("band"), col("key"), col("mask"))
          .dropDuplicates("band", "key", "mask")
        val jCond = bit_count(col("a.mask").bitwiseAND(col("b.mask"))).cast("double") /
          bit_count(col("a.mask").bitwiseOR(col("b.mask")))
        val j = bit_count(col("mask_a").bitwiseAND(col("mask_b"))).cast("double") /
          bit_count(col("mask_a").bitwiseOR(col("mask_b")))
        val crossPairs = bucketMasks.as("a").join(bucketMasks.as("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key")
              && col("a.mask") < col("b.mask") && jCond >= lit(DedupOps.NearDupThreshold))
          .select(col("a.mask").as("mask_a"), col("b.mask").as("mask_b"))
          .dropDuplicates("mask_a", "mask_b")
          .join(broadcast(groups.select(col("mask").as("mask_a"), col("ids").as("ids_a"))), "mask_a")
          .join(broadcast(groups.select(col("mask").as("mask_b"), col("ids").as("ids_b"))), "mask_b")
          .select(explode(col("ids_a")).as("x"), col("ids_b"), j.as("j"))
          .select(col("x"), explode(col("ids_b")).as("y"), col("j"))
          .select(least(col("x"), col("y")).as("doc_a"),
            greatest(col("x"), col("y")).as("doc_b"), col("j"))
        val withinPairs = groups.filter(col("n") > 1)
          .select(explode(col("ids")).as("x"), col("ids"))
          .select(col("x"), explode(col("ids")).as("y"))
          .filter(col("x") < col("y"))
          .select(col("x").as("doc_a"), col("y").as("doc_b"), lit(1.0).as("j"))
        crossPairs.unionByName(withinPairs)
          .select(col("doc_a"), col("doc_b"), OracleMath.stableRound(col("j"), 4).as("jaccard"))
          .orderBy(col("doc_a"), col("doc_b"))
      case None =>
        val cand = members.as("a").join(members.as("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key")
              && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        val ws = docs.select(col("doc_id"), array_sort(col("ws0")).as("v"))
        val jac = size(array_intersect(col("v_a"), col("v_b"))).cast("double") /
          size(array_union(col("v_a"), col("v_b")))
        cand
          .join(broadcast(ws.select(col("doc_id").as("doc_a"), col("v").as("v_a"))), "doc_a")
          .join(broadcast(ws.select(col("doc_id").as("doc_b"), col("v").as("v_b"))), "doc_b")
          .withColumn("j", jac)
          .filter(col("j") >= DedupOps.NearDupThreshold)
          .select(col("doc_a"), col("doc_b"), OracleMath.stableRound(col("j"), 4).as("jaccard"))
          .dropDuplicates("doc_a", "doc_b")
          .orderBy(col("doc_a"), col("doc_b"))
    }
  }
}
