package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the exact / near-duplicate
  * family of a training-data pipeline (north-star extension): exact hash
  * dedup, word-set dedup, MinHash signatures + LSH banding, an *exact*
  * prefix-filtered Jaccard similarity self-join, and SimHash fingerprints.
  *
  * Scale design: every dedup here is a shuffle on a *derived small key*
  * (hash, set-signature, band bucket, prefix token) — never an all-pairs
  * cross join. The exact similarity join uses PPJoin-style prefix filtering
  * (rarest-token prefixes, lossless for a Jaccard threshold), so the
  * candidate space at 100 TB is bounded by token-posting-list sizes, and the
  * MinHash-LSH variant bounds it further when approximate recall is
  * acceptable.
  */
object DedupOps {
  import TextFunctions._

  /** Exact duplicate groups (full-text key): representative + group size.
    * At scale the group key would be `xxhash64(text)` to avoid shuffling
    * full text; here the text itself keeps the oracle trivial.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("group_size"))
      .select(col("rep_doc_id"), col("group_size"))
      .orderBy(col("rep_doc_id"))

  /** Word-set dedup: documents with identical distinct-word sets (order- and
    * multiplicity-insensitive) collapse to one group — catches shuffled
    * duplicates exact hashing misses. Group key = sorted distinct word array.
    */
  def dedupWordSet(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(array_sort(array_distinct(words(col("text")))).as("ws"))
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("group_size"))
      .select(col("rep_doc_id"), col("group_size"), size(col("ws")).cast("long").as("set_size"))
      .orderBy(col("rep_doc_id"))

  /** MinHash parameters: k independent permutations (a_i·h + b_i) mod P over
    * the word-set hashes. Deterministic constants so the oracle can replay
    * them.
    */
  val MinhashK = 8
  def perm(i: Int, h: Column): Column = (lit(2L * i + 3) * h + lit(7L * i + 1)) % P

  /** MinHash signatures (k=8) per document — the sketch that powers
    * [[lshNearDupPairs]]. Pure array math, no shuffle.
    */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val hs = wordSetHashes(col("text"))
    val sigCols = (0 until MinhashK).map(i => array_min(transform(hs, h => perm(i, h))).as(s"mh$i"))
    Tables.documents(spark, dir)
      .select(col("doc_id") +: sigCols: _*)
      .orderBy(col("doc_id"))
  }

  /** EXACT near-duplicate pairs with word-set Jaccard ≥ `threshold`, via
    * prefix filtering: order the vocabulary rarest-first (global term counts,
    * ties by word), keep each document's first ⌊(1−t)·|set|⌋+1 tokens in that
    * order as its *prefix*; any pair with J ≥ t must share a prefix token
    * (lossless filter), so candidates come from a token-bucket self-join on
    * prefixes only, then exact Jaccard verification. This is the scalable
    * exact path; the oracle brute-forces all pairs.
    */
  def nearDupJaccard(spark: SparkSession, dir: String, threshold: Double = 0.9): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    import graft.functions.VectorFunctions.sortedIntersectSize
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(words(col("text"))).as("ws0"))

    // Global rarity rank of every word (vocabulary-sized → broadcast). The
    // rank doubles as an integer token id: the verify step then merges sorted
    // int arrays (codegen kernel) instead of intersecting string arrays, and
    // the shuffle moves ~4B per token instead of whole words. At web scale
    // the exact window-rank would become an approximate df-ordered dictionary.
    val ranks = docs
      .select(explode(col("ws0")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("df"))
      .select(col("word"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("df"), col("word"))).as("tok"))

    // int-ified ascending word-set: rarest tokens get the smallest ids, so a
    // doc's prefix (PPJoin) is simply the first ⌊(1-t)·sz⌋+1 array elements
    val ids = docs
      .select(col("doc_id"), explode(col("ws0")).as("word"))
      .join(broadcast(ranks), "word")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("tok"))).as("ws"), count(lit(1)).as("sz"))

    // EXACT integer arithmetic for the filter bounds — float forms are wrong
    // at boundaries: 1-0.9 = 0.0999…8 makes floor(sz·0.1)+1 one too short for
    // sz divisible by 10 (lossy prefix!), and sz >= 0.9·other fails for
    // exactly-boundary pairs (18 >= 18.000000000000004). Found as 5 missing
    // pairs vs the brute-force oracle at sf0.1. Threshold t = tNum/tDen;
    // prefix length = sz - ceil(t·sz) + 1, length filter tDen·a >= tNum·b.
    val tNum = math.round(threshold * 1000).toInt
    val tDen = 1000
    val prefixLen = (col("sz") - floor((col("sz") * tNum + (tDen - 1)) / tDen) + 1).cast("int")
    val prefixes = ids.select(col("doc_id"), col("sz"),
      explode(slice(col("ws"), lit(1), prefixLen)).as("tok"))

    // Candidate pairs share >=1 prefix token (lossless for J >= t), with the
    // PPJoin length filter applied at the join: J >= t forces
    // t·|B| <= |A| <= |B|/t, pruning size-mismatched pairs before any work.
    val cands = prefixes.as("a").join(prefixes.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id")
          && col("a.sz") * tDen >= col("b.sz") * tNum
          && col("b.sz") * tDen >= col("a.sz") * tNum)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))

    // Verify FIRST (cheap codegen kernel on broadcast-joined arrays — no
    // shuffle), dedupe the multiplicity only on the small passing set: a
    // shared-k-prefix-tokens pair costs k kernel calls but avoids shuffling
    // the full candidate multiset, which dominated the wall clock.
    val docA = ids.select(col("doc_id").as("doc_a"), col("ws").as("ws_a"), col("sz").as("sz_a"))
    val docB = ids.select(col("doc_id").as("doc_b"), col("ws").as("ws_b"), col("sz").as("sz_b"))
    cands.join(broadcast(docA), "doc_a").join(broadcast(docB), "doc_b")
      .withColumn("inter", sortedIntersectSize(col("ws_a"), col("ws_b")))
      .withColumn("j", col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("j") >= threshold)
      .select(col("doc_a"), col("doc_b"), OracleMath.stableRound(col("j"), 4).as("jaccard"))
      .dropDuplicates("doc_a", "doc_b")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Approximate near-dup pairs via MinHash-LSH banding (4 bands × 2 rows
    * over the k=8 signature) + exact Jaccard verification of candidates.
    * Same output shape as [[nearDupJaccard]] but the candidate set comes
    * from band-bucket collisions (shuffle on band keys) — the 100 TB path
    * when even prefix-filtered joins run hot. Approximate recall ⇒ no SQL
    * oracle (driver rows-check); precision is exact because candidates are
    * re-verified against true Jaccard.
    */
  def lshNearDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.9): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    import graft.functions.VectorFunctions.sortedIntersectSize
    // Word hashes double as integer token ids (no global dictionary pass —
    // unlike the exact prefix join, LSH needs no corpus statistics, which is
    // its 100 TB selling point). Hash collisions would perturb Jaccard by
    // < 1e-3 at this vocabulary size; acceptable for an approximate operator.
    val hs = wordSetHashes(col("text"))
    val sig = transform(sequence(lit(0L), lit(MinhashK - 1L)),
      i => array_min(transform(hs, h => ((lit(2L) * i + lit(3L)) * h + (lit(7L) * i + lit(1L))) % P)))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), sort_array(transform(hs, _.cast("int"))).as("ws"), sig.as("sig"))
      .withColumn("sz", size(col("ws")))

    // 4 bands × 2 rows: band key = (band index, the 2 signature values).
    // Candidates stay SKINNY (two longs) through the band self-join; arrays
    // attach afterwards via broadcast map-joins. An exactly-once-emission
    // variant (per-band joins guarded by "earlier bands differ", arrays
    // carried through the join) was measured 2× slower on this
    // collision-dense data — array materialization at the join dominates.
    val banded = docs.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(MinhashK / 2 - 1)),
          b => concat_ws("_", b, element_at(col("sig"), b * 2 + 1), element_at(col("sig"), b * 2 + 2)))).as("band"))

    val cands = banded.as("a").join(banded.as("b"), Seq("band"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))

    // verify-then-dedupe: at most 4 duplicate verifications per pair, and the
    // kernel verify is cheaper than shuffling the candidate multiset for an
    // early distinct
    val docA = docs.select(col("doc_id").as("doc_a"), col("ws").as("ws_a"), col("sz").as("sz_a"))
    val docB = docs.select(col("doc_id").as("doc_b"), col("ws").as("ws_b"), col("sz").as("sz_b"))
    cands.join(broadcast(docA), "doc_a").join(broadcast(docB), "doc_b")
      .withColumn("inter", sortedIntersectSize(col("ws_a"), col("ws_b")))
      .withColumn("j", col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("j") >= threshold)
      .select(col("doc_a"), col("doc_b"), OracleMath.stableRound(col("j"), 4).as("jaccard"))
      .dropDuplicates("doc_a", "doc_b")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Fuzzy key matching: distinct-key pairs within a small edit distance —
    * the typo-dedup cousin of the set-based near-dup joins (classic for
    * normalizing user-entered titles before enrichment). Quadratic over
    * *distinct keys* only (the reference's own distinct-first optimization
    * keeps this tiny even when the fact table is 100 TB).
    */
  def fuzzyKeyPairs(spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val names = Tables.part(spark, dir).select(col("p_name")).distinct()
    val a = names.select(col("p_name").as("name_a"))
    val b = names.select(col("p_name").as("name_b"))
    a.join(b, col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** SimHash (16-bit) over the distinct word set: bit i of the fingerprint is
    * the sign of Σ_w (±1 by bit i of a scrambled word hash). Near-duplicates
    * land at small Hamming distance; the fingerprint is one long per doc so
    * dedup at scale is a cheap groupBy/band on fingerprint prefixes.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val h2 = transform(wordSetHashes(col("text")), h => (h * 48271L) % 2147483647L)
    val bitCols = (0 until 16).map { i =>
      when(aggregate(h2, lit(0L),
        (acc, h) => acc + (shiftright(h, i).bitwiseAND(lit(1L)) * 2 - 1)) > 0,
        lit(1L << i)).otherwise(lit(0L))
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), bitCols.reduce(_ + _).as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs via bit-band blocking: split the 16-bit
    * fingerprint into 4 nibbles; pairs within Hamming distance ≤ 3 must agree
    * on at least one nibble (pigeonhole — lossless blocking), so candidates
    * come from 4 nibble-bucket self-joins, then exact popcount verification.
    * The whole pipeline runs on one long per doc — the cheapest near-dup
    * operator at 100 TB (no arrays shuffled at all). Rows-check (bit-level
    * sketch, no SQL twin).
    */
  def simhashNearDup(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(spark, dir) // (doc_id, simhash)
    def nib(c: Column, i: Int): Column = shiftright(c, i * 4).bitwiseAND(lit(0xFL))
    val a = sh.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    // Exactly-once emission: join per nibble index k with the static guard
    // "all earlier nibbles differ" — works here (unlike the MinHash band
    // join, where it measured 2x slower) because candidate rows are two
    // longs, so no array materialization cost and no dedup shuffle at all.
    val perNib = (0 until 4).map { k =>
      val earlierDiffer = (0 until k)
        .map(i => nib(col("sh_a"), i) =!= nib(col("sh_b"), i))
        .foldLeft(lit(true))(_ && _)
      a.join(broadcast(b),
        nib(col("sh_a"), k) === nib(col("sh_b"), k)
          && col("doc_a") < col("doc_b") && earlierDiffer)
    }
    perNib.reduce(_ unionByName _)
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------------------

  def oracle: Map[String, String] = Map(
    "q35_dedup_exact" ->
      """SELECT min(doc_id) AS rep_doc_id, count(*) AS group_size
        |FROM documents GROUP BY text ORDER BY rep_doc_id""".stripMargin,
    "q36_dedup_wordset" ->
      """SELECT min(doc_id) AS rep_doc_id, count(*) AS group_size,
        | CAST(len(ws) AS BIGINT) AS set_size
        |FROM (SELECT doc_id, list_sort(list_distinct(string_split(text,' '))) AS ws FROM documents)
        |GROUP BY ws ORDER BY rep_doc_id""".stripMargin,
    "q37_minhash_sigs" -> {
      val sigSelects = (0 until MinhashK).map { i =>
        s"list_min(list_transform(hs, h -> (${2L * i + 3}*h + ${7L * i + 1}) % ${P})) AS mh$i"
      }.mkString(",\n ")
      s"""SELECT doc_id, $sigSelects
         |FROM (SELECT doc_id, list_transform(list_distinct(string_split(text,' ')), w -> ${wordHashSql("w")}) AS hs
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin
    },
    "q38_neardup_jaccard" ->
      s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | ${OracleMath.stableRoundSql("CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) / len(list_distinct(list_concat(a.ws, b.ws)))", 4)} AS jaccard
        |FROM (SELECT doc_id, list_sort(list_distinct(string_split(text,' '))) ws FROM documents) a
        |JOIN (SELECT doc_id, list_sort(list_distinct(string_split(text,' '))) ws FROM documents) b
        |  ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) / len(list_distinct(list_concat(a.ws, b.ws))) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
