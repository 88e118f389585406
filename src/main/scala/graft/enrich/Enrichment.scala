package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The batched-enrichment operator (SURVEY.md §2.8) — the reference pipeline's
  * core: classify the *distinct* keys of a column through an external batched
  * classifier, then map results back onto every row.
  *
  * Plan shape (kept from the reference because Catalyst cannot derive it —
  * it is the pipeline's defining optimization, dag:147-159 + :384-396):
  *
  * {{{
  *   distinct(trim(key)) filter nonEmpty          // O(distinct) not O(rows)
  *     .repartition(ceil(n / keysPerPartition))   // bound batches per task
  *     .mapPartitions(grouped(batchSize) -> classifyWithRetry)
  *     -> dropDuplicates(original)                // D5, dag:359-366
  *     -> left_semi guard against asked keys      // J3, dag:590-603
  *   rows left-join broadcast(mapping) on trim(key)
  *     coalesce(category, 'Не определена')        // default fill, dag:395
  * }}}
  *
  * Scale notes: the expensive external call runs once per distinct key — at
  * 100 TB the distinct-key set (job titles, field names) stays tiny relative
  * to the fact rows, and the mapping broadcast keeps the map-back join
  * shuffle-free. If the distinct set ever outgrew the broadcast threshold the
  * same code degrades gracefully to a shuffled join by dropping `broadcast()`.
  */
object Enrichment {

  /** Retry semantics around one batch, mirroring dag:283-318: items missing
    * from the reply are re-batched up to `maxRetries` times; still-missing
    * items become default-filled stubs (dag:310-326). `retryOther=true`
    * reproduces the field-task behavior of treating 'Другое' as a failure
    * worth retrying (dag:623-628); the title task's laxer rule is `false`.
    */
  def classifyBatchWithRetry(
      classifier: Classifier,
      batch: Seq[String],
      maxRetries: Int,
      retryOther: Boolean): Seq[Classified] = {
    var pending = batch
    var acc = Map.empty[String, Classified]
    var attempt = 0
    while (pending.nonEmpty && attempt <= maxRetries) {
      val replies =
        try classifier.classify(pending)
        catch { case scala.util.control.NonFatal(_) => Nil } // dag:302-307: exception == empty reply
      val asked = pending.toSet
      // D5 per-batch dedup (keep first) + J3 semi-join guard (drop hallucinated keys)
      val valid = replies.filter(r => asked.contains(r.original))
        .groupBy(_.original).map { case (_, vs) => vs.head }
      val ok = valid.filter(r =>
        r.category != Defaults.Unclassified && (!retryOther || r.category != Defaults.Other))
      acc ++= ok.map(r => r.original -> r)
      pending = pending.filterNot(k => acc.contains(k))
      attempt += 1
    }
    // exhausted -> stub records, never dropped rows (dag:310-326)
    batch.map(k => acc.getOrElse(k, Classified(k, Defaults.Unclassified, "")))
  }

  /** Distinct-key classification as a Dataset op. The repartition bounds how
    * many keys land in one task so external-API batches parallelize evenly;
    * `grouped(batchSize)` amortizes the per-call fixed cost exactly like the
    * reference's 15/10-key batches (dag:330, :669).
    */
  def classifyKeys(
      keys: Dataset[String],
      classifier: Classifier,
      batchSize: Int = 15,
      maxRetries: Int = 1,
      retryOther: Boolean = false,
      keysPerPartition: Int = 300): Dataset[Classified] = {
    val spark = keys.sparkSession
    import spark.implicits._
    // the count below is an unavoidable action (partition sizing needs n);
    // persist first so the distinct-key plan — and everything under it —
    // materializes once instead of once for the count and again for the
    // classify pass
    val cached = keys.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = cached.count()
    val parts = math.max(1, math.min(cached.rdd.getNumPartitions, (n / keysPerPartition).toInt + 1))
    cached
      .repartition(parts)
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(b => classifyBatchWithRetry(classifier, b.toSeq, maxRetries, retryOther))
      }
  }

  /** Full enrichment: J1/J2 broadcast map-back with default-fill.
    *
    * Adds `categoryCol` (and `specializationCol` if non-empty) to `df` by
    * classifying distinct `keyCol` values. Empty/blank keys classify as
    * 'Не указано' without ever reaching the classifier (dag:750-753); keys
    * the classifier could not resolve get 'Не определена' (dag:392-396).
    */
  def enrich(
      df: DataFrame,
      keyCol: String,
      classifier: Classifier,
      categoryCol: String,
      specializationCol: String = "",
      batchSize: Int = 15,
      maxRetries: Int = 1,
      retryOther: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val keys = df
      .select(trim(col(keyCol)).as("original"))
      .filter(col("original") =!= "")
      .distinct()
      .as[String]

    val classified = classifyKeys(keys, classifier, batchSize, maxRetries, retryOther)
    val mapping = classified.toDF("original", "__cat", "__spec")

    val joined = df.join(broadcast(mapping), trim(col(keyCol)) === col("original"), "left")
    val withCat = joined.withColumn(
      categoryCol,
      when(trim(col(keyCol)) === "" || col(keyCol).isNull, lit(Defaults.NotSpecified))
        .otherwise(coalesce(col("__cat"), lit(Defaults.Unclassified))))
    val withSpec =
      if (specializationCol.isEmpty) withCat
      else withCat.withColumn(
        specializationCol,
        when(trim(col(keyCol)) === "" || col(keyCol).isNull, lit(Defaults.NotSpecified))
          .otherwise(coalesce(when(col("__spec") =!= "", col("__spec")), lit(Defaults.Unclassified))))
    withSpec.drop("original", "__cat", "__spec")
  }
}
