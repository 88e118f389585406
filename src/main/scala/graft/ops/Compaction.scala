package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the lakehouse maintenance operator. Streaming
  * ingest and fine-grained partitioning both produce directories of
  * kilobyte-scale files; at 100 TB that means millions of files, and scan
  * cost becomes dominated by open/footer overhead and driver listing rather
  * than bytes (every file is a task, every footer a round trip). Compaction
  * rewrites a directory into ⌈total bytes / target⌉ near-target-size files.
  *
  * `coalesce` (not `repartition`): compaction must not pay a shuffle — it
  * only needs fewer, bigger outputs, so narrowing the partition count and
  * letting each task concatenate input splits is the right plan. The write
  * goes through Spark's normal committer, so a crashed compaction never
  * corrupts the source (rewrite-then-swap is the caller's move).
  */
object Compaction {
  /** Total data bytes under `dir` (non-hidden files, recursive). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
        total += f.getLen
    }
    total
  }

  /** Rewrite the parquet directory `inDir` as ⌈bytes/targetBytes⌉ files in
    * `outDir`; returns the output file count.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long = 128L * 1024 * 1024): Int = {
    val n = math.max(1L, (dataBytes(spark, inDir) + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).coalesce(n).write.mode("overwrite").parquet(outDir)
    val out = new Path(outDir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(out).count(s => s.getPath.getName.startsWith("part-"))
  }
}
