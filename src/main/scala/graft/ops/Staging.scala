package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Idempotent scratch-dir staging with self-healing: a stage is valid only
  * when its `_STAGED` marker AND every expected data path exist. A
  * half-staged dir — marker without data or data without marker, left by a
  * crashed run, tmp-space reclamation, or another process writing the same
  * path — is wiped and rebuilt instead of silently poisoning every query
  * that reads it (a marker-only check once turned the pipeline e2e into a
  * 0-row result when an unrelated stage claimed its directory).
  */
object Staging {

  /** Root for PER-RUN scratch output (deleted and rewritten every call —
    * q100's sink+checkpoint, q130's overwrite table): tmpfs when the host
    * offers it, else `java.io.tmpdir` — the same placement decision the
    * streaming checkpoints already make (StreamJoinOps: "checkpoint to the
    * fast reliable store"). Idempotent STAGED dirs deliberately stay under
    * `java.io.tmpdir`: they persist across runs and tmpfs does not.
    */
  lazy val perRunRoot: String = {
    // Deployment knob (r14 verdict #8): per-run scratch placement is an
    // explicit choice, not a silent local assumption — a cluster points
    // SPARK_GRAFT_SCRATCH at its fast staging store (HDFS/S3/local NVMe).
    // Default: tmpfs only when it is present AND has headroom — tmpfs is
    // RAM-backed and typically capped at 50% RAM, so a larger scale factor's
    // sink/overwrite scratch must degrade to java.io.tmpdir instead of
    // hitting ENOSPC or memory pressure (r14 advice).
    sys.env.get("SPARK_GRAFT_SCRATCH").getOrElse {
      val shm = new java.io.File("/dev/shm")
      val minFreeBytes = 8L << 30
      if (shm.isDirectory && shm.canWrite && shm.getUsableSpace > minFreeBytes) "/dev/shm"
      else sys.props("java.io.tmpdir")
    }
  }

  /** Run `write` unless `base` already holds a completed stage; returns
    * `base`. `dataPaths` are base-relative paths that must exist for the
    * stage to count as complete (the marker alone is not trusted).
    */
  def ensure(spark: SparkSession, base: String, dataPaths: Seq[String])
            (write: => Unit): String = {
    val basePath = new Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done = new Path(base + "/_STAGED")
    val valid = fs.exists(done) &&
      dataPaths.forall(p => fs.exists(new Path(base + "/" + p)))
    if (!valid) {
      fs.delete(basePath, true)
      fs.mkdirs(basePath)
      write
      fs.create(done).close()
    }
    base
  }
}
