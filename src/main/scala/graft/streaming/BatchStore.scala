package graft.streaming

import org.apache.spark.sql.SparkSession

/** Listing/deletion over the `root/batch=<id>` partition layout the
  * streaming stores share. Exists so [[DocStream.compact]] /
  * [[VecStream.compact]] can SNAPSHOT the set of admitted batches before
  * rebuilding the base and then delete ONLY the delta partitions that
  * snapshot covered: a delta admitted by a concurrent micro-batch after
  * the listing survives (probes keep unioning it; the next compact folds
  * it), instead of being silently dropped by a whole-directory delete —
  * the r7 ADVICE concurrency hole.
  */
private[streaming] object BatchStore {

  /** Batch ids of `batch=<id>` children under `root`; empty if `root`
    * does not exist. Resolved against root's own filesystem.
    */
  def listBatchIds(spark: SparkSession, root: String): Seq[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("batch=") =>
        n.stripPrefix("batch=").toLong }
      .sorted
  }

  /** Delete `root/batch=<id>` for each id; missing partitions are
    * ignored (a delta may legitimately lag its docs partition — the
    * write order inside a micro-batch is delta first, docs second).
    */
  def deleteBatches(spark: SparkSession, root: String,
      ids: Seq[Long]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    ids.foreach { id =>
      val p = new org.apache.hadoop.fs.Path(s"$root/batch=$id")
      p.getFileSystem(conf).delete(p, true)
    }
    // best-effort: remove the root once empty (non-recursive, so a
    // partition admitted concurrently makes this a harmless no-op)
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(conf)
    try if (fs.exists(rp) && fs.listStatus(rp).isEmpty) fs.delete(rp, false)
    catch { case _: java.io.IOException => () }
  }
}
