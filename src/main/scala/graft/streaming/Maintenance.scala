package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Index maintenance: small-file compaction for the streaming sink's
  * daily partitions.
  *
  * [[IngestPipeline.writeBatch]] partitions by (persist_date, epoch_id):
  * every micro-batch epoch adds its own directory with one file per
  * write task. At streaming cadence a day accumulates thousands of tiny
  * files — the classic read-side scale killer (per-file footer reads,
  * scheduler pressure, no row-group locality). The reference never hits
  * this because ES merges segments in the background (es.go's daily
  * indices); a parquet index needs an explicit compaction pass.
  *
  * [[compactDay]] rewrites one CLOSED day into ≈[[DefaultTargetBytes]]
  * files, sorted within each file by event time (parquet min/max stats
  * then prune time-range reads), into a NEW directory — and the
  * date-pinned alias view repoints atomically
  * (`Ingest.pointIndexAlias`), so readers never observe a partial
  * rewrite and the original day's files stay until cleanup. Compaction
  * is for closed days only: an open day's epoch_id layout is what makes
  * replay rewrites idempotent (epoch_id survives as a data COLUMN after
  * compaction, so provenance is kept even though the directory level is
  * flattened).
  */
object Maintenance {

  /** ≈ one parquet row-group-friendly file. */
  val DefaultTargetBytes: Long = 128L << 20

  /** Compact the `date` partition of `indexDir` into `outDir`.
    * Returns the number of parquet files actually written (range
    * partitioning can leave partitions empty when rows are few, and
    * Spark writes no file for an empty partition). Target file count =
    * ceil(current physical bytes / targetBytes), measured from the
    * filesystem (not estimated from rows): compaction sizing must track
    * the ENCODED size or post-compaction files drift from the target as
    * encodings change.
    *
    * repartitionByRange on event time — NOT round-robin: each output
    * file then covers a disjoint time slice, so its parquet min/max
    * ingestion_time stats let a time-range read skip whole files. A
    * round-robin split would sort within files but give every file the
    * full day's span — zero file-level pruning, defeating the point of
    * the sort. (Range partitioning tracks the time distribution, so a
    * bursty day yields uneven file sizes; that is the right trade —
    * pruning beats byte-equal files for a time-keyed index.) */
  def compactDay(spark: SparkSession, indexDir: String, date: String,
      outDir: String, targetBytes: Long = DefaultTargetBytes): Int = {
    require(date.matches("\\d{4}-\\d{2}-\\d{2}"),
      s"date must be yyyy-MM-dd, got: $date")
    val dayPath = new Path(indexDir, s"persist_date=$date")
    val fs = dayPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var bytes = 0L
    val it = fs.listFiles(dayPath, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(indexDir)
      .filter(col("persist_date") === date)
      .repartitionByRange(nFiles, col("ingestion_time"))
      .sortWithinPartitions(col("ingestion_time"))
      .write.mode("overwrite").parquet(outDir)
    val outIt = fs.listFiles(new Path(outDir), true)
    var written = 0
    while (outIt.hasNext) {
      if (outIt.next().getPath.getName.endsWith(".parquet")) written += 1
    }
    written
  }
}
