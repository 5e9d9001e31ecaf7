package graft.util

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Driver-side parquet metadata probes — the jobless way to feed
  * corpus-size hints to the auto-sizers (`SimHash.autoBlocks`,
  * `Ann.autoBits`/`autoNlist`). A `df.count()` at plan-build time
  * re-evaluates the whole upstream lineage as an extra Spark job before
  * the real job runs (at 100 TB that is a full extra scan); the row
  * count is already sitting in every parquet footer, so read it there:
  * a file listing plus one footer read per file, no executors, no data
  * pages.
  */
object ParquetMeta {

  /** Total record count of a parquet file or directory (non-recursive,
    * `*.parquet` leaves only — the layout every writer in this engine
    * produces). Footer metadata only; no Spark job.
    */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val root = fs.getFileStatus(p)
    val files =
      if (root.isDirectory)
        fs.listStatus(p).filter(s =>
          s.isFile && s.getPath.getName.endsWith(".parquet"))
      else Array(root)
    files.foldLeft(0L) { (acc, st) =>
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      try acc + r.getRecordCount
      finally r.close()
    }
  }
}
