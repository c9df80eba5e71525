package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Serving-side data resolution (app.py:98-116): the trainer writes
  * timestamped `api_app_info_*` parquet directories; the API picks the
  * newest by mtime at startup, reads it, and caches it for the query
  * layer. Pure driver-side bookkeeping — the data itself stays
  * distributed (read + cache, never collect).
  */
object ServingData {

  /** Newest directory under `base` whose name starts with `prefix`,
    * by filesystem mtime (app.py:98-108). None when absent — the
    * caller decides whether that is a startup error. */
  def findLatestDataPath(base: Path,
      prefix: String = "api_app_info_"): Option[Path] = {
    if (!Files.isDirectory(base)) return None
    // Files.list holds a directory handle until closed (Javadoc requires
    // try-with-resources) — materialize inside Using so it never leaks.
    val dirs = scala.util.Using.resource(Files.list(base)) { st =>
      st.iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(prefix))
        .toSeq
    }
    if (dirs.isEmpty) None
    else Some(dirs.maxBy(p => Files.getLastModifiedTime(p).toMillis))
  }

  /** Read + cache the latest serving parquet (app.py:110-116). The
    * returned frame is cached so every endpoint query after startup
    * scans memory, not disk. */
  def loadApiData(spark: SparkSession, base: Path,
      prefix: String = "api_app_info_"): Option[DataFrame] =
    findLatestDataPath(base, prefix).map { p =>
      spark.read.parquet(p.toString).cache()
    }
}
