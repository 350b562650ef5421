package graft.refdata

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config.Dischema.RefDataSource
import graft.rules.ConstraintException

/** Lazy, cached reference-data loader
  * (ref: backends/base/reference_data.py:37-94 ReferenceFile/ReferenceURI/
  * ReferenceTable, spark/reference_data.py:17-38): a refdata entity is read
  * only on first access and cached for the run; the mapping itself is
  * immutable.
  */
final class RefDataLoader(
    spark: SparkSession,
    sources: Map[String, RefDataSource],
    baseDir: String = ".") {

  private val cache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def sourceNames: Set[String] = sources.keySet

  def load(name: String): Option[DataFrame] =
    sources.get(name).map(src => cache.getOrElseUpdate(name, read(src)))

  /** Times a refdata file has actually been opened (for laziness tests). */
  def loadedCount: Int = cache.size

  private def read(src: RefDataSource): DataFrame = src.kind match {
    case "filename" =>
      val p = if (src.location.startsWith("/")) src.location
              else s"$baseDir/${src.location.stripPrefix("./")}"
      readFile(p)
    case "uri"   => readFile(src.location)
    case "table" => spark.table(src.location)
    case other   => throw new ConstraintException(s"unknown reference data source kind: '$other'")
  }

  private def readFile(path: String): DataFrame =
    if (path.endsWith(".csv")) spark.read.option("header", true).csv(path)
    else if (path.endsWith(".json") || path.endsWith(".jsonl")) spark.read.json(path)
    else spark.read.parquet(path)

  /** Provider form for EntityCatalog's lazy refdata resolution. */
  def asProvider: String => Option[DataFrame] = load
}
