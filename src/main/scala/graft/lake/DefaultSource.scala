package graft.lake

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  RelationProvider}

/** `spark.read.format("graft.lake").load(path)` — the generic-reader
  * surface over [[LakeTable]]. Resolves to the same
  * [[LakeFileIndex]]-backed relation as [[LakeTable.scan]], so
  * manifest-stats file pruning and manifest-size split planning apply
  * to format-string readers and `CREATE TABLE ... USING graft.lake`
  * alike — no programmatic API required. Options:
  *
  *   - `version` (optional): time travel to that commit; defaults to
  *     the current snapshot.
  */
class DefaultSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft.lake reads require a path: spark.read.format(\"graft.lake\").load(path)"))
    val spark = sqlContext.sparkSession
    val t = LakeTable.forPath(spark, path)
    val version = parameters.get("version").map(_.toInt)
      .getOrElse(t.currentVersion)
    new LakeFileIndex(spark, path, t.manifest(version)).relation
  }
}
