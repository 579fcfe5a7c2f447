package object graft {
  /** Contract type for every declared query: (session, sfDir) => result. */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
