package object graft {
  /** Every operator is a pure (session, scale-factor dir) => DataFrame so it
    * drops straight into SparkEntry.queries (SURVEY.md §7.1). */
  type QFn = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
