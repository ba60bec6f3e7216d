package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** V9 (SURVEY.md §2.2): session-context probe — the reference's
  * `sf-whoami` connectivity check (`current_warehouse()/current_
  * database()/current_schema()/current_role()`, `current_timestamp()`;
  * samples/sf-whoami.step.sh). Spark has no warehouse/role; catalog +
  * database + user + timestamp are the equivalents.
  */
object SessionInfo {
  def whoami(spark: SparkSession): DataFrame =
    spark.sql(
      """SELECT current_catalog()   AS catalog,
        |       current_database()  AS database,
        |       current_user()      AS user,
        |       current_timestamp() AS ts,
        |       version()           AS engine_version""".stripMargin)
}
