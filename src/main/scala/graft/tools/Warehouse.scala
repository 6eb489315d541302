package graft.tools

import org.apache.spark.sql.SparkSession

/** Managed-table hygiene shared by the bucketed-table writers
  * (SpatialJoin.saveGeomsBucketedByCell, Dedup.saveCorpusBucketedByHash). */
private[graft] object Warehouse {

  /**
   * Drop `table` AND delete any stale managed directory so a CTAS can
   * recreate it: a fresh session's in-memory catalog doesn't know the
   * table, but its managed location can survive from a previous run and
   * fail the write. Prefers the catalog's own location for a live
   * table; falls back to the default-database layout <warehouse>/<name>
   * when the catalog has never heard of it.
   *
   * Only unqualified names are allowed: the recovery maps the name to a
   * managed location, and for "db.tbl" that mapping (and the delete)
   * would target the wrong directory.
   */
  def resetManagedTable(spark: SparkSession, table: String): Unit = {
    require(!table.contains(".") && table.matches("[A-Za-z0-9_]+"),
      s"table must be an unqualified [A-Za-z0-9_]+ name, got '$table'")
    val loc =
      try {
        val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
        if (spark.sessionState.catalog.tableExists(ident))
          new org.apache.hadoop.fs.Path(
            spark.sessionState.catalog.getTableMetadata(ident).location)
        else new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.defaultTablePath(ident))
      } catch {
        case _: org.apache.spark.sql.catalyst.parser.ParseException =>
          throw new IllegalArgumentException(s"invalid table name '$table'")
      }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val whFs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (whFs.exists(loc)) whFs.delete(loc, true)
  }
}
