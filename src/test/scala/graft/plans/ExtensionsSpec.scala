package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One conf = the whole engine: a session created with
  * `spark.sql.extensions=graft.plans.GraftExtensions` has the optimizer
  * rules AND the full SQL function surface with no register call. */
class ExtensionsSpec extends AnyFunSuite {

  test("extension session exposes st_* and pipeline SQL functions") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // withExtensions: the programmatic twin of the static conf
      // `spark.sql.extensions=graft.plans.GraftExtensions` (the conf is
      // static and ignored once a SparkContext exists, as in this suite)
      val spark = SparkSession.builder().master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import spark.implicits._
      Seq((1L, Seq(Seq(0.0, 0, 3, 0, 3, 3, 0, 3, 0, 0)), "the cat and the dog"))
        .toDF("id", "poly", "text").createOrReplaceTempView("ext_t")
      val r = spark.sql(
        """SELECT st_area(poly) a,
                  st_polygon_intersects_bounds(poly, 1, 1, 2, 2) hit,
                  st_asgeojson_polygon(poly) gj,
                  lang_id(text) lang,
                  doc_fingerprint(text) fp
           FROM ext_t""").head()
      assert(r.getDouble(0) == 9.0)
      assert(r.getBoolean(1))
      assert(r.getString(2).startsWith("""{"type":"Polygon""""))
      assert(r.getString(3) == "en")
      // rules are installed in this session's optimizer
      val ruleNames = spark.sessionState.optimizer.extendedOperatorOptimizationRules
        .map(_.getClass.getSimpleName)
      assert(ruleNames.contains("SpatialFilePruning") &&
        ruleNames.contains("SpatialJoinRewrite"), ruleNames.toString)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
