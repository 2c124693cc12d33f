package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions registers the SQL function surface through the
  * supported SparkSessionExtensions mechanism (cluster deployment path).
  */
class ExtensionsSpec extends SparkSpec {

  test("functions resolve in a session built withExtensions") {
    // force a NEW session over the shared context — getOrCreate would
    // silently return the existing default session without applying
    // the extensions
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        """SELECT cosine_distance(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS cd,
          |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
          |       l2_distance(array(0.0F, 0.0F), array(3.0F, 4.0F)) AS l2,
          |       l2_norm(array(3.0D, 4.0D)) AS n,
          |       l2_norm(l2_normalize(array(3.0F, 4.0F))) AS un
          |""".stripMargin).collect()(0)
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1) - 11.0) < 1e-12)
      assert(math.abs(r.getDouble(2) - 5.0) < 1e-12)
      assert(math.abs(r.getDouble(3) - 5.0) < 1e-12)
      assert(math.abs(r.getDouble(4) - 1.0) < 1e-6)
    } finally {
      // shared-JVM: do not stop the underlying context; restore the
      // suite session as default/active for subsequent suites
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
