package graft

/** SQL-registered function surface (SparkSessionExtensions). */
class GraftExtensionsSpec extends SparkSpec {

  test("match_any_regex is callable from SQL with varargs and array forms") {
    import spark.implicits._
    Seq("test.city", "shop.orders", "mytest.x").toDF("topic").createOrReplaceTempView("t")
    val varargs = spark.sql(
      "SELECT topic FROM t WHERE match_any_regex(topic, 'test\\\\.')ORDER BY topic")
      .collect().map(_.getString(0)).toSeq
    assert(varargs === Seq("mytest.x", "test.city")) // unanchored find
    val arr = spark.sql(
      "SELECT topic FROM t WHERE match_any_regex(topic, array('^shop', 'nomatch')) ORDER BY topic")
      .collect().map(_.getString(0)).toSeq
    assert(arr === Seq("shop.orders"))
    // empty pattern set => match-all (F1)
    val empty = spark.sql("SELECT count(*) FROM t WHERE match_any_regex(topic)").collect()(0).getLong(0)
    assert(empty === 3L)
  }

  test("two match_any_regex instances share a codegen scope without fallback") {
    import spark.implicits._
    // Regression: doGenCode used fixed local names (`s`, `i`); with a
    // non-nullable child nullSafeCodeGen emits no enclosing block, so two
    // instances in one projection redeclared the locals and Janino failed,
    // silently dropping to interpreted eval. fallback=false makes that fatal.
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = Seq("test.city", "shop.orders", "mytest.x").toDF("topic")
        .selectExpr(
          "topic",
          "match_any_regex(topic, 'test\\\\.') AS a",
          "match_any_regex(topic, '^shop') AS b",
          "match_any_regex(topic, 'orders$', 'city$') AS c")
        .orderBy("topic")
        .collect()
        .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
        .toSeq
      assert(rows === Seq(
        ("mytest.x", true, false, false),
        ("shop.orders", false, true, true),
        ("test.city", true, false, true)))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
