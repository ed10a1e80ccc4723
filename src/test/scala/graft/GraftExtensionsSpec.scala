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
}
