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

  test("curation scalar surface is callable from SQL and equals the Column API") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat on the mat with a hat for a rat"),
      (2L, "visit https://x.y/z or mail a@b.c now   ok"),
      (3L, "a7b extracts 7 and 3.5 stays 3")).toDF("id", "text")
    df.createOrReplaceTempView("docs")
    val sql = spark.sql(
      """SELECT id, graft_scrub(text) AS sc, graft_fingerprint(text) AS fp,
        |  graft_lang_id(text) AS lid, graft_ws_tokens(text) AS wt,
        |  graft_subword_tokens(text) AS st, graft_repetition(text).top_word_pm AS twp,
        |  graft_to_int(text) AS ti, graft_to_float(text) AS tf
        |FROM docs ORDER BY id""".stripMargin).collect()
    val api = df.select(col("id"),
        graft.llm.TextAnalysis.scrub(col("text")).as("sc"),
        graft.llm.TextAnalysis.fingerprintCol(col("text")).as("fp"),
        graft.llm.TextAnalysis.langId(col("text")).as("lid"),
        graft.llm.TextAnalysis.wsTokens(col("text")).as("wt"),
        graft.llm.TextAnalysis.subwordTokens(col("text")).as("st"),
        graft.llm.TextAnalysis.repetitionSignals(col("text")).getField("top_word_pm").as("twp"),
        graft.functions.StringFns.toIntDigitRun(col("text")).as("ti"),
        graft.functions.StringFns.toFloatDigitRun(col("text")).as("tf"))
      .orderBy("id").collect()
    assert(sql.map(_.toSeq).toSeq === api.map(_.toSeq).toSeq,
      "SQL registration must produce the exact Column-API results")
    assert(sql(1).getString(1) === "visit <url> or mail <email> now ok")
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
