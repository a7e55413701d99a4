package graft.gen

import graft.SparkSpec

class EventGenSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic events honor the reference's exact field domains (B4)") {
    val rows = EventGen.syntheticEvents(spark, 200, seed = 7)
      .as[(String, String, String, String, String)].collect()
    assert(rows.length == 200)
    rows.foreach { case (user, etype, url, ts, utm) =>
      assert(user.matches("user_\\d+") && user.drop(5).toInt < EventGen.NumUsers)
      assert(EventGen.EventTypes.contains(etype))
      assert(EventGen.Urls.contains(url))
      assert(ts.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z""")) // ISO-8601 'Z'
      assert(EventGen.UtmSources.contains(utm))
    }
  }

  test("same seed reproduces identical events; different seed differs") {
    val a = EventGen.syntheticEvents(spark, 100, seed = 42).collect().toSeq
    val b = EventGen.syntheticEvents(spark, 100, seed = 42).collect().toSeq
    val c = EventGen.syntheticEvents(spark, 100, seed = 43).collect().toSeq
    assert(a == b)
    assert(a != c)
  }

  test("generation is partition-layout independent (id-derived, not rand)") {
    // rand(seed) streams depend on the partition layout; the murmur3(id, seed)
    // derivation must not — the same rows at parallelism 1 and 13.
    def sorted(parts: Int) =
      EventGen.syntheticEvents(spark, 100, seed = 42, partitions = parts)
        .collect().toSeq.sortBy(_.getString(3)) // timestamp is unique per id
    assert(sorted(1) == sorted(13))
  }

  test("jsonEnvelope emits one JSON object per row with field names") {
    val df = Seq((1L, "x")).toDF("id", "v")
    val out = EventGen.jsonEnvelope(df).as[String].head()
    assert(out == """{"id":1,"v":"x"}""")
  }

  test("csvReplay takes the first n rows in file order with the REES46 schema") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    val csv =
      """event_time,event_type,product_id,category_id,category_code,brand,price,user_id,user_session
        |2019-10-01 00:00:00,view,44600062,2103807459595387724,,shiseido,35.79,541312140,s1
        |2019-10-01 00:00:11,cart,3601530,2053013563810775923,appliances.kitchen.washer,lg,712.87,518085591,s2
        |2019-10-01 00:02:14,purchase,1004856,2053013555631882655,electronics.smartphone,samsung,128.42,518085591,s2
        |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/c.csv"), csv)
    val vals = EventGen.csvReplay(spark, s"$dir/c.csv", 2).as[String].collect()
    assert(vals.length == 2)
    assert(vals.head.contains("\"event_type\":\"view\""))
    assert(vals.head.contains("\"brand\":\"shiseido\""))
    assert(vals(1).contains("\"event_type\":\"cart\""))
  }

  test("pyJsonEnvelope is byte-identical to the reference json.dumps envelope") {
    // Expected byte strings are the literal output of CPython's
    // json.dumps(row).encode('utf-8') for these rows — the serializer the
    // reference producer installs (kafka_stream.pyc @ 42-43) — computed
    // once offline and pinned here. Key order = column order; default
    // separators put a space after ':' and ','.
    val events = Seq(
      ("user_3", "click", "/cart", "2025-07-28T00:00:00Z", "google"),
      ("user_0", "page_view", "/home", "2025-07-28T01:02:03Z", "organic"))
      .toDF("user_id", "event_type", "url", "timestamp", "utm_source")
    val got = EventGen.pyJsonEnvelope(events).as[String].collect()
    val want = Seq(
      """{"user_id": "user_3", "event_type": "click", "url": "/cart", "timestamp": "2025-07-28T00:00:00Z", "utm_source": "google"}""",
      """{"user_id": "user_0", "event_type": "page_view", "url": "/home", "timestamp": "2025-07-28T01:02:03Z", "utm_source": "organic"}""")
    assert(got.toSet == want.toSet)
    got.zip(got.map(_.getBytes("UTF-8"))).foreach { case (s, b) =>
      assert(s.getBytes("UTF-8").sameElements(b)) // ASCII: bytes == chars
    }

    // the CSV-replay contract: a DictReader row is ALL strings in header
    // order, empty fields stay empty strings
    val rees46 = Seq((
      "2019-10-01 00:00:00 UTC", "view", "44600062", "2103807459595387724",
      "", "shiseido", "35.79", "541312140",
      "72d76fde-8bb3-4e00-8c23-a032dfed738c"))
      .toDF("event_time", "event_type", "product_id", "category_id",
        "category_code", "brand", "price", "user_id", "user_session")
    assert(EventGen.pyJsonEnvelope(rees46).as[String].head() ==
      """{"event_time": "2019-10-01 00:00:00 UTC", "event_type": "view", "product_id": "44600062", "category_id": "2103807459595387724", "category_code": "", "brand": "shiseido", "price": "35.79", "user_id": "541312140", "user_session": "72d76fde-8bb3-4e00-8c23-a032dfed738c"}""")

    // escaping parity: backslash first, then quotes (json.dumps order)
    val tricky = Seq("a\"b\\c").toDF("k")
    assert(EventGen.pyJsonEnvelope(tricky).as[String].head() ==
      "{\"k\": \"a\\\"b\\\\c\"}")

    // control chars: json.dumps emits the C0 shorthands for \b\f\n\r\t and
    // \u00XX for the rest — CPython: json.dumps({"k": "x\ny\tz"}) ==
    // '{"k": "x\\ny\\tz"}', json.dumps({"k": "a\x01b"}) == '{"k": "a\\u0001b"}'
    val ctl = Seq("x\ny\tz").toDF("k")
    assert(EventGen.pyJsonEnvelope(ctl).as[String].head() ==
      "{\"k\": \"x\\ny\\tz\"}")
    val ctlLow = Seq("a\u0001b\u001fc").toDF("k")
    assert(EventGen.pyJsonEnvelope(ctlLow).as[String].head() ==
      "{\"k\": \"a\\u0001b\\u001fc\"}")

    // null policy: a NULL value serializes as the empty string (the
    // DictReader contract is all-strings; the key must never vanish)
    val withNull = Seq((Option.empty[String], "v")).toDF("a", "b")
    assert(EventGen.pyJsonEnvelope(withNull).as[String].head() ==
      """{"a": "", "b": "v"}""")
  }

  test("writeKafka passes a pre-enveloped single-value frame through untouched") {
    // The reference topic contract: writeKafka(pyJsonEnvelope(df), ...)
    // must ship exactly the envelope bytes. The kafka connector jar is
    // absent here, so pin the pass-through seam writeKafka applies before
    // the sink: an already-enveloped frame is NOT re-wrapped.
    val df = Seq(("u1", "click")).toDF("user_id", "event_type")
    val env = EventGen.pyJsonEnvelope(df)
    assert(env.columns.sameElements(Array("value")))
    val twice = EventGen.pyJsonEnvelope(env.toDF())
    assert(twice.as[String].head() != env.as[String].head(),
      "double-enveloping must differ — the guard in writeKafka is load-bearing")
  }
}
