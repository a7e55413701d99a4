package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic clickstream event generation + replay — the engine-side
  * equivalents of the reference's producer task (O14–O16, SURVEY.md §2.1):
  *
  *  - `generate_user_event` (kafka_stream.pyc @ 23-40): one random 5-field
  *    event from fixed domains;
  *  - JSON envelope `json.dumps(...).encode()` (@ 42-43);
  *  - CSV→Kafka replay of the first n rows (@ 58-82).
  *
  * Differences by design: generation is distributed (`spark.range`), seeded
  * (declared queries must be deterministic, SURVEY.md §7.4), and throttling is
  * trigger-based in streaming mode instead of per-record sleeps (§6: the
  * reference caps itself at ~3 rec/s by sleeping; a rate-limited source gives
  * the same capability without the anti-pattern).
  */
object EventGen {

  // Exact field domains of kafka_stream.pyc @ 32-37.
  val EventTypes: Seq[String] = Seq("page_view", "click", "add_to_cart", "purchase")
  val Urls: Seq[String] = Seq("/home", "/products/1", "/products/2", "/cart", "/checkout")
  val UtmSources: Seq[String] = Seq("facebook", "google", "tiktok_ads", "organic")
  val NumUsers = 50

  /** Field pick: murmur3 of (row id, seed) mod the domain size. A pure
    * function of the id VALUE — unlike `rand(seed)`, whose stream depends on
    * the partition layout, this reproduces identically at any parallelism or
    * cluster size.
    */
  private def pick(domain: Seq[String], id: org.apache.spark.sql.Column,
      seed: Long): org.apache.spark.sql.Column =
    element_at(typedlit(domain),
      (pmod(hash(id, lit(seed)), lit(domain.size)) + 1).cast("int"))

  /** ISO-8601 UTC rendering with a TRUTHFUL 'Z': date_format renders in the
    * session timezone, so a non-UTC session would produce local wall clock
    * falsely labeled UTC. convert_timezone pins the wall clock to UTC first
    * (identity when the session is already UTC, as every in-repo entry
    * point is).
    */
  private def utcIso(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    date_format(convert_timezone(current_timezone(), lit("UTC"), ts),
      "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** One definition of the user-id derivation, shared by the batch and
    * stream generators so they can never disagree on user assignment.
    */
  private def userId(id: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column =
    concat(lit("user_"),
      pmod(hash(id, lit(seed)), lit(NumUsers)).cast("long").cast("string"))

  /** n synthetic events, seeded => reproducible (every field derives from
    * (id, seed) via murmur3 — partition-layout-independent). Timestamps are a
    * fixed base plus one second per row (deterministic, unlike utcnow in the
    * reference; the ISO-8601 'Z' format matches kafka_stream.pyc @ 36
    * exactly). `partitions` > 0 pins the range parallelism (tests use it to
    * prove layout independence).
    */
  def syntheticEvents(spark: SparkSession, n: Long, seed: Long,
      baseEpoch: Long = 1753664400L /* 2025-07-28T01:00:00Z, the reference DAG start */,
      partitions: Int = 0): DataFrame = {
    val ids = if (partitions > 0) spark.range(0L, n, 1L, partitions) else spark.range(n)
    ids.select(
      userId(col("id"), seed).as("user_id"),
      pick(EventTypes, col("id"), seed + 1).as("event_type"),
      pick(Urls, col("id"), seed + 2).as("url"),
      utcIso(timestamp_seconds(lit(baseEpoch) + col("id"))).as("timestamp"),
      pick(UtmSources, col("id"), seed + 3).as("utm_source"))
  }

  /** Streaming variant: rate source → same projection (timestamps from the
    * source; rowsPerSecond is the principled replacement for per-row sleep).
    * Fields derive from the rate source's monotonically increasing `value`.
    */
  def syntheticEventStream(spark: SparkSession, rowsPerSecond: Int, seed: Long): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(
        userId(col("value"), seed).as("user_id"),
        pick(EventTypes, col("value"), seed + 1).as("event_type"),
        pick(Urls, col("value"), seed + 2).as("url"),
        utcIso(col("timestamp")).as("timestamp"),
        pick(UtmSources, col("value"), seed + 3).as("utm_source"))

  /** O15 — the UTF-8 JSON envelope: every row becomes one JSON object. */
  def jsonEnvelope(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

  /** Reference-parity Kafka envelope — byte-identical to the producer's
    * `json.dumps(row).encode('utf-8')` (kafka_stream.pyc @ 42-43) for
    * ASCII rows: Python's default separators (`", "`, `": "`), keys in
    * dict insertion order = this frame's column order, and every value a
    * JSON STRING (the reference sends `csv.DictReader` rows untouched
    * @ 69-74, and its generated events are all strings @ 32-37). Escaping
    * matches json.dumps over the full ASCII range: backslash first, then
    * quote, the five C0 shorthands (\b \f \n \r \t), and every other
    * control char below 0x20 as \u00XX. Non-ASCII would need ensure_ascii
    * \uXXXX — the fixture domains and the REES46 schema are ASCII, so
    * parity holds where the contract does. NULL policy: a NULL column
    * value serializes as the empty string (`coalesce` before escaping) —
    * the DictReader contract is all-strings, so a null has no reference
    * counterpart and silently dropping the key (what a bare concat_ws
    * would do) is the one behavior that can never be right.
    */
  def pyJsonEnvelope(df: DataFrame): DataFrame = {
    // Chained literal replaces keep this inside codegen; backslash MUST be
    // first or it would re-escape the escapes it just introduced.
    val escapes: Seq[(String, String)] =
      Seq("\\" -> "\\\\", "\"" -> "\\\"", "\b" -> "\\b", "\f" -> "\\f",
        "\n" -> "\\n", "\r" -> "\\r", "\t" -> "\\t") ++
        (0x00 until 0x20).filterNot(Set(0x08, 0x09, 0x0a, 0x0c, 0x0d))
          .map(i => i.toChar.toString -> f"\\u$i%04x")
    def esc(c: Column): Column =
      escapes.foldLeft(coalesce(c.cast("string"), lit(""))) {
        case (acc, (from, to)) => call_function("replace", acc, lit(from), lit(to))
      }
    val pieces = df.columns.map { name =>
      concat(lit("\"" + name + "\": \""), esc(col(name)), lit("\""))
    }
    df.select(concat(lit("{"), concat_ws(", ", pieces: _*), lit("}")).as("value"))
  }

  /** The public REES46 clickstream CSV schema (B3 in FIXTURES.md; the file
    * the reference replays, kafka_stream.pyc @ 61).
    */
  val ClickstreamSchema: String =
    "event_time TIMESTAMP, event_type STRING, product_id LONG, category_id LONG, " +
      "category_code STRING, brand STRING, price DOUBLE, user_id LONG, user_session STRING"

  /** O16 batch form — first n rows of the CSV in file order, JSON-enveloped.
    * `limit` before the envelope mirrors the loop break at @ 72-73.
    */
  def csvReplay(spark: SparkSession, path: String, n: Int): DataFrame =
    jsonEnvelope(
      spark.read.option("header", "true").schema(ClickstreamSchema).csv(path).limit(n))

  /** O16 streaming form — rate-limited file stream (maxFilesPerTrigger) with
    * the same schema; pair with `Trigger.ProcessingTime` at the sink for
    * wall-clock throttling.
    */
  def csvReplayStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.option("header", "true").option("maxFilesPerTrigger", 1)
      .schema(ClickstreamSchema).csv(dir)

  /** Kafka sink wiring (unkeyed JSON values on a topic, the reference's
    * producer contract). NOTE: this container ships no spark-sql-kafka jar,
    * so the `.save()` itself is exercised only where the connector exists;
    * the VALUE BYTES are contract-tested broker-free — EventGenSpec pins
    * [[pyJsonEnvelope]] byte-identical to the reference serializer's
    * `json.dumps(row).encode('utf-8')`. A reference-parity producer calls
    * `writeKafka(pyJsonEnvelope(df), …)` (single `value` column — passes
    * through untouched); typed in-house topics use the default
    * [[jsonEnvelope]].
    */
  def writeKafka(df: DataFrame, brokers: String, topic: String): Unit = {
    // An already-enveloped frame (single string `value` column — csvReplay's
    // output shape) passes through untouched; enveloping again would wrap
    // the JSON object in a JSON string and break topic consumers.
    val payload =
      if (df.columns.sameElements(Array("value"))) df else jsonEnvelope(df)
    payload.write.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .save()
  }
}
