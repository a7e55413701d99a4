package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_micros, unhex}
import org.apache.spark.sql.types._

/** PostgreSQL sink/source over the v3 WIRE PROTOCOL — the reference's
  * Postgres leg (`kafka_stream.pyc @ 91`: the daily-KPIs frame lands in
  * Postgres via the packaged `org.postgresql` JDBC driver) made
  * runtime-real in THIS environment, where the server binaries ship with
  * the image but no JDBC driver jar exists anywhere on disk and the build
  * has zero egress to fetch one. Rather than leave the leg Derby-proven
  * only, this module speaks the protocol directly: the PostgreSQL
  * frontend/backend protocol is stable, versioned public documentation
  * (postgresql.org/docs/15/protocol.html), and the subset a bulk sink
  * needs — startup/trust auth, the simple-query cycle, and COPY FROM
  * STDIN — is small. Original implementation from the spec; this is NOT a
  * general driver and deliberately refuses what it doesn't implement
  * (non-trust auth) rather than half-supporting it.
  *
  * Scale shape, same rules as [[Jdbc]]:
  *  - writes are DISTRIBUTED: one `COPY FROM STDIN` connection per
  *    partition via `foreachPartition` — COPY is Postgres's bulk path
  *    (one parse of the command, rows streamed in 64 KiB frames, no
  *    per-row statement overhead), exactly what a 1000-executor cluster
  *    should be doing instead of INSERT batches;
  *  - reads are BOUND-PARTITIONED: numParts range predicates on a numeric
  *    column, one connection per range — an unbounded JDBC-style read is
  *    a single-task bottleneck regardless of cluster size;
  *  - the idempotent micro-batch sink reuses the
  *    [[Jdbc.writeBatchIdempotent]] contract: at-least-once DELETE by
  *    batch_id + re-COPY of the stamped payload converges under
  *    Structured Streaming's same-batchId replay.
  */
object Pg {

  /** One protocol connection. Simple-query cycle + COPY IN; trust auth
    * only (the throwaway local server the spec provisions — a production
    * deployment with SCRAM would use the real driver jar, which this
    * environment cannot supply). Not thread-safe; one per partition.
    */
  final class Conn(host: String, port: Int, user: String, database: String)
      extends AutoCloseable {
    private val sock = new Socket(host, port)
    sock.setTcpNoDelay(true)
    private val in =
      new DataInputStream(new BufferedInputStream(sock.getInputStream, 1 << 16))
    private val out =
      new DataOutputStream(new BufferedOutputStream(sock.getOutputStream, 1 << 16))

    private def cstr(s: String): Array[Byte] = {
      val b = s.getBytes(UTF_8)
      java.util.Arrays.copyOf(b, b.length + 1) // trailing NUL
    }

    /** Frame: optional tag byte + int32 length (self-inclusive) + payload. */
    private def send(tag: Byte, payload: Array[Byte]): Unit = {
      if (tag != 0) out.writeByte(tag.toInt)
      out.writeInt(payload.length + 4)
      out.write(payload)
    }

    private case class Msg(tag: Char, body: Array[Byte])
    private def recv(): Msg = {
      val tag = in.readByte().toChar
      val len = in.readInt()
      val body = new Array[Byte](len - 4)
      in.readFully(body)
      Msg(tag, body)
    }

    /** ErrorResponse/NoticeResponse body: (code byte, NUL-terminated value)*
      * terminated by a lone NUL. Returns the human fields.
      */
    private def errorText(body: Array[Byte]): String = {
      val fields = scala.collection.mutable.Map.empty[Char, String]
      var i = 0
      while (i >= 0 && i < body.length && body(i) != 0) {
        val code = body(i).toChar
        val end = body.indexOf(0.toByte, i + 1)
        // a truncated/malformed field (no terminating NUL) must not turn
        // the REAL server error into a StringIndexOutOfBounds — take the
        // remainder and stop
        fields(code) = new String(body, i + 1,
          (if (end < 0) body.length else end) - (i + 1), UTF_8)
        i = if (end < 0) -1 else end + 1
      }
      s"${fields.getOrElse('S', "ERROR")}: ${fields.getOrElse('M', "?")} " +
        s"(SQLSTATE ${fields.getOrElse('C', "?????")})"
    }

    /** Server major version from the startup ParameterStatus
      * (`server_version`), -1 if the server didn't report one. Load-bearing
      * for [[Pg.readPartitioned]]: its timestamp render relies on
      * `extract(epoch from ts)` being NUMERIC-exact, which PostgreSQL
      * guarantees only from version 14 (older servers return double
      * precision, silently truncating microseconds for modern epochs) — so
      * the floor is asserted where that render is built, not assumed in a
      * comment.
      */
    @volatile private var _serverMajor: Int = -1
    def serverMajor: Int = _serverMajor

    /** [[serverMajor]], falling back to `SHOW server_version_num` over this
      * connection when the startup ParameterStatus didn't carry a version —
      * a pooler/proxy that doesn't forward ParameterStatus must not fail a
      * plan the server itself can answer for (round-13 ADVICE). The numeric
      * form is `major*10000 + minor` from PostgreSQL 10 on (and
      * `major*10000 + minor*100 + patch` before, where integer division by
      * 10000 still yields the major). Still -1 if the server answers
      * nothing parseable — the caller's fail-loud floor then applies.
      */
    def serverMajorResolved: Int =
      if (_serverMajor >= 0) _serverMajor
      else try {
        query("SHOW server_version_num")
          .headOption.flatMap(_.headOption.flatten)
          .flatMap(_.trim.toIntOption).map(_ / 10000).getOrElse(-1)
      } catch { case _: java.io.IOException => -1 }

    // Startup: protocol 3.0, user + database, then drain to ReadyForQuery.
    // Trust auth answers AuthenticationOk (code 0) immediately; any other
    // auth request is refused loudly — silently mis-answering SCRAM would
    // be worse than not supporting it. A startup failure must not leak the
    // socket: the constructor is the one place close() can't be the
    // caller's job.
    try {
      val body = new ByteArrayOutputStream()
      val d = new DataOutputStream(body)
      d.writeInt(196608) // 3 << 16 | 0
      body.write(cstr("user")); body.write(cstr(user))
      body.write(cstr("database")); body.write(cstr(database))
      body.write(cstr("client_encoding")); body.write(cstr("UTF8"))
      body.write(0)
      send(0, body.toByteArray)
      out.flush()
      var ready = false
      var err: Option[String] = None
      while (!ready) recv() match {
        case Msg('R', b) =>
          val code = java.nio.ByteBuffer.wrap(b).getInt
          if (code != 0)
            throw new java.io.IOException(
              s"server requested auth method $code; only trust is supported")
        case Msg('Z', _) => ready = true
        case Msg('E', b) => err = Some(errorText(b)); ready = true
        case Msg('S', b) =>
          // ParameterStatus: name NUL value NUL. Only server_version is
          // kept (e.g. "15.4" or "14.2 (Debian 14.2-1)": the leading
          // integer is the major).
          val nul = b.indexOf(0.toByte)
          if (nul > 0 &&
              new String(b, 0, nul, UTF_8) == "server_version") {
            val end = b.indexOf(0.toByte, nul + 1)
            val v = new String(b, nul + 1,
              (if (end < 0) b.length else end) - (nul + 1), UTF_8)
            _serverMajor = v.takeWhile(_.isDigit).toIntOption.getOrElse(-1)
          }
        case _ => () // BackendKeyData, NoticeResponse
      }
      err.foreach(e => throw new java.io.IOException(s"startup failed: $e"))
    } catch {
      case t: Throwable =>
        try sock.close() catch { case _: java.io.IOException => () }
        throw t
    }

    /** Simple-query cycle: send, collect DataRows (as text, None = NULL),
      * drain to ReadyForQuery, THEN throw if the server errored — the
      * protocol always finishes the cycle, so the connection stays usable
      * and no stray messages leak into the next call.
      */
    def query(sql: String): Vector[Vector[Option[String]]] = {
      send('Q', cstr(sql))
      out.flush()
      val rows = Vector.newBuilder[Vector[Option[String]]]
      var err: Option[String] = None
      var ready = false
      while (!ready) recv() match {
        case Msg('D', b) =>
          val buf = java.nio.ByteBuffer.wrap(b)
          val n = buf.getShort.toInt
          rows += Vector.tabulate(n) { _ =>
            val len = buf.getInt
            if (len < 0) None
            else {
              val v = new Array[Byte](len)
              buf.get(v)
              Some(new String(v, UTF_8))
            }
          }
        case Msg('E', b) => err = err.orElse(Some(errorText(b)))
        case Msg('Z', _) => ready = true
        case _ => () // RowDescription, CommandComplete, notices, ...
      }
      err.foreach(e => throw new java.io.IOException(s"query failed: $e\n  sql: $sql"))
      rows.result()
    }

    /** Statement with no interesting result. */
    def exec(sql: String): Unit = { query(sql); () }

    /** `COPY ... FROM STDIN` (text format): send the command, stream
      * pre-rendered lines in 64 KiB CopyData frames, CopyDone, drain the
      * cycle. Returns the row count from CommandComplete ("COPY n").
      * An error the server raises MID-copy is surfaced at the drain — for
      * the multi-MB-per-partition frames this sink carries, socket
      * buffering absorbs the window; a general driver would interleave
      * reads, which the simple sequential contract here trades away.
      */
    def copyIn(copySql: String, lines: Iterator[String]): Long = {
      send('Q', cstr(copySql))
      out.flush()
      var inCopy = false
      var err: Option[String] = None
      while (!inCopy && err.isEmpty) recv() match {
        case Msg('G', _) => inCopy = true
        case Msg('E', b) => err = Some(errorText(b))
        case Msg('Z', _) =>
          throw new java.io.IOException(s"not a COPY FROM command: $copySql")
        case _ => ()
      }
      if (err.isEmpty) {
        val chunk = new ByteArrayOutputStream(1 << 16)
        def flushChunk(): Unit = if (chunk.size() > 0) {
          send('d', chunk.toByteArray)
          chunk.reset()
        }
        lines.foreach { line =>
          chunk.write(line.getBytes(UTF_8))
          chunk.write('\n')
          if (chunk.size() >= (1 << 16)) flushChunk()
        }
        flushChunk()
        send('c', Array.emptyByteArray) // CopyDone
        out.flush()
      }
      var copied = 0L
      var ready = false
      while (!ready) recv() match {
        case Msg('C', b) =>
          val tag = new String(b, 0, math.max(0, b.length - 1), UTF_8)
          if (tag.startsWith("COPY ")) copied = tag.substring(5).trim.toLong
        case Msg('E', b) => err = err.orElse(Some(errorText(b)))
        case Msg('Z', _) => ready = true
        case _ => ()
      }
      err.foreach(e => throw new java.io.IOException(s"COPY failed: $e"))
      copied
    }

    def close(): Unit = {
      try { send('X', Array.emptyByteArray); out.flush() } // Terminate
      catch { case _: java.io.IOException => () }
      sock.close()
    }
  }

  /** Connection coordinates — one serializable value captured by executor
    * closures instead of four loose strings.
    */
  case class Target(host: String, port: Int, user: String, database: String)
      extends Serializable {
    def connect(): Conn = new Conn(host, port, user, database)
  }

  // ---------------------------------------------------------------- render

  /** COPY text-format escaping: the delimiter, record separator, and escape
    * character must be escaped in data; everything else passes as raw UTF-8
    * (these are the only bytes the server's COPY parser treats specially on
    * input).
    */
  private[io] def escapeCopy(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  /** One field to COPY text; `\N` is the NULL marker. Timestamps render as
    * UTC-wall microseconds (the sink creates `timestamp` columns, so the
    * round trip is tz-independent); binary renders as the `\x…` hex form
    * bytea's text input accepts (the backslash itself COPY-escaped).
    */
  private[io] def renderField(v: Any): String = v match {
    case null => "\\N"
    case None => "\\N"
    case s: String => escapeCopy(s)
    case t: java.sql.Timestamp => TsFmt.format(t.toInstant)
    case t: java.time.Instant => TsFmt.format(t)
    case d: java.sql.Date => d.toString
    case d: java.time.LocalDate => d.toString
    case b: Array[Byte] =>
      val sb = new java.lang.StringBuilder(2 + b.length * 2)
      sb.append("\\\\x")
      b.foreach(x => sb.append(f"${x & 0xff}%02x"))
      sb.toString
    case other => other.toString // numerics, booleans
  }

  private[io] def renderRow(row: Row): String =
    (0 until row.length).map(i => renderField(row.get(i))).mkString("\t")

  /** Spark type → Postgres column type for the sink's CREATE TABLE.
    * `timestamp` (not timestamptz) by design: the render is UTC wall time,
    * so the stored value is session-timezone-independent on both ends.
    */
  private[io] def pgType(dt: DataType): String = dt match {
    case LongType => "bigint"
    case IntegerType => "integer"
    case ShortType => "smallint"
    case DoubleType => "double precision"
    case FloatType => "real"
    case BooleanType => "boolean"
    case StringType => "text"
    case TimestampType | TimestampNTZType => "timestamp"
    case DateType => "date"
    case BinaryType => "bytea"
    case d: DecimalType => s"numeric(${d.precision},${d.scale})"
    case other =>
      throw new IllegalArgumentException(s"no Postgres mapping for $other")
  }

  /** Quote an identifier (table/column name) — lower-cased first so the
    * quoted form matches what unquoted references elsewhere resolve to.
    */
  private[graft] def ident(name: String): String =
    "\"" + name.toLowerCase(java.util.Locale.ROOT).replace("\"", "\"\"") + "\""

  private def createSql(table: String, schema: StructType): String =
    schema.fields
      .map(f => s"${ident(f.name)} ${pgType(f.dataType)}")
      .mkString(s"CREATE TABLE IF NOT EXISTS ${ident(table)} (", ", ", ")")

  private def copySql(table: String, schema: StructType): String =
    schema.fieldNames.map(ident)
      .mkString(s"COPY ${ident(table)} (", ", ", ") FROM STDIN")

  // ---------------------------------------------------------------- sink

  /** Distributed bulk write: create the table if missing (driver-side,
    * one statement), truncate on overwrite, then one `COPY FROM STDIN`
    * connection PER PARTITION on the executors — Spark's parallelism is
    * the load parallelism, the same shape the JDBC writer's savePartition
    * takes, on Postgres's bulk path instead of INSERT batches.
    */
  def writePartitioned(
      df: DataFrame,
      target: Target,
      table: String,
      overwrite: Boolean = false): Unit = {
    val schema = df.schema
    val setup = target.connect()
    try {
      setup.exec(createSql(table, schema))
      if (overwrite) setup.exec(s"TRUNCATE TABLE ${ident(table)}")
    } finally setup.close()
    val copy = copySql(table, schema)
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = target.connect()
        try { conn.copyIn(copy, rows.map(renderRow)); () }
        finally conn.close()
      }
    }
  }

  /** Exactly-once (in row terms) micro-batch sink — the
    * [[Jdbc.writeBatchIdempotent]] contract on the wire-protocol path:
    * Structured Streaming replays a failed micro-batch under the SAME
    * batchId, so converge by at-least-once DELETE of this batch's rows
    * followed by a re-COPY of the payload stamped with it. The two
    * statements are not one transaction — a crash between them leaves a
    * missing batch the replay itself repairs, never a duplicate.
    */
  def writeBatchIdempotent(
      batch: DataFrame,
      batchId: Long,
      target: Target,
      table: String): Unit = {
    import org.apache.spark.sql.functions.lit
    val stamped = batch.withColumn("batch_id", lit(batchId))
    val setup = target.connect()
    try {
      setup.exec(createSql(table, stamped.schema))
      setup.exec(s"DELETE FROM ${ident(table)} WHERE batch_id = $batchId")
    } finally setup.close()
    val copy = copySql(table, stamped.schema)
    stamped.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = target.connect()
        try { conn.copyIn(copy, rows.map(renderRow)); () }
        finally conn.close()
      }
    }
  }

  // ---------------------------------------------------------------- source

  /** Bound-partitioned parallel read: numParts ranges on a numeric column,
    * one connection + one range predicate per Spark partition (the [[Jdbc]]
    * read discipline — an unbounded read is a single-task bottleneck at any
    * cluster size). Spark-JDBC bound SEMANTICS, exactly: lower/upper only
    * SHAPE the partitions — the first partition is unbounded below and
    * catches NULL partition keys, the last is unbounded above — so every
    * table row appears in the result no matter how inexact the bounds
    * (inexact bounds cost skew, never rows). Interior bound arithmetic is
    * BigInt so extreme lower/upper can't overflow into wrong predicates.
    *
    * Values arrive in the protocol's text format and are cast to `schema`
    * engine-side (Spark codegen, not per-field client code); the two types
    * whose text form a plain cast would mangle are rendered server-side
    * instead: timestamps as exact epoch microseconds (zoneless `timestamp`
    * is extracted as UTC wall on the server, matching [[renderField]]'s
    * UTC render — the round trip is session-timezone-independent end to
    * end) and bytea as bare hex decoded by `unhex`.
    */
  def readPartitioned(
      spark: SparkSession,
      target: Target,
      table: String,
      schema: StructType,
      partCol: String,
      lower: Long,
      upper: Long,
      numParts: Int): DataFrame = {
    require(numParts > 0 && upper >= lower, "need upper >= lower, parts > 0")
    // Numeric-exact epoch extraction (the timestamp render below) holds
    // only on PostgreSQL >= 14 — fail loudly at plan time on an older
    // server instead of corrupting microseconds row by row. One driver-side
    // probe connection; the executors talk to the same server. Resolved
    // (not bare) major: a server behind ParameterStatus-stripping
    // middleware gets one SHOW round-trip before being rejected.
    if (schema.fields.exists(_.dataType == TimestampType)) {
      val probe = target.connect()
      val major = try probe.serverMajorResolved finally probe.close()
      require(major >= 14,
        s"readPartitioned needs PostgreSQL >= 14 for numeric-exact " +
          "extract(epoch from timestamp); server reported major " +
          s"${if (major < 0) "<none>" else major.toString}")
    }
    val pc = ident(partCol)
    // Interior cut points in BigInt; predicates per Spark-JDBC semantics.
    val span = BigInt(upper) - BigInt(lower) + 1
    val cuts = (1 until numParts)
      .map(i => BigInt(lower) + span * i / numParts).distinct
    val preds: Seq[String] =
      if (cuts.isEmpty) Seq("TRUE")
      else {
        val first = s"$pc < ${cuts.head} OR $pc IS NULL"
        val mids = cuts.sliding(2).collect {
          case Seq(lo, hi) => s"$pc >= $lo AND $pc < $hi"
        }.toSeq
        val last = s"$pc >= ${cuts.last}"
        (first +: mids) :+ last
      }
    // Server-side render for types whose text form a Spark cast mangles:
    // timestamp -> exact epoch micros (numeric-exact, then
    // timestamp_micros engine-side — no session-timezone reinterpretation
    // of a wall-time string), bytea -> bare hex for unhex.
    val cols = schema.fields.map { f =>
      val c = ident(f.name)
      f.dataType match {
        // TimestampType only: NTZ is a wall time, and a wall-time string
        // casts to NTZ with no zone math — it needs no server-side help
        case TimestampType =>
          s"(extract(epoch from $c) * 1000000)::bigint AS ${ident(f.name)}"
        case BinaryType => s"encode($c, 'hex') AS ${ident(f.name)}"
        case _ => c
      }
    }.mkString(", ")
    val tbl = ident(table)
    val rows = spark.sparkContext
      .parallelize(preds, preds.size)
      .flatMap { pred =>
        val conn = target.connect()
        try conn.query(s"SELECT $cols FROM $tbl WHERE $pred")
          .map(vals => Row.fromSeq(vals.map(_.orNull)))
        finally conn.close()
      }
    val asText = StructType(
      schema.fields.map(f => StructField(f.name, StringType, nullable = true)))
    spark.createDataFrame(rows, asText)
      .select(schema.fields.map { f =>
        val c = col(f.name)
        (f.dataType match {
          case TimestampType => timestamp_micros(c.cast(LongType))
          case BinaryType => unhex(c)
          case dt => c.cast(dt)
        }).as(f.name)
      }.toSeq: _*)
  }
}
