package graft.tools

import graft.io.Pg

/** Dev/test-harness helper: provisions a throwaway local PostgreSQL server
  * from the binaries this image ships (`/usr/local/bin/{initdb,pg_ctl}`) —
  * trust auth, loopback only, fresh data dir under /tmp, torn down via
  * [[stop]] or the JVM shutdown hook. Postgres refuses to run as root, so
  * every server command is wrapped in `su postgres` (the image ships the
  * system user); the data dir is chown'd to it first.
  *
  * Used by the `pg` stress scenario and (via the test-scope delegator
  * `PgTestServer`) by PgSpec. [[available]] is a best-effort environment
  * probe — earlier rounds' images lacked pieces of this toolchain and env
  * drift is the norm, so callers skip/cancel rather than fail when it is
  * false. NOT for production use in any form: a real deployment has a
  * provisioned server and real auth.
  */
object PgLocalServer {
  private val InitDb = "/usr/local/bin/initdb"
  private val PgCtl = "/usr/local/bin/pg_ctl"

  private def haveBinaries: Boolean =
    new java.io.File(InitDb).exists && new java.io.File(PgCtl).exists

  private def isRoot: Boolean =
    System.getProperty("user.name") == "root"

  private def havePgUser: Boolean =
    scala.util.Try(run("id", "postgres")).toOption.exists(_._1 == 0)

  lazy val available: Boolean = haveBinaries && isRoot && havePgUser

  private def run(cmd: String*): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    (p.waitFor(), out)
  }

  private def asPostgres(shellCmd: String): (Int, String) =
    run("su", "postgres", "-c", shellCmd)

  @volatile private var state: Option[(java.nio.file.Path, Int)] = None

  /** Starts (once per JVM) and returns the connection target. */
  def target(): Pg.Target = synchronized {
    val port = state match {
      case Some((_, p)) => p
      case None =>
        val dir = java.nio.file.Files.createTempDirectory("graft-pg")
        run("chown", "postgres", dir.toString)
        val data = s"$dir/data"
        val (ic, iout) = asPostgres(s"$InitDb -D $data -A trust -E UTF8")
        require(ic == 0, s"initdb failed:\n$iout")
        // Probe-then-bind is inherently racy (anything can grab the port
        // between ServerSocket.close() and the postgres bind), so retry
        // with a fresh port instead of turning a lost race into a hard
        // failure.
        val p = (1 to 3).view.map { attempt =>
          val sock = new java.net.ServerSocket(0)
          val cand = try sock.getLocalPort finally sock.close()
          val (sc, sout) = asPostgres(
            s"$PgCtl -D $data -l $dir/log.$attempt " +
              s"-o '-p $cand -c listen_addresses=127.0.0.1 -k $dir' start")
          if (sc == 0) Some(cand)
          else {
            require(attempt < 3, s"pg_ctl start failed 3 times; last:\n$sout")
            None
          }
        }.collectFirst { case Some(port) => port }.get
        sys.addShutdownHook(stop())
        state = Some((dir, p))
        p
    }
    Pg.Target("127.0.0.1", port, "postgres", "postgres")
  }

  def stop(): Unit = synchronized {
    state.foreach { case (dir, _) =>
      asPostgres(s"$PgCtl -D $dir/data -m immediate stop")
      run("rm", "-rf", dir.toString)
    }
    state = None
  }
}
