package graft.io

/** Test-scope delegator to [[graft.tools.PgLocalServer]] (the provisioning
  * logic lives in main scope so the `pg` stress scenario shares it): a
  * throwaway PostgreSQL server from the image's binaries — trust auth,
  * loopback, fresh /tmp data dir, shutdown-hook teardown. [[available]]
  * is a best-effort environment probe; PgSpec `assume`s on it so the
  * suite cancels instead of failing on images without the toolchain.
  */
object PgTestServer {
  lazy val available: Boolean = graft.tools.PgLocalServer.available
  def target(): Pg.Target = graft.tools.PgLocalServer.target()
  def stop(): Unit = graft.tools.PgLocalServer.stop()
}
