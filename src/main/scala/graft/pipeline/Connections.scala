package graft.pipeline

/** A named connection: endpoint + reader options + secrets. The engine
  * artifact for the reference's named-connection data model — DAG code
  * there never hard-wires endpoints or credentials; it resolves them at
  * runtime by id (`Connection.get_connection_from_secrets`,
  * `dags/update_tr_from_ex_dag.py:47`; conn ids like
  * `azure_function_conn`, `dags/hello_function_dag.py:25`).
  *
  * Secrets are constructor-separated from options so no render path can
  * leak them: `toString` (and therefore log interpolation, assertion
  * messages, exception text built from the object) prints secret KEYS
  * with redacted values, never the values themselves. Deployment code
  * that needs the real value asks for it explicitly via [[secret]]. */
final case class Connection(
    endpoint: String,
    options: Map[String, String] = Map.empty,
    secrets: Map[String, String] = Map.empty) {

  /** The one deliberate accessor for a secret value. */
  def secret(key: String): Option[String] = secrets.get(key)

  override def toString: String = {
    val opts = options.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString(", ")
    val secs = secrets.keys.toSeq.sorted.map(k => s"$k=***").mkString(", ")
    s"Connection(endpoint=$endpoint, options={$opts}, secrets={$secs})"
  }
}

/** Process-wide name → [[Connection]] registry (the reference's secrets
  * backend, reduced to its engine-side contract: resolution by name at
  * use time, so pipeline code carries conn IDS while deployments own the
  * endpoint/credential values). Sources resolve landed-feed paths and
  * reader options through here; a missing name fails loudly WITH the
  * known names (and never any secret material) in the message. */
object Connections {
  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, Connection]()

  /** Registers (or replaces — latest wins, like a secrets-backend
    * rotation) the connection under `name`. */
  def register(name: String, conn: Connection): Unit = reg.put(name, conn)

  /** Resolves `name` or fails with the known names — never a secret. */
  def resolve(name: String): Connection = {
    val c = reg.get(name)
    if (c == null) {
      val known = {
        val ks = reg.keySet().toArray(Array.empty[String]).sorted
        if (ks.isEmpty) "none" else ks.mkString(", ")
      }
      throw new NoSuchElementException(
        s"connection '$name' is not registered (known: $known)")
    }
    c
  }

  def contains(name: String): Boolean = reg.containsKey(name)

  /** Removes a registration (tests; deployment teardown). */
  def remove(name: String): Unit = reg.remove(name)
}
