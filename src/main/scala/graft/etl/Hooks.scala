package graft.etl

/** Notification surface modeled from the reference's `apde_notify`
  * (R/notify.R): a stored message template + recipient list, rendered
  * with runtime `vars` and dispatched on pipeline events. Email/SMTP is
  * environment plumbing, not analytics — so the engine exposes the
  * template/render/dispatch contract behind a sink interface; deployments
  * plug in their transport, tests use [[CollectingNotifier]].
  */
trait NotifySink {
  def notify(msgName: String, vars: Map[String, String]): Unit
}

/** Template store + render (reference: apde_notify_msg_set/get — messages
  * with `{var}` placeholders filled at send time).
  */
final class Notifier(templates: Map[String, String], sink: NotifySink) {
  def render(msgName: String, vars: Map[String, String]): String = {
    val tpl = templates.getOrElse(msgName,
      sys.error(s"no notify template '$msgName'"))
    vars.foldLeft(tpl) { case (s, (k, v)) => s.replace(s"{$k}", v) }
  }
  def send(msgName: String, vars: Map[String, String]): Unit = {
    render(msgName, vars) // fail fast on unknown template
    sink.notify(msgName, vars)
  }
}

/** Test/default sink: records every dispatch. */
final class CollectingNotifier extends NotifySink {
  val sent: scala.collection.mutable.Buffer[(String, Map[String, String])] =
    scala.collection.mutable.Buffer.empty
  def notify(msgName: String, vars: Map[String, String]): Unit =
    sent += (msgName -> vars)
}

/** Credential surface modeled from the reference's keyring/connection
  * helpers (R/apde_keyring.R:19-53 keyring_set/get, R/create_db_connection.R
  * — named credentials resolved at connection time). Spark deployments get
  * credentials from cluster config / env / secret managers, not the engine,
  * so graft only defines the lookup contract: pipelines ask a provider by
  * key, deployments decide where secrets live. No storage is implemented
  * here on purpose — an engine persisting secrets would be a liability,
  * not a feature.
  */
trait CredentialProvider {
  def credential(key: String): Option[String]
}

/** Default provider: environment variables (the common Spark deployment
  * shape — secrets injected by the scheduler/secret manager).
  */
object EnvCredentials extends CredentialProvider {
  def credential(key: String): Option[String] = sys.env.get(key)
}

/** Test/static provider (the keyring_set analogue for fixtures). */
final class StaticCredentials(entries: Map[String, String])
    extends CredentialProvider {
  def credential(key: String): Option[String] = entries.get(key)
}
