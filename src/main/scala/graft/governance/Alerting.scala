package graft.governance

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.slf4j.LoggerFactory

/** Alert fan-out, the equivalent of the reference's `alert()` which
  * dispatches to SNS and/or a Slack webhook depending on env config and
  * warns when no channel is configured
  * (`dagster/lakehouse/utils/alerting.py:11-52`).
  *
  * This environment has zero egress, so the SNS/Slack transports are
  * interface-complete but deliver to an in-memory/log channel; the
  * dispatch-selection logic (which channels fire, the no-channel warning)
  * is the behavior under test, as in `tests/test_alerting.py`.
  */
object Alerting {

  final case class Alert(channel: String, subject: String, message: String)

  trait Alerter { def send(subject: String, message: String): Unit; def channel: String }

  private val logger = LoggerFactory.getLogger("lakehouse.alerting")
  private val delivered = new ConcurrentLinkedQueue[Alert]()

  final class SnsAlerter(topicArn: String) extends Alerter {
    val channel = "sns"
    def send(subject: String, message: String): Unit = {
      logger.info(s"[sns:$topicArn] $subject: $message")
      delivered.add(Alert(channel, subject, message))
    }
  }

  final class SlackAlerter(webhookUrl: String) extends Alerter {
    val channel = "slack"
    def send(subject: String, message: String): Unit = {
      logger.info(s"[slack] $subject: $message")
      delivered.add(Alert(channel, subject, message))
    }
  }

  /** Channels configured from the environment (or an explicit map for
    * tests): `ALERT_SNS_TOPIC_ARN`, `ALERT_SLACK_WEBHOOK_URL`.
    */
  def configured(env: Map[String, String] = sys.env): Seq[Alerter] =
    env.get("ALERT_SNS_TOPIC_ARN").map(new SnsAlerter(_)).toSeq ++
      env.get("ALERT_SLACK_WEBHOOK_URL").map(new SlackAlerter(_)).toSeq

  /** Fan out to every configured channel; warn if none (reference
    * `alerting.py:49-52`). Returns the channels that fired.
    */
  def alert(subject: String, message: String, env: Map[String, String] = sys.env): Seq[String] = {
    val channels = configured(env)
    if (channels.isEmpty) {
      logger.warn(s"No alert channel configured; dropping alert: $subject")
      Nil
    } else {
      channels.foreach(_.send(subject, message))
      channels.map(_.channel)
    }
  }

  def deliveredAlerts: Seq[Alert] = delivered.asScala.toSeq
  def clear(): Unit = delivered.clear()
}
