package graft.observability

/** Slack webhook payload builder — BYTE parity with the reference's
  * notifier (src/utils/notifier.py:44-63 builds
  * `"{emoji} {prefix}{text}"` and posts
  * `json.dumps({"text": message, "mrkdwn": True})`, :27-31). The
  * engine-side contract is the payload string, not the transport: a
  * production deployment hands it to whatever HTTP client the runtime
  * owns (`RunReport.report`'s notify callback), exactly as the
  * reference isolates `_safe_post`. Parity means reproducing Python's
  * `json.dumps` defaults — `ensure_ascii=True` (every char outside
  * printable ASCII becomes a `\\uXXXX` escape per UTF-16 code unit, so
  * astral emoji are surrogate PAIRS) and `", "` / `": "` separators —
  * pinned by golden payloads in ObservabilitySpec generated with the
  * reference implementation.
  */
object SlackNotifier {

  /** Level → emoji, reference notifier.py:50 (unknown levels fall back
    * to info's, like dict.get's default there). */
  private val emojis = Map(
    "info" -> "ℹ️",
    "warning" -> "⚠️",
    "error" -> "🚨",
    "success" -> "✅")

  /** The human-readable message line: emoji, optional `<!here>` channel
    * ping, optional `<@USER>` user ping, then the text — spacing
    * exactly as notifier.py:52-58 concatenates it. */
  def message(text: String, level: String = "info", ping: Boolean = false,
      pingUser: Option[String] = None): String = {
    val emoji = emojis.getOrElse(level, emojis("info"))
    val prefix = (if (ping) "<!here> " else "") +
      pingUser.map(u => s"<@$u> ").getOrElse("")
    s"$emoji $prefix$text"
  }

  /** The webhook body: `{"text": <message>, "mrkdwn": true}` rendered
    * byte-for-byte as Python's `json.dumps` renders it. */
  def payload(text: String, level: String = "info", ping: Boolean = false,
      pingUser: Option[String] = None): String =
    "{\"text\": " + pyJsonString(message(text, level, ping, pingUser)) +
      ", \"mrkdwn\": true}"

  /** Python `json.dumps` string escaping with `ensure_ascii=True`:
    * `"` and `\` escaped, the five C short forms, every other char
    * outside 0x20–0x7e as lowercase `\\uXXXX` per UTF-16 code unit. */
  private[observability] def pyJsonString(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\b' => b.append("\\b")
      case '\t' => b.append("\\t")
      case '\n' => b.append("\\n")
      case '\f' => b.append("\\f")
      case '\r' => b.append("\\r")
      case c if c >= 0x20 && c <= 0x7e => b.append(c)
      case c => b.append(f"\\u${c.toInt}%04x")
    }
    b.append("\"").toString
  }
}
