package graft.enrich

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Production classifier shape: batched HTTP completion calls against an
  * LLM endpoint, mirroring the reference's YandexGPT integration
  * (dag/vacancy_pipline_gpt_rerty.py:224-240: POST completion API,
  * temperature 0.3, maxTokens 4000, 60 s timeout; batch prompt at :185-219).
  *
  * Compiled but never exercised in this environment (zero egress — SURVEY.md
  * §7.1); the deterministic [[RuleBasedClassifier]] stands in everywhere
  * results are verified. Kept because the engine's public surface must let a
  * reference user switch over: they configure endpoint+model+apiKey and the
  * whole retry/guard/map-back machinery in [[Enrichment]] is unchanged —
  * classifier choice is orthogonal to the plan.
  *
  * Prompt building is the reference's F3 join-with-separator over the batch
  * (dag:185, :488); reply parsing is [[SafeJsonParse.parseScala]] (F4-F6).
  */
final case class HttpClassifierConfig(
    endpoint: String,
    model: String,
    apiKey: String,
    temperature: Double = 0.3,
    maxTokens: Int = 4000,
    timeoutSeconds: Int = 60,
    promptHeader: String = "Classify each item; reply ONLY with a JSON array of " +
      "{\"original\":…, \"category\":…, \"specialization\":…}.")

final class HttpClassifier(cfg: HttpClassifierConfig) extends Classifier {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(cfg.timeoutSeconds)).build()

  /** F3: the batch travels as one joined prompt (', '-separated, dag:185). */
  private[enrich] def buildPrompt(batch: Seq[String]): String =
    s"${cfg.promptHeader}\nItems: ${batch.mkString(", ")}"

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }

  private[enrich] def buildBody(batch: Seq[String]): String =
    s"""{"modelUri":"${esc(cfg.model)}",
       |"completionOptions":{"stream":false,"temperature":${cfg.temperature},"maxTokens":"${cfg.maxTokens}"},
       |"messages":[{"role":"user","text":"${esc(buildPrompt(batch))}"}]}""".stripMargin

  /** The reference unwraps the completion ENVELOPE before parsing —
    * `result['result']['alternatives'][0]['message']['text']` (dag:246) —
    * and only then runs safe_json_parse on the model text. Replicated with
    * Jackson (already on every Spark classpath): without this step the
    * embedded-array fallback regex would latch onto the `alternatives`
    * ARRAY of the envelope itself and read the wrong fields. A body that
    * is not envelope-shaped (a bare array from a simpler endpoint, or
    * unparseable junk) passes through untouched — parseScala's own
    * fallbacks handle it.
    *
    * A body that IS envelope-shaped (an object carrying `result`) but whose
    * `message.text` is missing or non-textual — a refusal or alternate
    * status envelope — yields "" (the empty-reply retry/stub lane), NEVER
    * the raw envelope: feeding the envelope to parseScala would let the
    * embedded-array regex latch onto the envelope's own `alternatives`
    * array — exactly the misread the unwrap exists to prevent. The
    * reference's KeyError path (dag:246 under try) lands in the same retry
    * lane.
    */
  private[enrich] def extractText(body: String): String =
    try {
      val root = HttpClassifier.mapper.readTree(body)
      val t = root.path("result").path("alternatives").path(0).path("message").path("text")
      if (t.isTextual) t.asText()
      else if (root.isObject && root.has("result")) ""
      else body
    } catch { case scala.util.control.NonFatal(_) => body }

  override def classify(batch: Seq[String]): Seq[Classified] = {
    val req = HttpRequest.newBuilder(URI.create(cfg.endpoint))
      .timeout(Duration.ofSeconds(cfg.timeoutSeconds))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Api-Key ${cfg.apiKey}")
      .POST(HttpRequest.BodyPublishers.ofString(buildBody(batch)))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    // Non-2xx or junk → Nil; Enrichment's retry/stub layer handles it
    // (dag:302-307 treats transport errors as an empty reply).
    if (resp.statusCode() / 100 != 2) Nil
    else SafeJsonParse.parseScala(extractText(resp.body()))
  }
}

object HttpClassifier {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
}
