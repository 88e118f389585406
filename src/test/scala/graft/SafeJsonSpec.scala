package graft.enrich


import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §1.3: GPT-junk JSON shapes for the safe-parse path
  * (dag:251-265) and the HTTP classifier's request assembly.
  */
class SafeJsonSpec extends AnyFunSuite {

  test("clean JSON array parses") {
    val got = SafeJsonParse.parseScala(
      """[{"original":"a","category":"IT","specialization":"dev"}]""")
    assert(got === Seq(Classified("a", "IT", "dev")))
  }

  test("backtick fence + json tag stripped (F4)") {
    val got = SafeJsonParse.parseScala(
      "```json\n[{\"original\":\"a\",\"category\":\"IT\"}]\n```")
    assert(got === Seq(Classified("a", "IT", "")))
  }

  test("prose around the array -> regex extraction (F6)") {
    val got = SafeJsonParse.parseScala(
      "Вот результат:\n[ {\"original\":\"x\",\"normalized_title\":\"Маркетолог\"} ]\nГотово!")
    assert(got === Seq(Classified("x", "Маркетолог", "")))
  }

  test("title-task field name normalized_title maps to category slot") {
    val got = SafeJsonParse.parseScala("""[{"original":"t","normalized_title":"Data Scientist"}]""")
    assert(got.head.category === "Data Scientist")
  }

  test("escaped quotes inside values survive") {
    val got = SafeJsonParse.parseScala("""[{"original":"say \"hi\"","category":"Другое"}]""")
    assert(got.head.original === "say \"hi\"")
  }

  test("unparseable junk -> empty (caller stubs, dag:269-278)") {
    assert(SafeJsonParse.parseScala("no json here") === Nil)
    assert(SafeJsonParse.parseScala("{\"original\":\"not-an-array\"}") === Nil)
    assert(SafeJsonParse.parseScala("") === Nil)
  }

  test("HTTP classifier request assembly (F3 batch join, escaped JSON body)") {
    val c = new HttpClassifier(HttpClassifierConfig(
      endpoint = "https://example.invalid/v1/completion",
      model = "gpt://folder/some-model/latest", apiKey = "k"))
    val prompt = c.buildPrompt(Seq("Аналитик данных", "BI-аналитик"))
    assert(prompt.contains("Аналитик данных, BI-аналитик")) // ', '.join (dag:185)
    val body = c.buildBody(Seq("""needs "escaping""""))
    assert(body.contains("\\\"escaping\\\""))
    assert(body.contains("\"temperature\":0.3"))
    assert(body.contains("\"maxTokens\":\"4000\""))
  }
}
