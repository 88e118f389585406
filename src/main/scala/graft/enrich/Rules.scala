package graft.enrich

/** Concrete rule sets.
  *
  * [[referenceTitleRules]]/[[referenceFieldRules]] reproduce (a representative
  * subset of) the classification spec the reference embeds in its prompts —
  * the prompt *is* a rule list, so offline behavior is well defined:
  * titles from the 21-category closed set (dag/vacancy_pipline_gpt_rerty.py:187-209),
  * fields from the 18-category keyword rules (dag:493-511).
  *
  * [[partNameRules]]/[[partTypeRules]] are the same shapes instantiated for
  * the driver testdata (part.p_name / part.p_type play `title` /
  * `ai_field_of_activity`, FIXTURES.md §2). `gizmo` is deliberately left
  * unmapped so the default-fill path ('Не определена') is exercised with real
  * data in the verified queries.
  */
object Rules {

  val referenceTitleRules: Seq[KeywordRule] = Seq(
    KeywordRule(Seq("аналитик данных", "data analyst"), "Аналитик данных", ""),
    KeywordRule(Seq("bi-аналитик", "bi аналитик"), "BI-аналитик", ""),
    KeywordRule(Seq("data scientist", "ds"), "Data Scientist", ""),
    KeywordRule(Seq("python"), "Python разработчик", ""),
    KeywordRule(Seq("маркетолог"), "Маркетолог", ""),
  )

  val referenceFieldRules: Seq[KeywordRule] = Seq(
    KeywordRule(Seq("технологии", "разработка", "софт", "saas", "ai", "it", "crm", "big data"), "IT", ""),
    KeywordRule(Seq("финтех", "банк", "финанс"), "Финансы", ""),
    KeywordRule(Seq("fmcg", "ритейл", "розni"), "Ритейл", ""),
    KeywordRule(Seq("edtech", "образован"), "Образование", ""),
    KeywordRule(Seq("igaming", "игр", "развлечен"), "Развлечения", ""),
    KeywordRule(Seq("маркетинг", "реклам"), "Маркетинг", ""),
  )

  /** Title-style normalization for part.p_name ("blue rod" → "Rod"). */
  val partNameRules: Seq[KeywordRule] = Seq(
    KeywordRule(Seq("widget"), "Widget", ""),
    KeywordRule(Seq("ring"),   "Ring", ""),
    KeywordRule(Seq("gear"),   "Gear", ""),
    KeywordRule(Seq("anvil"),  "Anvil", ""),
    KeywordRule(Seq("bolt"),   "Bolt", ""),
    KeywordRule(Seq("plate"),  "Plate", ""),
    KeywordRule(Seq("rod"),    "Rod", ""),
    // "gizmo" intentionally unmapped -> Defaults.Unclassified
  )

  /** Field-style (category, specialization) classification for part.p_type. */
  val partTypeRules: Seq[KeywordRule] = Seq(
    KeywordRule(Seq("economy"),  "Budget",  "Value"),
    KeywordRule(Seq("promo"),    "Budget",  "Promo"),
    KeywordRule(Seq("standard"), "Regular", "Standard"),
    KeywordRule(Seq("medium"),   "Regular", "Mid"),
    KeywordRule(Seq("small"),    "Compact", "Small"),
    KeywordRule(Seq("large"),    "Big",     "Large"),
  )

  val partNameClassifier: RuleBasedClassifier = RuleBasedClassifier(partNameRules)
  val partTypeClassifier: RuleBasedClassifier = RuleBasedClassifier(partTypeRules)

  /** The p_name rules as a DuckDB CASE WHEN chain (oracle twin of
    * [[partNameClassifier]]). Keyword rules are non-overlapping contains
    * checks, so LIKE order doesn't matter.
    */
  def partNameCaseSql(keyExpr: String): String = {
    val whens = partNameRules.map { r =>
      s"WHEN lower(trim($keyExpr)) LIKE '%${r.keywords.head}%' THEN '${r.category}'"
    }.mkString(" ")
    s"CASE $whens ELSE '${Defaults.Unclassified}' END"
  }

  def partTypeCaseSql(keyExpr: String, spec: Boolean): String = {
    val whens = partTypeRules.map { r =>
      val v = if (spec) r.specialization else r.category
      s"WHEN lower(trim($keyExpr)) LIKE '%${r.keywords.head}%' THEN '$v'"
    }.mkString(" ")
    s"CASE $whens ELSE '${Defaults.Unclassified}' END"
  }
}
