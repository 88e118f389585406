package graft.enrich

/** Concrete rule sets.
  *
  * [[referenceTitleRules]]/[[referenceFieldRules]] reproduce the FULL
  * classification spec the reference embeds in its prompts — the prompt *is*
  * a rule list, so offline behavior is well defined: all 21 title categories
  * of the closed set (dag/vacancy_pipline_gpt_rerty.py:187-209, 'Другое'
  * being the fallback) and all 18 field categories with their keyword lists
  * (dag:493-511, again with 'Другое' as the fallback). Rule order follows
  * the prompt order except where a compound category name must precede its
  * generic substring ('Главный маркетолог' before 'Маркетолог').
  *
  * [[partNameRules]]/[[partTypeRules]] are the same shapes instantiated for
  * the driver testdata (part.p_name / part.p_type play `title` /
  * `ai_field_of_activity`, FIXTURES.md §2). `gizmo` is deliberately left
  * unmapped so the default-fill path ('Не определена') is exercised with real
  * data in the verified queries.
  */
object Rules {

  /** All 21 title categories (dag:187-209). 20 keyword rules; the 21st
    * category 'Другое' is [[referenceTitleClassifier]]'s fallback — the
    * prompt's own rule 2 ("если не уверен — ставь Другое"). Keywords are the
    * category names plus their standard EN/abbreviated synonyms.
    */
  val referenceTitleRules: Seq[KeywordRule] = Seq(
    KeywordRule(Seq("аналитик данных", "data analyst"), "Аналитик данных", ""),
    KeywordRule(Seq("bi-аналитик", "bi аналитик", "bi analyst"), "BI-аналитик", ""),
    KeywordRule(Seq("системный аналитик", "system analyst"), "Системный аналитик", ""),
    KeywordRule(Seq("бизнес-аналитик", "бизнес аналитик", "business analyst"), "Бизнес аналитик", ""),
    KeywordRule(Seq("веб-аналитик", "веб аналитик", "web analyst"), "Веб-аналитик", ""),
    KeywordRule(Seq("финансовый аналитик", "financial analyst"), "Финансовый аналитик", ""),
    KeywordRule(Seq("продуктовый аналитик", "product analyst"), "Продуктовый аналитик", ""),
    KeywordRule(Seq("ml-инженер", "ml инженер", "ml engineer", "ai-инженер", "ai инженер",
      "machine learning", "data scientist"), "ML/AI-инженер", ""),
    KeywordRule(Seq("devops"), "DevOps-инженер", ""),
    KeywordRule(Seq("разработчик", "developer", "программист"), "Разработчик", ""),
    KeywordRule(Seq("директор по маркетингу", "cmo"), "Директор по маркетингу", ""),
    KeywordRule(Seq("генеральный директор", "ceo"), "Генеральный директор", ""),
    KeywordRule(Seq("коммерческий директор"), "Коммерческий директор", ""),
    KeywordRule(Seq("директор по продукту", "cpo"), "Директор по продукту", ""),
    KeywordRule(Seq("директор по продажам"), "Директор по продажам", ""),
    KeywordRule(Seq("главный маркетолог"), "Главный маркетолог", ""),
    KeywordRule(Seq("маркетолог"), "Маркетолог", ""),
    KeywordRule(Seq("руководитель по контенту", "контент"), "Руководитель по контенту", ""),
    KeywordRule(Seq("трафик"), "Специалист по трафику", ""),
    KeywordRule(Seq("менеджер продукта", "product manager", "продакт"), "Менеджер продукта", ""),
  )

  /** All 18 field categories (dag:493-511): 17 keyword rules in prompt
    * order + the 'Другое' fallback (dag:511). Keyword lists are the prompt's
    * own parenthesised lists (with word stems where Russian inflects:
    * 'розничн' covers 'розничная торговля'/'розница') plus the category
    * name itself.
    */
  val referenceFieldRules: Seq[KeywordRule] = Seq(
    KeywordRule(Seq("технологии", "разработка", "софт", "saas", "ai", "it", "crm", "big data"), "IT", ""),
    KeywordRule(Seq("мфо", "банк", "финтех", "инвестиц", "страхован", "финанс"), "Финансы", ""),
    KeywordRule(Seq("розничн", "ритейл", "fmcg"), "Ритейл", ""),
    KeywordRule(Seq("интернет-магазин", "маркетплейс", "e-commerce", "ecommerce"), "E-commerce", ""),
    KeywordRule(Seq("промышленност", "завод", "производств"), "Производство", ""),
    KeywordRule(Seq("здравоохранен", "фармацевтик", "фарма", "медицин"), "Медицина", ""),
    KeywordRule(Seq("edtech", "курс", "онлайн образование", "образован"), "Образование", ""),
    KeywordRule(Seq("реклам", "digital", "медиа", "cpa", "маркетинг"), "Маркетинг", ""),
    KeywordRule(Seq("доставк", "транспорт", "логистик"), "Логистика", ""),
    KeywordRule(Seq("путешеств", "гостиниц", "туризм"), "Туризм", ""),
    KeywordRule(Seq("связ", "телеком", "интернет"), "Телеком", ""),
    KeywordRule(Seq("строительств", "аренд", "недвижимост"), "Недвижимость", ""),
    KeywordRule(Seq("нефт", "газ", "электрич", "энергетик"), "Энергетика", ""),
    KeywordRule(Seq("госуслуг", "государствен", "гос сектор"), "Государственный сектор", ""),
    KeywordRule(Seq("консалтинг"), "Консалтинг", ""),
    KeywordRule(Seq("азартн", "igaming", "gambling", "игр", "развлечен"), "Развлечения", ""),
    KeywordRule(Seq("hr", "юридическ", "услуг"), "Сфера услуг", ""),
  )

  /** The reference title classifier: closed 21-category set, no-match →
    * 'Другое' (the prompt's rule 2), NOT 'Не определена' — the latter marks
    * a FAILED classification call (dag:395), which [[Enrichment]] layers on.
    */
  val referenceTitleClassifier: RuleBasedClassifier =
    RuleBasedClassifier(referenceTitleRules, fallbackCategory = Defaults.Other)

  /** The reference field classifier: compound values ('a. b', 'a/b')
    * classify by their first segment (dag:521-524), no-match → 'Другое'.
    */
  val referenceFieldClassifier: RuleBasedClassifier =
    RuleBasedClassifier(referenceFieldRules, fallbackCategory = Defaults.Other,
      splitCompound = true)

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
