package graft

import graft.enrich._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY.md §5): totality and robustness of the
  * pure executor-side pieces over arbitrary inputs.
  */
object EnrichmentProps extends Properties("Enrichment") {

  property("rule classifier is total: every string gets a non-empty category") =
    forAll { (s: String) =>
      val c = Rules.partNameClassifier.classifyOne(s)
      c.original == s && c.category.nonEmpty
    }

  property("classifyBatchWithRetry covers every input exactly once, in order") =
    forAll(Gen.listOf(Gen.alphaNumStr)) { batch =>
      val out = Enrichment.classifyBatchWithRetry(
        Rules.partNameClassifier, batch, maxRetries = 1, retryOther = false)
      out.map(_.original) == batch
    }

  property("retry with an always-failing classifier stubs everything, drops nothing") =
    forAll(Gen.listOf(Gen.alphaNumStr)) { batch =>
      val broken = new Classifier { def classify(b: Seq[String]) = Nil }
      val out = Enrichment.classifyBatchWithRetry(broken, batch, maxRetries = 2, retryOther = true)
      out.map(_.original) == batch && out.forall(_.category == Defaults.Unclassified)
    }

  property("SafeJsonParse never throws on arbitrary junk") =
    forAll { (s: String) =>
      SafeJsonParse.parseScala(s) != null
    }

  property("SafeJsonParse recovers a valid array wrapped in arbitrary prose") =
    forAll(Gen.alphaStr, Gen.alphaStr) { (pre, post) =>
      // prose must not itself contain a JSON-array-of-objects (alphaStr can't)
      val wrapped = s"""$pre [ {"original":"k","category":"IT"} ] $post"""
      SafeJsonParse.parseScala(wrapped) == Seq(Classified("k", "IT", ""))
    }
}
