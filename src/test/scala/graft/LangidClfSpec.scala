package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** tx_langid_clf accuracy pin on a planted multilingual fixture.
  *
  * The seed split (doc_id % 10 < 8) carries each language's heuristic
  * marker words (so the distillation labels are correct) alongside
  * language-specific CONTENT vocabulary; the eval split (% 10 ≥ 8)
  * carries the content vocabulary only — no heuristic stopwords, and
  * for zh fewer than 10 CJK chars. The heuristic therefore collapses
  * to 'en' on every non-English eval doc while the trained model must
  * recover the language from the hashed content words it saw in the
  * seed — the fastText-LID generalization the trained gate buys.
  */
class LangidClfSpec extends AnyFunSuite {
  import SparkTestSession._

  // (lang, heuristic marker words, content vocabulary)
  private val fixture = Seq(
    ("en", "the and of to in is", "house cheese market river morning bright"),
    ("fr", "le la les de et un", "maison fromage sentier voyage matin clair"),
    ("es", "el los de y en la", "queso mercado camino viaje claro pronto"),
    ("de", "der die das und ist ein", "haus kaese markt fluss morgen hell"),
    ("zh", "你好 世界 学习 模型 数据 语言", "学习 模型 数据 语言"))

  private lazy val docs = {
    import spark.implicits._
    val rows = fixture.zipWithIndex.flatMap { case ((lang, markers, content), li) =>
      val seed = (0 until 8).map { k =>
        // markers guarantee the heuristic (and thus the label) is right;
        // repeat content so class-conditional counts dominate smoothing
        (100L * li + k, lang, s"$markers $content $content")
      }
      val eval = Seq(8, 9, 18, 19).map { k =>
        (100L * li + k, lang, content)
      }
      seed ++ eval
    }
    rows.toDF("doc_id", "true_lang", "text")
  }

  private lazy val scored =
    operators.TextAnalysis.langidClfOf(docs.select(col("doc_id"), col("text")))
      .join(docs.select(col("doc_id"), col("true_lang")), "doc_id")
      .collect()

  test("trained LID is 100% on the held-out eval split") {
    val eval = scored.filter(_.getAs[Long]("doc_id") % 10 >= 8)
    assert(eval.length == fixture.size * 4)
    val wrong = eval.filter(r => r.getAs[String]("pred_lang") != r.getAs[String]("true_lang"))
    assert(wrong.isEmpty, wrong.map(r =>
      s"${r.getAs[Long]("doc_id")}: pred=${r.getAs[String]("pred_lang")} " +
        s"true=${r.getAs[String]("true_lang")}").mkString("; "))
  }

  test("trained LID beats the heuristic it was distilled from on the eval split") {
    val eval = scored.filter(_.getAs[Long]("doc_id") % 10 >= 8)
    val heurRight = eval.count(r => r.getAs[String]("heur_lang") == r.getAs[String]("true_lang"))
    val clfRight = eval.count(r => r.getAs[String]("pred_lang") == r.getAs[String]("true_lang"))
    // stopword-free eval docs default the heuristic to 'en': only the
    // English quarter survives, the trained model recovers the rest
    assert(heurRight == 4, s"fixture drift: heuristic should only get en right, got $heurRight")
    assert(clfRight == eval.length)
  }

  test("seed-split labels are faithful: heuristic and model agree on the seed") {
    val seed = scored.filter(_.getAs[Long]("doc_id") % 10 < 8)
    assert(seed.forall(r => r.getAs[String]("heur_lang") == r.getAs[String]("true_lang")),
      "marker words must make the heuristic correct on every seed doc")
    assert(seed.forall(r => r.getAs[Boolean]("agree")),
      "the distilled model must reproduce its own training labels in-sample")
  }
}
