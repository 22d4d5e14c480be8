package graft

import org.apache.spark.sql.functions._

import graft.ops.TextStats

/** N-gram language ID + quality/token arithmetic (the oracle queries cover
  * the Column ops; this covers the profile scorer on real sentences). */
class TextStatsSpec extends SparkSpec {

  test("trigram profiles identify real sentences in their language") {
    val cases = Seq(
      "the weather was nice and the children played in the garden" -> "en",
      "it is not only the people that were there who could have done this" -> "en",
      "die kinder spielten im garten und das wetter war schön und warm" -> "de",
      "das ist nicht der einzige grund für diese entscheidung gewesen" -> "de",
      "les enfants jouaient dans le jardin et le temps était agréable" -> "fr",
      "ce nest pas la seule raison pour laquelle ils sont venus ici" -> "fr",
      "los niños jugaban en el jardín y el tiempo era muy agradable" -> "es",
      "no es la única razón por la que ellos estaban allí ese día" -> "es",
      "这是一个完全由中文字符组成的句子用来测试语言识别" -> "zh"
    )
    cases.foreach { case (text, want) =>
      assert(TextStats.langNgramGuess(text) === want, s"text: $text")
    }
    assert(TextStats.langNgramGuess("") === "unknown")
    assert(TextStats.langNgramGuess("42 17 99") === "unknown" ||
      TextStats.langNgramGuess("42 17 99").nonEmpty) // digits-only: any stable answer
  }

  test("DataFrame face is deterministic and shuffle-free per row") {
    import spark.implicits._
    val df = Seq(
      (1L, "the weather was nice and the children played outside"),
      (2L, "die kinder spielten draußen und das wetter war schön")
    ).toDF("doc_id", "text")
    val a = TextStats.withLangNgram(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a(1L) === "en")
    assert(a(2L) === "de")
    val b = TextStats.withLangNgram(df.repartition(7), "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }
}
