package graft

import org.apache.spark.sql.functions.col

import graft.functions.TextNorm

/** Golden byte-identity suite for the text contract (SURVEY.md §2.3).
  * Expected strings were produced by running the reference's own regex
  * pipeline semantics (data/data_utils.py:201-225, apply_text_norm.py:35-77)
  * under CPython; assertions compare UTF-8 bytes.
  */
class TextNormSpec extends SparkSpec {

  private val cleanGolden: Seq[(String, String)] = Seq(
    "结节(见图12), 大小" -> "结节（见图12）， 大小",
    "文字（/topics/zh-cn/17）尾部" -> "文字尾部",
    "前(http://www.cdc.gov/x.html)后" -> "前后",
    "targetUrl=http://a.b/c）后缀" -> "后缀",
    "a##  b**c，，，d" -> "a-b-c，d",
    "空格  多　全角" -> "空格-多　全角",
    "多　　全角" -> "多-全角", // unicode whitespace run: needs (?U) in Java
    "肿物(注释)结果,，如下:  见*# 文字" -> "肿物（注释）结果，如下:-见-文字",
    "(http://archive.example/warc)  报告编号## 42，，复查对照。" -> "-报告编号-42，复查对照。",
    "换\n行,测 试" -> "换\n行，测 试" // single \n and single space survive
  )

  private val processGolden: Seq[(String, String)] = Seq(
    "我在天安门广场。" -> "我在天安门广场.", // apply_text_norm.py:80-84 smoke case
    "中国，中文，标点符号！你好？１２３４５＠＃【】+=-（）" -> "中国,中文,标点符号!你好?12345@#[]+=-()",
    "　全角空格＆ＡＢＣｚ～！" -> " 全角空格&ABCz~!",
    "“引号”‘单’《书》「框」" -> "\"引号\"'单'<书>{框}"
  )

  private def bytes(s: String) = s.getBytes("UTF-8").toSeq

  test("T1 cleanDataStr matches reference bytes") {
    cleanGolden.foreach { case (in, want) =>
      assert(bytes(TextNorm.cleanDataStr(in)) === bytes(want), s"input: $in")
    }
  }

  test("T2+T3 processSentStr matches reference bytes") {
    processGolden.foreach { case (in, want) =>
      assert(bytes(TextNorm.processSentStr(in)) === bytes(want), s"input: $in")
    }
  }

  test("Column twins agree with string twins") {
    import spark.implicits._
    val inputs = (cleanGolden ++ processGolden).map(_._1).toDF("s")
    val got = inputs
      .select(
        TextNorm.cleanData(col("s")).as("c"),
        TextNorm.processSent(col("s")).as("p"),
        col("s"))
      .collect()
    got.foreach { r =>
      val s = r.getString(2)
      assert(r.getString(0) === TextNorm.cleanDataStr(s), s"cleanData mismatch on: $s")
      assert(r.getString(1) === TextNorm.processSentStr(s), s"processSent mismatch on: $s")
    }
  }

  test("cleanData is idempotent on cleaned output") {
    cleanGolden.foreach { case (_, cleaned) =>
      assert(TextNorm.cleanDataStr(cleaned) === cleaned)
    }
  }

  test("full2half maps the exact 95-char window") {
    assert(TextNorm.full2halfStr("　") === " ")
    assert(TextNorm.full2halfStr("！") === "!")
    assert(TextNorm.full2halfStr("～") === "~")
    assert(TextNorm.full2halfStr("｟") === "｟") // out of window: unchanged
    assert(TextNorm.full2halfStr("０９") === "09")
  }

  test("extractText strips the synthetic html wrapper") {
    val payload = "胸部CT检查所见：孤立性结节。"
    val html = s"<html><body><p>$payload</p></body></html>".getBytes("UTF-8")
    assert(TextNorm.extractTextStr(html) === payload)
  }
}
