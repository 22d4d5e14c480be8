package graft.synth

import scala.collection.immutable.ListMap

/** Deterministic surface-form lexicons for the synthetic corpus
  * (FIXTURES.md §1-2). Subject surfaces and per-relation object surfaces are
  * pairwise substring-disjoint across lexicons (asserted by LexiconSpec) so
  * that, on the clean split, gazetteer tagging reproduces exactly the planted
  * gold spans (P = R = 1.0 by construction).
  *
  * None of the phrases contain the excluded organ keywords 肝/胃/甲状腺
  * (run_qa.py:430) nor characters rewritten by clean_data
  * (data/data_utils.py:201-225), so char offsets survive text cleaning.
  */
object Lexicon {

  val subjects: ListMap[String, Vector[String]] = ListMap(
    "Mass" -> Vector(
      "孤立性结节", "多发小结节", "团块状肿物", "软组织肿块",
      "占位性病变", "斑片结节灶", "粟粒样结节", "空洞性病灶"
    ),
    "Lymph" -> Vector(
      "第4组淋巴结", "第7组淋巴结", "双侧腋下淋巴结", "颈根部淋巴结"
    ),
    "Pleura" -> Vector("左侧胸膜", "右侧胸膜"),
    "Effusion" -> Vector("少量胸水", "中等量胸水", "大量胸水")
  )

  /** Literal object surfaces per relation. Size is pattern-generated, see
    * [[sizePhrase]] / [[Gaz.sizeRegex]]. */
  val objects: ListMap[String, Vector[String]] = ListMap(
    "Location" -> Vector(
      "左肺上叶", "左肺下叶", "右肺上叶", "右肺中叶", "右肺下叶",
      "左侧胸腔", "右侧胸腔", "气管隆突下区", "心包旁区"
    ),
    "Shape" -> Vector("类圆形", "椭圆形", "不规则形", "浅分叶状", "楔形"),
    "Size" -> Vector.empty, // numeric pattern 约{a}×{b}mm
    "Density" -> Vector("实性密度", "磨玻璃密度", "混合磨玻璃密度", "囊性密度"),
    "Lymph" -> Vector("伴淋巴结肿大", "未见淋巴结肿大", "多发淋巴结转移"),
    "Pleura" -> Vector("侵犯胸膜", "胸膜牵拉凹陷", "胸膜增厚粘连"),
    "Bronchus" -> Vector("支气管截断", "支气管受侵变窄", "支气管扩张扭曲"),
    "ChestWall" -> Vector("侵及胸壁", "胸壁软组织受累"),
    "Hilus" -> Vector("累及肺门", "肺门结构受侵"),
    "Vessel" -> Vector("包绕血管", "血管受侵", "紧贴肺动脉干"),
    "Intension" -> Vector("明显强化", "代谢增高", "轻度强化"),
    "PulmonaryAtelectasis" -> Vector("伴肺不张", "远端阻塞性改变"),
    "Esophagus" -> Vector("压迫食管", "食管受侵")
  )

  /** Size object surface, half-width (the form the model recognizes). */
  def sizePhrase(a: Int, b: Int): String = s"约${a}×${b}mm"

  /** Full-width-digit variant of a size phrase — used by the noisy split to
    * plant recall misses (and by the linking fixture as an alias of the
    * half-width form; full2half normalization collapses them). */
  def toFullWidthDigits(s: String): String = s.map { ch =>
    if (ch >= '0' && ch <= '9') (ch + 0xFEE0).toChar
    else if (ch == 'm') 'ｍ'
    else ch
  }

  /** Every literal phrase of every lexicon (Size pattern excluded). */
  def allPhrases: Seq[(String, String)] =
    subjects.toSeq.flatMap { case (t, ps) => ps.map(p => (s"subject:$t", p)) } ++
      objects.toSeq.flatMap { case (r, ps) => ps.map(p => (s"object:$r", p)) }
}
