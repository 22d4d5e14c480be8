package graft.schema

import scala.collection.immutable.ListMap

/** The reference's static extraction ontology, reproduced verbatim.
  *
  * These literal dictionaries ARE the reference's schema: they determine which
  * questions are asked per document, which tag ids the sequence tagger emits,
  * and therefore which (subject, relation, object) triples can exist.
  *
  * Sources (cited file:line refer to /root/reference):
  *  - relation2question: data/data_utils.py:33-47
  *  - question_dic:      data/data_utils.py:48-87
  *  - id2relation:       data/data_utils.py:88-106
  *  - question_turn:     data/data_utils.py:108-126
  *  - subject2question:  data/data_utils.py:128-134
  *  - id2subject:        data/data_utils.py:136-142
  *
  * Insertion order matters (the reference iterates python dicts in insertion
  * order when phrasing questions, run_qa.py:440-448), hence ListMap.
  */
object Ontology {

  /** 13 second-turn relations -> natural-language question suffix. */
  val relation2question: ListMap[String, String] = ListMap(
    "Location" -> "位置在哪",
    "Shape" -> "形状如何",
    "Size" -> "大小是多少",
    "Density" -> "是否实性或有磨玻璃",
    "Lymph" -> "与淋巴结是否有关系",
    "Pleura" -> "是否侵犯胸膜",
    "Bronchus" -> "是否侵犯支气管",
    "ChestWall" -> "是否侵犯胸壁",
    "Hilus" -> "是否侵犯肺门",
    "Vessel" -> "是否侵犯血管",
    "Intension" -> "是否有高代谢或强化",
    "PulmonaryAtelectasis" -> "是否伴有肺阻塞或肺不张",
    "Esophagus" -> "是否侵犯食管"
  )

  /** 36 BIO tag ids: B-tags at even ids 2..34, matching I-tag = B+1. */
  val questionDic: ListMap[String, Int] = ListMap(
    "<unk>" -> 0,
    "O" -> 1,
    "Mass" -> 2,
    "Location" -> 4,
    "Shape" -> 6,
    "Size" -> 8,
    "Density" -> 10,
    "Lymph" -> 12,
    "Pleura" -> 14,
    "Bronchus" -> 16,
    "ChestWall" -> 18,
    "Hilus" -> 20,
    "Vessel" -> 22,
    "Intension" -> 24,
    "PulmonaryAtelectasis" -> 26,
    "Esophagus" -> 28,
    "Effusion" -> 30,
    "Spinal" -> 32,
    "Rib" -> 34,
    "Mass-I" -> 3,
    "Location-I" -> 5,
    "Shape-I" -> 7,
    "Size-I" -> 9,
    "Density-I" -> 11,
    "Lymph-I" -> 13,
    "Pleura-I" -> 15,
    "Bronchus-I" -> 17,
    "ChestWall-I" -> 19,
    "Hilus-I" -> 21,
    "Vessel-I" -> 23,
    "Intension-I" -> 25,
    "PulmonaryAtelectasis-I" -> 27,
    "Esophagus-I" -> 29,
    "Effusion-I" -> 31,
    "Spinal-I" -> 33,
    "Rib-I" -> 35
  )

  val numLabels: Int = questionDic.size // 36 (run_qa.py:551)

  /** Inverse of the 17 even B-ids. */
  val id2relation: Map[Int, String] = Map(
    2 -> "Mass", 4 -> "Location", 6 -> "Shape", 8 -> "Size", 10 -> "Density",
    12 -> "Lymph", 14 -> "Pleura", 16 -> "Bronchus", 18 -> "ChestWall",
    20 -> "Hilus", 22 -> "Vessel", 24 -> "Intension",
    26 -> "PulmonaryAtelectasis", 28 -> "Esophagus", 30 -> "Effusion",
    32 -> "Spinal", 34 -> "Rib"
  )

  /** subject type -> second-turn relations to ask. */
  val questionTurn: ListMap[String, List[String]] = ListMap(
    "Mass" -> List("Location", "Shape", "Size", "Density", "Pleura",
      "Bronchus", "ChestWall", "Hilus", "Vessel", "Intension",
      "PulmonaryAtelectasis", "Esophagus"),
    "Lymph" -> List("Location", "Size"),
    "Pleura" -> List("Location"),
    "Effusion" -> List("Location")
  )

  /** 4 subject types -> turn-1 question strings. */
  val subject2question: ListMap[String, String] = ListMap(
    "Mass" -> "结节或肿物或肿块或灶或病变或占位征象的描述",
    "Lymph" -> "淋巴结的描述",
    "Pleura" -> "左右侧胸膜的描述",
    "Effusion" -> "胸水的描述"
  )

  val id2subject: Map[Int, String] =
    Map(2 -> "Mass", 4 -> "Lymph", 6 -> "Pleura", 8 -> "Effusion")

  /** Organ keywords excluded at predict time (run_qa.py:430). */
  val excludedOrgans: Seq[String] = Seq("肝", "胃", "甲状腺")

  /** All 17 span type names (question_dic keys minus <unk>/O/I-tags),
    * in question_dic order — the per-type metric rows of
    * utils/evaluate_funcs.py:126-137. */
  val spanTypes: Seq[String] =
    questionDic.keys.filterNot(k => k.contains("-") || k == "<unk>" || k == "O").toSeq

  // ------------------------------------------------------------------
  // NER-schema twin dictionaries (data/data_utils.py:157-200) — the eval
  // twin utils/evaluate_funcs_NER.py is diff-identical to the main eval
  // except it keys the accounting by these instead of question_dic/
  // id2relation. Reproduced verbatim, including the `I_email` underscore
  // typo (data/data_utils.py:185).
  // ------------------------------------------------------------------

  /** entity2id — data/data_utils.py:157-186. */
  val entity2id: ListMap[String, Int] = ListMap(
    "Others" -> 0, "<SPEC>" -> 1,
    "position" -> 2, "movie" -> 4, "address" -> 6, "book" -> 8,
    "government" -> 10, "game" -> 12, "company" -> 14, "organization" -> 16,
    "mobile" -> 18, "scene" -> 20, "name" -> 22, "email" -> 24,
    "I-position" -> 3, "I-movie" -> 5, "I-address" -> 7, "I-book" -> 9,
    "I-government" -> 11, "I-game" -> 13, "I-company" -> 15,
    "I-organization" -> 17, "I-mobile" -> 19, "I-scene" -> 21,
    "I-name" -> 23, "I_email" -> 25
  )

  /** id2entity — data/data_utils.py:187-200 (B ids only). */
  val id2entity: Map[Int, String] = Map(
    2 -> "position", 4 -> "movie", 6 -> "address", 8 -> "book",
    10 -> "government", 12 -> "game", 14 -> "company", 16 -> "organization",
    18 -> "mobile", 20 -> "scene", 22 -> "name", 24 -> "email"
  )

  /** The NER twin's performance_dic key set: entity2id keys through the
    * SAME filter the main eval applies to question_dic (drop keys containing
    * '-' and the <unk>/O/<START>/<STOP> sentinels,
    * evaluate_funcs_NER.py:127-128) — which KEEPS `Others`, `<SPEC>`, and
    * `I_email` (underscore, not dash) as permanent zero-count metric rows
    * that deflate the macro average. Reference quirk, reproduced not fixed. */
  val nerTypes: Seq[String] =
    entity2id.keys.filterNot(k => k.contains("-") ||
      Set("<unk>", "O", "<START>", "<STOP>").contains(k)).toSeq
}
