package graft.schema

import java.sql.Timestamp

/** Case-class row types for every pipeline stage (typed Dataset encoders). */

/** One Common-Crawl-style web page, the exact input_hint shape:
  * (url string, warc_ts timestamp, html binary, text string, lang string). */
final case class PageDoc(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** Char-offset span, end-exclusive, over the (cleaned) context string —
  * matches text[s:e] slicing at run_qa.py:469,481. */
final case class Span(start: Int, end: Int)

/** Turn-1 output: one detected subject mention. */
final case class Mention(
    url: String,
    subjectType: String,
    subject: String,
    span: Span
)

/** One extracted (subject, relation, object) triple for a document.
  * Mirrors the spo_list record at run_qa.py:483-487. */
final case class Triple(
    url: String,
    subjectType: String,
    subject: String,
    relation: String,
    objectType: String,
    obj: String
)

/** Triple after entity linking: surfaces resolved to canonical ids. */
final case class CanonicalTriple(
    subjectId: Long,
    subject: String,
    subjectType: String,
    relation: String,
    objectId: Long,
    obj: String,
    objectType: String,
    urls: Long // number of distinct supporting documents
)

/** Gold evaluation record (FIXTURES.md §2). */
final case class GoldTriple(
    url: String,
    subjectType: String,
    subject: String,
    relation: String,
    objectType: String,
    obj: String,
    spanSubject: Span,
    spanObject: Span
)

/** Intermediate QA sample (mirrors data/data_utils.py:282-338 records,
  * union-typed label normalized to always-array). */
final case class QaSample(
    url: String,
    context: String,
    question: String,
    questionType: Int, // B-tag id of the asked type
    subjectToken: String, // empty for turn-1 samples
    labels: Seq[Span]
)

/** Fixed-width encoded sample — the columnar twin of the reference's six
  * parallel .npy matrices (data/data_utils.py:561-566). `context` and
  * `subjectToken` are the line-aligned prepared-doc fields the reference
  * keeps NEXT to its feature store (S5, utils/run_qa.py predict I/O): eval
  * over a persisted stage needs them to re-derive the gazetteer bias
  * without re-encoding. */
final case class EncodedSample(
    url: String,
    questionType: Int,
    inputIds: Array[Int],
    inputMask: Array[Int],
    segmentIds: Array[Int],
    labels: Array[Int],
    lenQuestion: Int,
    lenContext: Int,
    context: String,
    subjectToken: String
)

/** Per-partition lineage/checkpoint record written by every stage
  * (north_rule: "per-partition lineage + metrics"). */
final case class StageManifest(
    stage: String,
    partitionId: Int,
    rowCount: Long,
    checksum: Long, // order-independent xor/sum of xxhash64(url)
    inputSnapshot: String
)

/** Per-question-type metric row, compute_performance semantics
  * (utils/evaluate_funcs.py:122-317). */
final case class TypeMetrics(
    questionType: String,
    tpPrecise: Long,
    tpBlurred: Long,
    numPre: Long,
    numGold: Long,
    precisionPrecise: Double,
    recallPrecise: Double,
    f1Precise: Double,
    precisionBlurred: Double,
    recallBlurred: Double,
    f1Blurred: Double
)
