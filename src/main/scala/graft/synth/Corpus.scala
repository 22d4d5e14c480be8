package graft.synth

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.functions.TextNorm
import graft.schema.{GoldTriple, Ontology, PageDoc, Span}

/** Deterministic synthetic Common-Crawl-style corpus with planted triples
  * (FIXTURES.md §1-2). Built distributed (`spark.range → mapPartitions`), one
  * pure function of (docIndex, seed) per document, so pages and gold derive
  * from the same spec at any scale without a shuffle or driver-side loop.
  *
  * Doc classes (deterministic by index):
  *  - i % 37 == 0 → English chaff (lang=en), filtered by the pipeline
  *  - i % 41 == 0 → excluded-organ chaff (contains 肝/胃/甲状腺, run_qa.py:430)
  *  - i % 13 == 0 → payload salted with clean_data-able junk (exercises the
  *    byte-identity contract: parens strips, comma/space collapses)
  *  - rng < noisyFrac → noisy doc: one planted false-positive object OR one
  *    full-width-digit Size object the model misses (recall miss) — makes the
  *    P/R ≥ 0.95 gate non-trivial (FIXTURES.md §2)
  */
object Corpus {

  final case class DocSpec(page: PageDoc, gold: List[GoldTriple])

  val BaseTs = 1609459200000L // 2021-01-01T00:00:00Z

  /** Zipf-ish pick: index k with probability ∝ 1/(k+1) — creates the skewed
    * hot-key entities the north_rule requires linking to handle. */
  private def zipfPick(rng: Random, n: Int): Int = {
    val weights = (0 until n).map(k => 1.0 / (k + 1))
    val total = weights.sum
    var x = rng.nextDouble() * total
    var k = 0
    while (k < n - 1 && x >= weights(k)) { x -= weights(k); k += 1 }
    k
  }

  /** Pure per-document builder. Offsets are computed on the FINAL cleaned
    * text (the reference locates gold spans by text.find,
    * data/data_utils.py:258-272). */
  def buildDoc(i: Long, seed: Long, noisyFrac: Double): DocSpec = {
    val rng = new Random(seed * 1000003L + i * 2654435761L)
    val url = f"https://synth.test/$seed%d/$i%012d"
    val ts = new Timestamp(BaseTs + (i % 30) * 86400000L + (i % 86400) * 1000L)

    def page(payload: String, lang: String): PageDoc = {
      val html = s"<html><body><p>$payload</p></body></html>".getBytes(UTF_8)
      PageDoc(url, ts, html, TextNorm.extractTextStr(html), lang)
    }

    if (i % 37 == 0)
      return DocSpec(page(s"Routine chest CT report number $i. No abnormality detected.", "en"), Nil)
    if (i % 41 == 0)
      return DocSpec(page(s"胸部CT检查所见：肝脏及胆囊区未见异常密度影。扫描序号$i。", "zh"), Nil)

    val noisy = rng.nextDouble() < noisyFrac
    val fpNoise = noisy && rng.nextBoolean()
    val fnNoise = noisy && !fpNoise

    // Subjects: 1-2 distinct types; each relation planted for at most one
    // subject per doc (keeps turn-2 question answers unambiguous).
    val types = rng.shuffle(Ontology.questionTurn.keys.toList).take(1 + rng.nextInt(2))
    val usedRelations = mutable.Set.empty[String]
    val sentences = mutable.ListBuffer.empty[String]
    // (subjectType, subject, relation, object) in planting order
    val planted = mutable.ListBuffer.empty[(String, String, String, String)]
    var fpPhrase: Option[String] = None

    types.foreach { st =>
      val surf = Lexicon.subjects(st)(zipfPick(rng, Lexicon.subjects(st).size))
      val avail = Ontology.questionTurn(st).filterNot(usedRelations)
      val k = if (avail.isEmpty) 0 else 1 + rng.nextInt(math.min(3, avail.size))
      val rels = rng.shuffle(avail).take(k)
      rels.foreach(usedRelations += _)
      val objs = rels.map { r =>
        val oRaw =
          if (r == "Size") Lexicon.sizePhrase(5 + rng.nextInt(45), 3 + rng.nextInt(25))
          else {
            val lex = Lexicon.objects(r)
            lex(zipfPick(rng, lex.size))
          }
        // Recall-attack noise fires on EVERY fn-noisy doc (its first planted
        // object): full-width digits for Size, an in-vocabulary-breaking
        // char substitution otherwise — gold keeps the mutated surface at
        // its span, the gazetteer-distilled tagger cannot match it.
        val o =
          if (fnNoise && planted.isEmpty) {
            if (r == "Size") Lexicon.toFullWidthDigits(oRaw)
            else if (oRaw.length >= 2) oRaw.updated(oRaw.length / 2, '某')
            else oRaw + "某"
          } else oRaw
        planted += ((st, surf, r, o))
        o
      }
      // Precision-attack noise: an extra object phrase the gold does NOT
      // contain — the tagger will find it. Prefer a relation this subject
      // was not planted with; when the type's relation set is exhausted,
      // fall back to a SECOND (different) phrase of an already-planted
      // relation, which is still a guaranteed false positive.
      val extra =
        if (fpNoise && fpPhrase.isEmpty && st == types.last) {
          val unused = Ontology.questionTurn(st)
            .filterNot(usedRelations).filter(r => Lexicon.objects(r).nonEmpty)
          val pool =
            if (unused.nonEmpty) unused
            else rels.filter(r => r != "Size" && Lexicon.objects(r).size >= 2)
          if (pool.nonEmpty) {
            val r = pool(rng.nextInt(pool.size))
            val already = planted.collect { case (_, _, `r`, o) => o }.toSet
            val lex = Lexicon.objects(r).filterNot(already)
            if (lex.nonEmpty) {
              fpPhrase = Some(lex(rng.nextInt(lex.size)))
              fpPhrase.toList
            } else Nil
          } else Nil
        } else Nil
      sentences += (surf +: (objs ++ extra)).mkString("，") + "。"
    }

    // clean_data-able junk (i % 13): survives extraction as predictable bytes.
    val junk =
      if (i % 13 == 0)
        "(http://archive.example/warc)  报告编号## " + i + "，，复查对照。"
      else ""
    val payload = "胸部CT检查所见：" + sentences.mkString + junk + "余未见异常。"
    val p = page(payload, "zh")

    // Gold spans located on the final cleaned text, reference-style find().
    val gold = planted.toList.flatMap { case (st, subj, rel, obj) =>
      val sIdx = p.text.indexOf(subj)
      val oIdx = p.text.indexOf(obj)
      if (sIdx < 0 || oIdx < 0) Nil // defensive; never expected
      else List(GoldTriple(url, st, subj, rel, rel, obj,
        Span(sIdx, sIdx + subj.length), Span(oIdx, oIdx + obj.length)))
    }
    DocSpec(p, gold)
  }

  /** Partition count defaults to 4 waves per core: fine enough granularity
    * that per-doc cost variance (1-2 subjects, Mass asks 12 relations) can't
    * make a single straggler task set the stage time. */
  def docSpecs(spark: SparkSession, n: Long, seed: Long, noisyFrac: Double): Dataset[DocSpec] = {
    import spark.implicits._
    val slices = math.max(spark.sparkContext.defaultParallelism * 4, 4)
    spark.range(0, n, 1, slices).mapPartitions(_.map(i => buildDoc(i, seed, noisyFrac)))
  }

  def pages(spark: SparkSession, n: Long, seed: Long, noisyFrac: Double = 0.0): Dataset[PageDoc] = {
    import spark.implicits._
    docSpecs(spark, n, seed, noisyFrac).map(_.page)
  }

  def gold(spark: SparkSession, n: Long, seed: Long, noisyFrac: Double = 0.0): Dataset[GoldTriple] = {
    import spark.implicits._
    docSpecs(spark, n, seed, noisyFrac).flatMap(_.gold)
  }
}
