package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Hashing

/** Deterministic web-text corpus generator at ARBITRARY scale — the input
  * for the 10× growth bench (`Bench` `scale10x`): documents-table-shaped
  * rows with the statistics that make dedup/LSH work representative:
  * heavy-tail vocabulary, ~5% exact duplicates, ~10% near-duplicates
  * (single-token tail edits), ~8% docs opening with shared boilerplate
  * (exercises the stop-shingle guards), four latin langs. Pure per-row
  * builders: any row is computable in isolation, so generation is
  * embarrassingly parallel and reproducible at any parallelism. */
object WebDocs {

  private val syllables = Array(
    "ta", "ri", "no", "ve", "la", "mi", "so", "du", "ke", "pa",
    "lo", "sen", "tor", "bel", "cam", "dor", "fin", "gra", "hul", "jen")

  /** Stable pseudo-word for a stem id: 2-4 syllables, 4-12 chars. */
  private def word(id: Int): String = {
    var s = Hashing.splitmix64(id.toLong * 7919L + 17L)
    val n = 2 + (Math.floorMod(s, 3L)).toInt
    val sb = new StringBuilder
    var k = 0
    while (k < n) {
      s = Hashing.splitmix64(s)
      sb.append(syllables(Math.floorMod(s, syllables.length.toLong).toInt))
      k += 1
    }
    sb.toString
  }

  /** Boilerplate paragraph for variant `v` — variants share no text, so the
    * mutually-similar cohort is the docs of ONE variant. The variant count
    * scales with corpus size (n/100), keeping cohorts at a constant ~8 docs:
    * boilerplate pair counts then grow LINEARLY with n, as they do in real
    * crawls (a fixed template family appears on a bounded set of sites) —
    * a fixed variant count would make every 10× corpus quadratically more
    * pair-dense than the last, benchmarking the corpus, not the operator. */
  private def boiler(v: Long): String = {
    var s = Hashing.splitmix64(v * 104729L + 3L)
    val sb = new StringBuilder
    var k = 0
    while (k < 10) {
      s = Hashing.splitmix64(s)
      sb.append(word(Math.floorMod(s, 800L).toInt)).append(' ')
      k += 1
    }
    sb.append(f"boil$v%d. ")
    sb.toString
  }

  private def langOf(i: Long, seed: Long): String = {
    val s = Hashing.splitmix64(seed * 31 + i * 131 + 5)
    Math.floorMod(s, 10L) match {
      case 0 | 1 | 2 | 3 | 4 => "en"
      case 5 | 6 => "de"
      case 7 | 8 => "fr"
      case _ => "es"
    }
  }

  /** Base text of doc `i`: 40-90 words drawn heavy-tailed (u² over 800
    * stems — frequent boilerplate-ish words plus a long rare tail), light
    * sentence punctuation, unique closing token (so distinct base docs are
    * never accidental near-dups). */
  private def baseText(i: Long, seed: Long, nTotal: Long): String = {
    var s = Hashing.splitmix64(seed * 1000003L + i * 2654435761L)
    val n = 40 + Math.floorMod(s, 50L).toInt
    val sb = new StringBuilder
    if (Math.floorMod(i, 13L) == 0L)
      sb.append(boiler(Math.floorMod(Hashing.splitmix64(i), math.max(nTotal / 100, 1L))))
    var k = 0
    while (k < n) {
      s = Hashing.splitmix64(s)
      val u = (s >>> 11).toDouble / (1L << 53).toDouble
      sb.append(word((u * u * 800).toInt))
      sb.append(if (k % 12 == 11) ". " else " ")
      k += 1
    }
    sb.append(f"tail$seed%d-$i%d")
    sb.toString
  }

  /** (text, lang) of doc `i`, with the dup structure:
    * `i % 20 == 7` → exact copy of doc i-1; `i % 10 == 3` → near-dup of doc
    * i-1 (one replaced tail token). Referenced docs are always base docs
    * (7 and 3 differ mod 10, and predecessors land on neither residue). */
  def docText(i: Long, seed: Long, nTotal: Long): (String, String) = {
    if (i > 0 && i % 20 == 7) (baseText(i - 1, seed, nTotal), langOf(i - 1, seed))
    else if (i > 0 && i % 10 == 3) {
      val b = baseText(i - 1, seed, nTotal)
      (b.dropRight(4) + f"ed$i%d", langOf(i - 1, seed))
    } else (baseText(i, seed, nTotal), langOf(i, seed))
  }

  /** documents-table-shaped frame: (doc_id, text, lang). */
  def documents(spark: SparkSession, n: Long, seed: Long): DataFrame = {
    import spark.implicits._
    val slices = math.max(spark.sparkContext.defaultParallelism * 2, 4)
    spark.range(0, n, 1, slices).map { i =>
      val (t, l) = docText(i, seed, n)
      (i, t, l)
    }.toDF("doc_id", "text", "lang")
  }

  /** embeddings-table-shaped frame: (vec_id, embedding dim-64), uniform
    * [-1,1) coords (distinct vectors near-orthogonal at this dim), with
    * `i % 12 == 5` a near-copy of vector i-1 (cosine ≈ 0.999). */
  def embeddings(spark: SparkSession, n: Long, seed: Long, dim: Int = 64): DataFrame = {
    import spark.implicits._
    def base(i: Long): Array[Float] = {
      var s = Hashing.splitmix64(seed * 40503L + i * 6364136223846793005L)
      Array.fill(dim) {
        s = Hashing.splitmix64(s)
        (((s >>> 11).toDouble / (1L << 53).toDouble) * 2 - 1).toFloat
      }
    }
    val slices = math.max(spark.sparkContext.defaultParallelism * 2, 4)
    spark.range(0, n, 1, slices).map { i =>
      val v =
        if (i > 0 && i % 12 == 5) {
          val b = base(i - 1)
          var s = Hashing.splitmix64(i)
          b.map { x => s = Hashing.splitmix64(s); x + 0.005f * (Math.floorMod(s, 100L) / 100.0f) }
        } else base(i)
      (i, v)
    }.toDF("vec_id", "embedding")
  }
}
