package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units", public) — the
  * tokenizer-building step of an LLM data pipeline, shaped for a 100 TB
  * corpus:
  *
  *  - The ONLY corpus-scale pass is the word-count aggregation (one
  *    shuffle of words; map-side combine collapses hot words). BPE then
  *    iterates over the WORD-FREQUENCY table — bounded by vocabulary
  *    size, not corpus size — exactly how the reference implementation
  *    trains (on `vocab` counts, never re-reading the corpus).
  *  - Each merge round is pure relational algebra over that table:
  *    adjacent-pair stats (explode + sum), a global argmax (the 1-row
  *    driver collect per round is the model state, same pattern as
  *    [[graft.ann.Ann.kMeans]]'s k centroids), and a greedy left-to-right
  *    non-overlapping merge application. Greedy selection is the
  *    consecutive-run trick: candidate positions p of the winning pair
  *    are consecutive ONLY where the pair is a doubled symbol (a == b),
  *    so keeping every other position within each consecutive run — via
  *    a per-word window, never an unpartitioned one — is exactly the
  *    reference's left-to-right scan.
  *  - Per-round lineage is truncated with an eager localCheckpoint
  *    (same reasoning as [[graft.dedup.Clusters.connectedComponents]]).
  *
  * Determinism: ties in pair frequency break by (a ASC, b ASC), so the
  * learned merge table is a pure function of the corpus and replayable
  * by a SQL oracle (q84 unrolls the rounds as CTE stages in DuckDB).
  */
object Bpe {

  val endOfWord = "</w>"

  /** (word, cnt, syms) vocabulary table: whitespace-lowered word counts,
    * each word split into single-character symbols plus the end-of-word
    * marker. `split(w, "")` under Java regex keeps a trailing empty
    * string — filter it. */
  def wordTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(TextOps.wsTokens(lower(coalesce(col(textCol), lit(""))))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"),
        concat(filter(split(col("word"), ""), s => length(s) > 0),
          array(lit(endOfWord))).as("syms"))

  /** One row per adjacent symbol pair occurrence: (word, cnt, p, a, b). */
  private def pairPos(words: DataFrame): DataFrame = {
    val n1 = greatest(size(col("syms")) - 1, lit(0))
    val pairs = zip_with(
      slice(col("syms"), lit(1), n1), slice(col("syms"), lit(2), n1),
      (x, y) => struct(x.as("a"), y.as("b")))
    words
      .select(col("word"), col("cnt"), posexplode(pairs).as(Seq("p", "pr")))
      .select(col("word"), col("cnt"), col("p"),
        col("pr.a").as("a"), col("pr.b").as("b"))
  }

  /** Aggregate pair frequencies over the vocabulary. */
  def pairStats(words: DataFrame): DataFrame =
    pairPos(words).groupBy("a", "b").agg(sum("cnt").as("freq"))

  /** Apply ONE merge (a, b) → ab greedily left-to-right to every word. */
  def applyMerge(words: DataFrame, a: String, b: String): DataFrame = {
    val cands = pairPos(words)
      .filter(col("a") === a && col("b") === b)
      .select(col("word"), col("p"))
    val w = Window.partitionBy(col("word")).orderBy(col("p"))
    val sel = cands
      .withColumn("grp", col("p") - row_number().over(w))
      .withColumn("mn", min(col("p")).over(Window.partitionBy(col("word"), col("grp"))))
      .filter((col("p") - col("mn")) % 2 === 0)
      .groupBy("word").agg(sort_array(collect_list(col("p"))).as("sel"))
    words
      .join(sel, Seq("word"), "left")
      .select(col("word"), col("cnt"),
        when(col("sel").isNull, col("syms")).otherwise {
          val removed = transform(col("sel"), p => p + 1)
          transform(
            filter(sequence(lit(0), size(col("syms")) - 1),
              i => !array_contains(removed, i)),
            i => when(array_contains(col("sel"), i),
              concat(element_at(col("syms"), i + 1), element_at(col("syms"), i + 2)))
              .otherwise(element_at(col("syms"), i + 1)))
        }.as("syms"))
  }

  /** Training loop shared by [[train]] and [[encode]]: returns the merge
    * rows AND the final segmented word table (localCheckpointed — each
    * round's checkpoint truncates lineage; the superseded tables' blocks
    * are reclaimed by the ContextCleaner once dereferenced, Dataset
    * .unpersist does not apply to checkpoint blocks). */
  private def trainLoop(docs: DataFrame, nMerges: Int,
      textCol: String): (Seq[Row], DataFrame) = {
    var words = wordTable(docs, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val top = pairStats(words)
        .orderBy(desc("freq"), asc("a"), asc("b")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Row(r.toLong, a, b, f)
        words = applyMerge(words, a, b).localCheckpoint(true)
        r += 1
      }
    }
    (merges.toSeq, words)
  }

  private val mergeSchema = StructType(Seq(
    StructField("rank", LongType, nullable = false),
    StructField("a", StringType, nullable = false),
    StructField("b", StringType, nullable = false),
    StructField("freq", LongType, nullable = false)))

  /** Learn `nMerges` merges; returns (rank, a, b, freq) — the BPE model.
    * Stops early when no pair remains (fully merged vocabulary). */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text"): DataFrame = {
    val spark: SparkSession = docs.sparkSession
    val (merges, _) = trainLoop(docs, nMerges, textCol)
    spark.createDataFrame(spark.sparkContext.parallelize(merges, 1), mergeSchema)
  }

  /** Segment words with a learned merge table: replays the merges in rank
    * order (broadcast-small model state applied as successive relational
    * merges). Returns (word, cnt, syms). Each round localCheckpoints:
    * applyMerge references its input twice, so an un-truncated replay
    * doubles the logical plan per round — 2^n subtrees by merge n, the
    * Spark-side analogue of the CTE re-inlining the q87 oracle suppresses
    * with MATERIALIZED. */
  def segment(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame =
    merges.foldLeft(wordTable(docs, textCol)) {
      case (w, (a, b)) => applyMerge(w, a, b).localCheckpoint(true)
    }

  /** Train an `nMerges` model and encode every document into its BPE
    * token stream: one row per token occurrence (idCol, wpos, spos, sym,
    * id). Vocabulary ids follow the standard layout — base symbols
    * (single characters + the end-of-word marker, sorted) get 0..B-1,
    * merge r's product gets B+r-1. The vocab is model state (charset + n
    * rows, collected like the merge table); encoding itself is a corpus
    * scan joined to the segmented WORD table on `word` — vocabulary-sized,
    * so Spark broadcasts it when small and shuffle-joins when a 100 TB
    * corpus makes it large, both correct. */
  def encode(docs: DataFrame, nMerges: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    // ONE training chain: reuse its final (checkpointed) word table for
    // the token-stream join instead of replaying the rounds, and derive
    // the base charset from that table's word column instead of a third
    // corpus scan.
    val (mergeRowsRaw, words) = trainLoop(docs, nMerges, textCol)
    val mergeRows = mergeRowsRaw.map(r => (r.getString(1), r.getString(2)))
    val baseSyms = (words
      .select(explode(filter(split(col("word"), ""), s => length(s) > 0)).as("sym"))
      .distinct().collect().map(_.getString(0)).toSeq :+ endOfWord).sorted
    val b = baseSyms.length
    // duplicate products (two merges yielding the same string, or a
    // product colliding with a base symbol) keep the LOWEST id, so the
    // sym-keyed join below stays one-row-per-token
    val vocab = (baseSyms.zipWithIndex.map { case (s, i) => (s, i.toLong) } ++
      mergeRows.zipWithIndex.map { case ((a2, b2), i) => (a2 + b2, (b + i).toLong) })
      .groupBy(_._1).map { case (s, ids) => (s, ids.map(_._2).min) }.toSeq
    import spark.implicits._
    val vocabDf = vocab.toDF("sym", "id")
    docs
      .select(col(idCol),
        posexplode(TextOps.wsTokens(lower(coalesce(col(textCol), lit("")))))
          .as(Seq("wpos", "word")))
      .join(words.select(col("word"), col("syms")), Seq("word"))
      .select(col(idCol), col("wpos").cast("long").as("wpos"),
        posexplode(col("syms")).as(Seq("spos", "sym")))
      .join(broadcast(vocabDf), Seq("sym"))
      .select(col(idCol), col("wpos"), col("spos").cast("long").as("spos"),
        col("sym"), col("id"))
  }
}
