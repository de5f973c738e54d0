package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016,
  * arXiv:1508.07909) — the iterative loop whose step 0 is the oracled
  * q_bpe_pair_freqs table.
  *
  * Scale shape: every iteration works on the VOCAB frame (distinct
  * words × symbol count), never the corpus — word frequencies carry the
  * corpus mass, so a 100 TB corpus trains from the same ~10^7-row vocab
  * a laptop would (the standard trick: corpus → (word, freq) once, then
  * iterate on the aggregate). Per merge: one hash aggregate for pair
  * counts, one driver-side argmax over a character-pair-cardinality
  * frame (a scalar decision — the legitimate collect), one codegen'd
  * higher-order-function pass applying the merge greedily left-to-right.
  * The vocab frame re-caches each round with the previous round freed
  * (the ConnectedComponents lineage-hygiene pattern).
  *
  * Determinism: the argmax tiebreak is (count desc, a asc, b asc) —
  * total order, so the merge sequence is reproducible on any engine,
  * partitioning, or run.
  */
object Bpe {

  /** (pairs merged, final symbol-sequence vocab (tok, freq, syms)).
    * `vocab` must carry (tok: string, freq: long).
    */
  def train(vocab: DataFrame, nMerges: Int): (Seq[(String, String)], DataFrame) = {
    var cur = vocab
      .withColumn("syms",
        expr("transform(sequence(1, length(tok)), i -> substr(tok, i, 1))"))
      .cache()
    cur.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < nMerges && !done) {
      val top = pairCounts(cur)
        .orderBy(col("pair_count").desc, col("a"), col("b"))
        .limit(1).collect()
      top.headOption match {
        case Some(r: Row) if r.getAs[Long]("pair_count") >= 2 =>
          val (a, b) = (r.getAs[String]("a"), r.getAs[String]("b"))
          merges += ((a, b))
          // localCheckpoint, not cache: cache leaves the LOGICAL plan
          // growing one applyMerge layer per round, and analysis over
          // that chain is O(rounds²) — at the r15 full-capacity table
          // (~100 rounds) the analyzer dominated wall time (measured:
          // the 16-round trainer finished in seconds; 100+ rounds hung
          // for 20+ min before this fix). Checkpointing truncates
          // lineage each round; the frame is vocab-scale, so the
          // materialization is bytes.
          val next = applyMerge(cur, a, b).localCheckpoint()
          cur.unpersist(blocking = false)
          cur = next
        case _ => done = true // no pair occurs twice: nothing left to merge
      }
    }
    (merges.toSeq, cur)
  }

  /** Adjacent-pair counts over the current symbol sequences, weighted by
    * word frequency — one explode of the vocab frame + one hash agg.
    */
  def pairCounts(seqs: DataFrame): DataFrame =
    seqs
      // single-symbol words carry no pairs; filter BEFORE the explode —
      // Spark's sequence(1, 0) steps backwards to [1, 0] and would emit
      // a bogus index-0 row per such word (INVALID_INDEX_OF_ZERO under
      // element_at)
      .filter(size(col("syms")) >= 2)
      .withColumn("i", explode(sequence(lit(1), size(col("syms")) - 1)))
      .select(expr("element_at(syms, i)").as("a"),
        expr("element_at(syms, i + 1)").as("b"), col("freq"))
      .groupBy("a", "b").agg(sum(col("freq")).as("pair_count"))

  /** Merges applied per materialization stage in [[encode]]. */
  val MergeStage = 24

  /** The FULL-CAPACITY merge table produced by [[train]] to exhaustion
    * (tools.BpeTrain) on the sf0.01 corpus vocabulary, baked as
    * literals: production tokenization encodes with a FROZEN tokenizer,
    * so the merge sequence is a constant of the job, not a per-run
    * training artifact — exactly how a deployed BPE vocab ships.
    * Capacity note (r15): the synthetic corpus has 31 distinct
    * whitespace tokens / 138 characters, so 107 pair-applications
    * (Σ(len−1)) is the hard collapse ceiling; training exhausts at 89
    * DISTINCT rules (rules are shared across words — e.g. "er" serves
    * merge/order/query) with every word reduced to a single symbol.
    * This table IS the complete trainable sequence — the verdict's
    * nominal 256 is structurally unreachable on this corpus, so the
    * scale axis measured in BASELINE is per-merge encode-pass cost
    * (16 → 89 passes over the distinct-word frame). (Regenerate with
    * tools.BpeTrain if the corpus generator changes; BpeSpec pins
    * apply semantics, the q_bpe_encode oracle pins the full encode
    * chain.)
    */
  val TrainedMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("j", "o"), ("jo", "in"),
    ("a", "s"), ("as", "h"), ("h", "ash"), ("r", "ow"),
    ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"),
    ("co", "lu"), ("colu", "m"), ("colum", "n"), ("cu", "st"),
    ("cust", "o"), ("custo", "mer"), ("f", "i"), ("fi", "l"),
    ("fil", "t"), ("filt", "er"), ("a", "l"), ("al", "l"),
    ("m", "all"), ("s", "mall"), ("g", "e"), ("l", "ow"),
    ("mer", "ge"), ("s", "low"), ("c", "t"), ("ct", "or"),
    ("d", "er"), ("e", "ctor"), ("or", "der"), ("v", "ector"),
    ("in", "e"), ("l", "ine"), ("a", "b"), ("ab", "l"),
    ("abl", "e"), ("at", "a"), ("d", "ata"), ("t", "able"),
    ("u", "p"), ("a", "g"), ("ag", "g"), ("a", "lu"),
    ("alu", "e"), ("v", "alue"), ("e", "y"), ("k", "ey"),
    ("a", "m"), ("e", "am"), ("r", "eam"), ("st", "ream"),
    ("d", "ow"), ("in", "dow"), ("w", "indow"), ("par", "k"),
    ("s", "park"), ("g", "r"), ("gr", "o"), ("gro", "up"),
    ("par", "t"), ("b", "i"), ("bi", "g"), ("or", "t"),
    ("s", "ort"), ("er", "y"), ("q", "u"), ("qu", "ery"),
    ("a", "st"), ("f", "ast"), ("h", "e"), ("t", "he"),
    ("d", "up"))

  /** Distributed BPE ENCODE with [[TrainedMerges]] (VERDICT r13 task 6 —
    * the production counterpart of the test-only trainer): token counts
    * per source after applying the frozen merge sequence.
    *
    * Scale shape, same vocabulary trick as training: the merge passes
    * run over the DISTINCT-WORD frame (each word encoded once, however
    * often it occurs in the corpus), then piece counts join back to the
    * per-(source, word) frequencies — at 100 TB that is 16 codegen'd
    * HOF passes over a ~10^7-row vocab plus one hash join, never 16
    * passes over the corpus text. Fertility is one IEEE division of
    * exact integer sums.
    */
  def encode(docs: DataFrame): DataFrame = {
    val words = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      // empty tokens (double spaces) carry no chars; and sequence(1, 0)
      // steps backwards — same guard as pairCounts
      .filter(length(col("tok")) >= 1)
      .groupBy("source", "tok").agg(count(lit(1)).as("n"))
    encodeFromCounts(words, piecesTable(words.select("tok").distinct()))
  }

  /** Piece counts of the frozen tokenizer over a distinct-token frame:
    * (tok, pieces). Merge passes apply in stages of MergeStage with a
    * materialization boundary between stages: Catalyst collapses the
    * chained withColumns into ONE projection whose nested-HOF
    * expression tree grows with every merge, and past a few dozen
    * merges the analysis/eval cost of that single expression dominates
    * (the r15 full-capacity table is ~6x the old 16). Each stage is one
    * pass over the DISTINCT-WORD frame — vocab-scale rows, so the
    * localCheckpoint is bytes, not corpus.
    */
  def piecesTable(vocabToks: DataFrame): DataFrame = {
    val vocab = vocabToks
      .withColumn("syms",
        expr("transform(sequence(1, length(tok)), i -> substr(tok, i, 1))"))
    TrainedMerges.grouped(MergeStage)
      .foldLeft(vocab) { case (df, grp) =>
        grp.foldLeft(df) { case (f, (a, b)) => applyMerge(f, a, b) }
          .localCheckpoint()
      }
      .select(col("tok"), size(col("syms")).cast("long").as("pieces"))
  }

  /** Encode from precomputed (source, tok, n) word counts and a (tok,
    * pieces) table — the memo-riding form: the pack passes session-
    * cached frames so a warm q_bpe_encode is one join + one aggregate.
    */
  def encodeFromCounts(words: DataFrame, pieces: DataFrame): DataFrame =
    words.join(pieces, "tok")
      .groupBy("source")
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("pieces")).as("n_pieces"))
      .withColumn("bpe_fertility",
        col("n_pieces").cast("double") / col("n_words").cast("double"))
      .orderBy("source")

  /** Greedy left-to-right merge of every (a, b) adjacency in one
    * codegen'd aggregate() fold: append each symbol unless it completes
    * the pair with the (unmerged) last element, in which case the two
    * collapse into one — the standard BPE application order (a freshly
    * merged token never immediately re-merges with the next symbol,
    * matching sequential trainers).
    */
  def applyMerge(seqs: DataFrame, a: String, b: String): DataFrame = {
    val al = a.replace("\\", "\\\\").replace("'", "\\'")
    val bl = b.replace("\\", "\\\\").replace("'", "\\'")
    seqs.withColumn("syms",
      expr(
        s"""aggregate(syms,
           |  named_struct('acc', cast(array() as array<string>), 'justMerged', false),
           |  (st, x) -> case
           |    when size(st.acc) > 0 and not st.justMerged
           |         and element_at(st.acc, -1) = '$al' and x = '$bl'
           |    then named_struct(
           |      'acc', concat(slice(st.acc, 1, size(st.acc) - 1), array('$al' || '$bl')),
           |      'justMerged', true)
           |    else named_struct('acc', concat(st.acc, array(x)), 'justMerged', false)
           |  end,
           |  st -> st.acc)""".stripMargin))
  }
}
