package graft.operators

import graft.functions.BpeFunctions
import graft.state.HistoryFormat
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Subword (byte-pair-encoding) tokenization — train, encode, decode,
  * persist, drift. The trainer-real upgrade of the word-level
  * [[Curation.buildWordVocab]] family: a word vocab maps every unseen
  * word to `unk`, while BPE decomposes it into known subwords, which is
  * what an actual training export ships (Sennrich et al.
  * arXiv:1508.07909; the greedy rank rule is GPT-2's).
  *
  * Model discipline (the quantizer/vocab contract): the merge table is
  * O(numMerges) DRIVER state — train once on a reference slice, persist
  * ([[save]] stamps a [[HistoryFormat.BpeMerges]] marker), and encode
  * every later batch under the SAME model so id sequences stay mutually
  * comparable; [[drift]] is the staleness signal that triggers a
  * retrain.
  *
  * Scale shape: training first reduces the corpus to its word-TYPE
  * table (one partial-agg'd exchange; the type table is bounded by the
  * language's vocabulary, not the corpus size), then runs `numMerges`
  * iterations of ONE partial-agg'd pair-count each over that cached
  * table, collecting a single argmax row per iteration. Encoding is
  * map-only zero-exchange codegen ([[graft.functions.BpeIdsExpr]]) —
  * the corpus never shuffles.
  */
object Bpe {

  /** A trained BPE model. Ids are 1-based positions in
    * `baseSymbols ++ merges` concatenations; id 0 is reserved for
    * `unk`. `baseSymbols` are single code points, sorted, and include
    * the `" "` word separator (so documents round-trip byte-exactly
    * through encode→decode).
    *
    * `byteFallback = true` is the GPT-2-style zero-OOV mode: ids
    * `symbols.size + 1 .. symbols.size + 256` are UTF-8 BYTE ids, and a
    * code point outside the base alphabet encodes as its byte sequence
    * instead of `unk` — every UTF-8 string becomes encodable and the
    * round trip is byte-exact on arbitrary input (property-pinned), the
    * difference between a demo tokenizer and a trainer-real one. The
    * flag is part of the persisted format (the id space grows by 256);
    * [[vocabSize]] is what an embedding table must allocate. */
  final case class BpeModel(baseSymbols: Seq[String],
      merges: Seq[(String, String)], byteFallback: Boolean = false) {
    require(baseSymbols.nonEmpty, "BPE model needs a base alphabet")
    require(baseSymbols == baseSymbols.distinct.sorted,
      "base symbols must be sorted and distinct (ids are positional — an " +
        "unsorted alphabet would re-id every symbol nondeterministically)")
    require(baseSymbols.forall(s => s.nonEmpty &&
        s.codePointCount(0, s.length) == 1),
      "base symbols must be single code points")
    require(baseSymbols.contains(" "),
      "base symbols must include the ' ' word separator (decode needs a " +
        "representable boundary to restore documents byte-exactly)")

    /** All symbols in id order: id(symbols(i)) = i + 1. */
    val symbols: Seq[String] = baseSymbols ++ merges.map { case (l, r) => l + r }
    require(symbols.distinct.size == symbols.size,
      "degenerate merge list: two merges (or a merge and a base symbol) " +
        "produce the same symbol string — ids would be ambiguous")
    // every merge side must be a symbol formed EARLIER (base or a prior
    // merge): a forward reference could never occur in a segmentation,
    // so it marks a corrupt or hand-edited model. One accumulating set
    // keeps validation O(m) — a ~30k-merge model must load in
    // milliseconds, not minutes
    locally {
      val known = new scala.collection.mutable.HashSet[String]()
      baseSymbols.foreach(known.add)
      merges.zipWithIndex.foreach { case ((l, r), k) =>
        require(known(l) && known(r),
          s"merge #${k + 1} ($l, $r) references a symbol no earlier merge " +
            "or base symbol produces — corrupt model")
        known.add(l + r)
      }
    }

    val spaceId: Int = baseSymbols.indexOf(" ") + 1
    def idOf(sym: String): Option[Int] = {
      val i = symbols.indexOf(sym)
      if (i < 0) None else Some(i + 1)
    }

    /** Byte-id origin for the codegen encode/decode: byte `b` maps to
      * id `byteBase + 1 + b`; −1 disables fallback. */
    val byteBase: Int = if (byteFallback) symbols.size else -1

    /** Ids an embedding table must cover: unk + symbols (+ 256 byte ids
      * under fallback). */
    val vocabSize: Int = 1 + symbols.size + (if (byteFallback) 256 else 0)
  }

  /** Reserved id for unknown symbols (characters outside the base
    * alphabet): real ids are 1-based, so 0 is never a collision. */
  val Unk: Int = 0

  /** Train `numMerges` BPE merges on a reference slice; returns each
    * learned merge with its winning pair count (the [[trainMerges]]
    * surface exists so the training trace itself is oracle-checkable).
    *
    * Determinism: the argmax order is (count DESC, left ASC, right ASC)
    * — a total order, so training is reproducible across partitionings
    * and engines (suite-pinned). Stops early if every word is a single
    * symbol. */
  def trainMerges(ref: DataFrame, textCol: String,
      numMerges: Int): Seq[(String, String, Long)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val wf = ref.select(explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var merges = Vector.empty[(String, String, Long)]
      var exhausted = false
      while (merges.size < numMerges && !exhausted) {
        val syms = BpeFunctions.bpeSymbols(col("w"),
          merges.map(m => (m._1, m._2)))
        val top = wf.select(col("freq"), syms.as("__syms"))
          .filter(size(col("__syms")) >= 2)
          .select(col("freq"),
            explode(transform(sequence(lit(1), size(col("__syms")) - 1),
              i => struct(element_at(col("__syms"), i).as("l"),
                element_at(col("__syms"), i + 1).as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum("freq").as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else merges :+= ((top(0).getString(0), top(0).getString(1),
          top(0).getLong(2)))
      }
      merges
    } finally { wf.unpersist(false); () }
  }

  /** Train a full model: the base alphabet is the reference slice's
    * distinct code points (plus the `" "` separator), sorted; merges
    * come from [[trainMerges]]. The alphabet collect is the model
    * itself — O(charset), corpus-size-independent. */
  def train(ref: DataFrame, textCol: String, numMerges: Int,
      byteFallback: Boolean = false): BpeModel = {
    val chars = ref
      .select(explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .select(explode(BpeFunctions.bpeSymbols(col("w"), Seq.empty)).as("ch"))
      .distinct().collect().map(_.getString(0))
    val base = (chars.toSeq :+ " ").distinct.sorted
    BpeModel(base, trainMerges(ref, textCol, numMerges).map(m => (m._1, m._2)),
      byteFallback)
  }

  /** Map every document to its BPE id sequence — `(id, ids, n_tokens,
    * n_oov)`, the [[Curation.tokenizeToIds]] shape so the packing/FIM/
    * export tail composes unchanged. Map-only, zero exchanges. Under a
    * byte-fallback model `n_oov` is 0 by construction — the fertility
    * report's oov column measures exactly the gap the fallback closes. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame =
    df.select(col(idCol),
        BpeFunctions.bpeIds(col(textCol), model.merges, model.symbols,
          model.spaceId, Unk, model.byteBase).as("ids"))
      .select(col(idCol), col("ids"),
        size(col("ids")).cast("long").as("n_tokens"),
        size(filter(col("ids"), x => x === lit(Unk))).cast("long").as("n_oov"))

  /** Decode direction: ids back to text. Space ids ARE symbols (`" "`),
    * so concatenation restores the document byte-exactly when no id is
    * `unk`; unknown ids render as `unkToken` (U+FFFD by default —
    * visibly lossy, like every real tokenizer's decode of unk). The
    * assembly is the byte-level codegen expression, so under a
    * byte-fallback model the fallback ids reassemble their multi-byte
    * code points exactly. Round trip: all-in-alphabet text round-trips
    * under any model; ARBITRARY UTF-8 round-trips under
    * `byteFallback = true` (both property-pinned). */
  def decode(ids: Column, model: BpeModel,
      unkToken: String = "�"): Column =
    BpeFunctions.bpeDecode(ids, model.symbols, model.byteBase, unkToken)

  /** Persist a model as a tiny parquet table inside `path`, stamped
    * with the [[HistoryFormat.BpeMerges]] marker (the id space is a
    * FORMAT: re-deriving it differently silently re-ids every persisted
    * token sequence). Rows: `(ord, kind, left, right)` — kind `base`
    * rows carry the symbol in `left`. */
  def save(spark: SparkSession, path: String, model: BpeModel): Unit = {
    import spark.implicits._
    val baseRows = model.baseSymbols.zipWithIndex.map { case (s, i) =>
      (i, "base", s, null: String)
    }
    val mergeRows = model.merges.zipWithIndex.map { case ((l, r), i) =>
      (model.baseSymbols.size + i, "merge", l, r)
    }
    // the fallback flag is model state, not a symbol: a dedicated `opt`
    // row (ord -1 sorts before every symbol row). Flagless tables load
    // as byteFallback = false, so pre-fallback saves stay readable.
    val optRows =
      if (model.byteFallback) Seq((-1, "opt", "byte_fallback", "true"))
      else Seq.empty
    (optRows ++ baseRows ++ mergeRows).toDF("ord", "kind", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
    HistoryFormat.stamp(spark.sparkContext.hadoopConfiguration, path,
      HistoryFormat.BpeMerges)
  }

  /** Inverse of [[save]]. Refuses loudly (naming the retrain remedy)
    * when the marker is missing or names a different format version —
    * the operator-enforced [[HistoryFormat.ensure]] contract. */
  def load(spark: SparkSession, path: String): BpeModel = {
    HistoryFormat.ensure(spark.sparkContext.hadoopConfiguration, path,
      HistoryFormat.BpeMerges, hasData = true)
    val rows = spark.read.parquet(path).orderBy("ord").collect()
    val base = rows.filter(_.getString(1) == "base").map(_.getString(2)).toSeq
    val merges = rows.filter(_.getString(1) == "merge")
      .map(r => (r.getString(2), r.getString(3))).toSeq
    val byteFallback = rows.exists(r => r.getString(1) == "opt" &&
      r.getString(2) == "byte_fallback" && r.getString(3) == "true")
    BpeModel(base, merges, byteFallback)
  }

  /** Model-staleness signal for a new batch — the [[Curation.vocabDrift]]
    * pattern over the subword model: a BPE alphabet built once degrades
    * when the corpus moves (new scripts, new charset), and rising
    * unknown-symbol rate is the measurable symptom. One row: token
    * totals, corpus `oov_rate`, `frac_high` (share of documents whose
    * own OOV rate exceeds `maxDocOov`), `rebuild` when that share
    * exceeds `maxHighFrac`. Map-only encode + one global aggregate; the
    * batch never shuffles. */
  /** Tokenizer-fertility report — the QC number a tokenizer ships with:
    * subword tokens per whitespace word, by source. High fertility on
    * one source means its text (script, code, another language) is
    * being shredded to characters: its documents cost proportionally
    * more of the context window and train worse. One row per source:
    * doc/word/subword/oov totals, `fertility` (subwords per word),
    * `oov_rate`. Map-only encode + one partial-agg'd exchange on the
    * source key; fractions divide exact integer sums once. */
  def fertility(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, model: BpeModel): DataFrame =
    df.select(col(idCol), col(sourceCol).as("source"),
        size(split(col(textCol), " ", -1)).cast("long").as("__nw"))
      .join(encode(df, idCol, textCol, model)
        .select(col(idCol), col("n_tokens"), col("n_oov")), idCol)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("__nw").as("n_words"),
        sum("n_tokens").as("n_subwords"),
        sum("n_oov").as("n_oov"),
        round(sum("n_tokens").cast("double") /
          greatest(sum("__nw"), lit(1L)), 4).as("fertility"),
        round(sum("n_oov").cast("double") /
          greatest(sum("n_tokens"), lit(1L)), 4).as("oov_rate"))

  def drift(batch: DataFrame, idCol: String, textCol: String,
      model: BpeModel, maxDocOov: Double, maxHighFrac: Double): DataFrame =
    encode(batch, idCol, textCol, model)
      .select(col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") /
          greatest(col("n_tokens"), lit(1L)).cast("double") > maxDocOov)
          .as("high"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"),
        coalesce(sum(col("n_oov")), lit(0L)).as("n_oov"),
        round(coalesce(sum(col("n_oov")), lit(0L)).cast("double") /
          greatest(sum(col("n_tokens")), lit(1L)), 4).as("oov_rate"),
        round(coalesce(sum(when(col("high"), 1L).otherwise(0L)), lit(0L))
          .cast("double") / greatest(count(lit(1)), lit(1L)), 4)
          .as("frac_high"))
      .withColumn("rebuild", col("frac_high") > maxHighFrac)
}
