"""Distributed BPE merge training (Sennrich et al. 2016) — learn the
top-K byte-pair merge rules over a corpus, and tokenize with them.

Reference scope note: the reference ETL (src/main.py:17-120) has no
tokenizer surface — this module is part of the engine's LLM-pipeline
extension mandate (SURVEY.md §2.11), beside operators/textops.py's
BPE-ish token *counting* heuristic (textops.py:70), which estimates
token counts without a learned merge table. This one learns the table.

Algorithm (the classic word-frequency formulation, which is also the
scale story):

1. One corpus pass collapses the corpus to a ``(word, freq)`` table —
   vocabulary-sized (≪ corpus; ~10⁷ rows at 100 TB vs 10¹¹ docs). This
   is the ONLY corpus-sized shuffle; every merge round after it runs on
   the vocabulary table.
2. Each word becomes a symbol string: characters joined by a TWO-space
   separator, padded with one space each side (`` a  b  c ``). Symbols
   never contain spaces, so the encoding is unambiguous.
3. Per round: adjacent-pair counts weighted by word frequency (explode
   pairs → groupBy → sum), argmax with a deterministic tie-break
   (count DESC, pair string ASC), then apply the merge to every word
   with ONE literal string replace — ``' a  b ' → ' ab '``. Non-
   overlapping left-to-right replace is exactly the greedy sequential
   BPE merge scan (proved by the property test against a per-symbol
   fold reference in tests/test_bpe.py), and it stays in whole-stage
   codegen — no UDF, no per-row Python.

The per-round argmax is a ``LIMIT 1`` collect — one metadata row per
round, K rows total for the whole training run (same accepted class as
the k-row centroid seeds in operators/ivf.py:86). Everything else is
executor-side.

At 100 TB: step 1 is a standard map-side-combined word count; rounds
are vocabulary-sized (seconds each), so K=32k merges is bounded by
K × (vocab agg), embarrassingly parallel within each round. The replace
chain grows linearly with rounds; production tokenizer training would
checkpoint the symbol column every ~64 rounds (`checkpoint_every`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of the learned merge table.
MERGES_SCHEMA = T.StructType(
    [
        T.StructField("merge_rank", T.IntegerType(), False),
        T.StructField("lhs", T.StringType(), False),
        T.StructField("rhs", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq). The one corpus-sized pass; map-side
    combine collapses it to vocabulary-sized before the shuffle."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_symbols(word_col: Column | str = "word") -> Column:
    """Character-level symbol string for a word: chars joined by two
    spaces, one-space padding (`` a  b  c ``).

    Both Spark's ``split(w, '')`` (Java regex, code-point boundaries)
    and the oracle's ``w[i]`` (DuckDB, UTF-8 character indexing) split
    at Unicode code points, so the twins agree beyond ASCII; combining
    sequences (e.g. e + U+0301) are two symbols in both engines.
    """
    chars = F.split(F.col(word_col) if isinstance(word_col, str) else word_col, "")
    return F.concat(F.lit(" "), F.array_join(chars, "  "), F.lit(" "))


def apply_merge(sym: Column, lhs: str, rhs: str) -> Column:
    """Apply one merge rule to a symbol string. Literal (non-regex)
    replace; left-to-right non-overlapping == the greedy BPE scan.

    The pattern consumes one space of each flanking separator and the
    replacement restores them, so consecutive disjoint occurrences
    (`` a  b  a  b ``) both merge in one pass while overlapping ones
    (`` a  a  a `` under (a,a)) merge greedily to ``aa, a``.
    """
    return F.replace(
        sym,
        F.lit(f" {lhs}  {rhs} "),
        F.lit(f" {lhs}{rhs} "),
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    """Adjacent-pair counts over a (sym, freq) frame — explode is
    vocabulary-sized, the groupBy is pair-vocabulary-sized."""
    ts = F.split(F.trim(F.col("sym")), "  ")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(ts) - F.lit(2)),
        lambda i: F.concat(F.element_at(ts, i + 1), F.lit(" "), F.element_at(ts, i + 2)),
    )
    return (
        symbols.filter(F.size(ts) >= 2)
        .select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 8,
    checkpoint_every: int = 64,
    strict: bool = True,
) -> DataFrame:
    """Learn the first ``num_merges`` BPE merges over a corpus.

    Returns the merge table (merge_rank, lhs, rhs, merged, pair_count)
    — K rows, driver-materialized (one LIMIT-1 row per round; metadata-
    sized by construction). With ``strict`` (the default), raises if
    the corpus runs out of pairs before ``num_merges`` rounds (a
    degenerate corpus — the caller should lower K rather than receive a
    silently short table); ``strict=False`` instead stops early and
    returns the merges found so far (empty corpus → empty table), the
    behavior a scheduled backfill wants on an empty partition.
    """
    spark = docs.sparkSession
    base = (
        word_freq(docs, text_col)
        .select(initial_symbols("word").alias("sym"), "freq")
        .persist()
    )
    merges: list[tuple[int, str, str, str, int]] = []
    current = base
    try:
        for rank in range(1, num_merges + 1):
            top = (
                _pair_counts(current)
                .orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not top:
                if strict:
                    raise ValueError(
                        f"corpus exhausted after {rank - 1} merges; "
                        f"requested {num_merges}"
                    )
                break
            pair, cnt = top[0]["pair"], top[0]["cnt"]
            lhs, rhs = pair.split(" ", 1)
            merges.append((rank, lhs, rhs, lhs + rhs, cnt))
            current = current.select(
                apply_merge(F.col("sym"), lhs, rhs).alias("sym"), "freq"
            )
            if rank % checkpoint_every == 0:
                # Cut the replace-chain lineage for long training runs
                # (vocabulary-sized frame; cheap relative to a round).
                current = current.localCheckpoint(eager=True)
    finally:
        base.unpersist()
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def merged_symbols(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
) -> DataFrame:
    """(word, freq, sym) after applying an ordered merge list — the
    trained tokenizer's word→subwords map, vocabulary-sized."""
    sym = initial_symbols("word")
    for lhs, rhs in merges:
        sym = apply_merge(sym, lhs, rhs)
    return word_freq(docs, text_col).select(
        "word", "freq", sym.alias("sym")
    )


def bpe_vocab(word_syms: DataFrame) -> DataFrame:
    """``(subword, token_id)`` — dense 0-based ids over the distinct
    subwords of a trained word→subwords map.

    Ids are assigned in lexicographic subword order: a total order both
    engines share bit-for-bit (real tokenizers order by merge rank;
    rank is not reconstructible from the map alone, and id ASSIGNMENT
    is arbitrary as long as it is stable — lexicographic is the
    portable choice). The window is global but the frame is
    vocabulary-sized (~10⁵ rows even at 100 TB), so the single-
    partition sort is metadata-class work, same class as the merge
    table itself."""
    from pyspark.sql import Window

    subs = word_syms.select(
        F.explode(F.split(F.trim("sym"), "  ")).alias("subword")
    ).distinct()
    return subs.withColumn(
        "token_id", F.row_number().over(Window.orderBy("subword")) - 1
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus to TOKEN-ID SEQUENCES:
    ``(id, n_tokens, token_ids)`` with ``token_ids`` the space-joined
    dense vocabulary ids in document order — the actual
    training-data-prep output (bpe_token_counts stops at counts).

    Scale shape: the word→ids map is assembled entirely at VOCABULARY
    scale (subword explode, vocab join, per-word ordered re-agg — all
    ≪ corpus), then the corpus makes ONE pass: posexplode to words,
    broadcast-or-AQE join on word, and one per-doc ordered re-agg. The
    corpus never explodes below word granularity, and the only
    corpus-sized shuffle is the per-doc agg. Docs with no words (empty
    text) are kept with ``n_tokens = 0`` — total output, one row per
    input doc."""
    word_syms = merged_symbols(docs, merges, text_col=text_col)
    vocab = bpe_vocab(word_syms)
    sub_pos = word_syms.select(
        "word",
        F.posexplode(F.split(F.trim("sym"), "  ")).alias("idx", "subword"),
    )
    wmap = (
        sub_pos.join(vocab, "subword")
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "token_id"))),
                    lambda s: s["token_id"].cast("string"),
                ),
            ).alias("ids"),
        )
    )
    words = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias(
            "wpos", "word"
        ),
    ).filter(F.col("word") != "")
    enc = (
        words.join(wmap, "word")
        .groupBy(id_col)
        .agg(
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("wpos", "ids"))),
                    lambda s: s["ids"],
                ),
            ).alias("token_ids"),
        )
    )
    return docs.select(F.col(id_col)).join(enc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce("token_ids", F.lit("")).alias("token_ids"),
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list and report per-doc
    subword counts: (id, n_words, n_bpe_tokens).

    The word→token-count map is vocabulary-sized; the corpus side
    explodes to words and joins on word (AQE broadcasts the map when it
    fits, which it does for any real vocabulary). One corpus-sized
    shuffle (the per-doc sum); the merge chain itself never touches a
    corpus-sized row.
    """
    tok_map = merged_symbols(docs, merges, text_col=text_col).select(
        "word",
        F.size(F.split(F.trim("sym"), "  ")).alias("n_toks"),
    )
    words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.join(tok_map, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").alias("n_bpe_tokens"),
        )
    )
