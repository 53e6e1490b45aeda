"""Catalog entries for distributed BPE tokenizer training
(operators/bpe.py) — merge-rule learning and corpus tokenization, each
hash-certified against an UNROLLED DuckDB twin (the same certification
pattern as the unrolled-kmeans IVF oracle in vector_queries.py).

The oracle unrolls K merge rounds as CTE stages: each stage picks the
max-count adjacent pair (count DESC, pair ASC — the exact tie-break the
Spark argmax uses) and applies it with the same literal double-space
string replace. Both engines inherit left-to-right non-overlapping
replace semantics, which IS the greedy BPE merge scan (property-tested
against a per-symbol fold reference in tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import bpe
from ..sources.registry import load_table

#: Rounds certified by the unrolled oracle. 8 keeps the twin readable
#: while covering the interesting regime (later rounds merge MERGED
#: symbols, exercising multi-char lhs/rhs in the replace pattern).
N_MERGES = 8


def _unrolled_chain(k: int) -> str:
    """WITH-clause body: w0 (char symbols per word) then k pick+apply
    stages. w{i} carries (word, sym, freq) so the final stage doubles
    as the trained word→subwords map."""
    stages = [
        """w0 AS (
  SELECT word,
         ' ' || array_to_string([word[i] for i in range(1, len(word)+1)], '  ')
             || ' ' AS sym,
         freq
  FROM (
    SELECT word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> '' GROUP BY word
  )
)"""
    ]
    for i in range(1, k + 1):
        stages.append(
            f"""p{i} AS (
  SELECT string_split(pair, ' ')[1] AS lhs,
         string_split(pair, ' ')[2] AS rhs,
         cnt AS pair_count
  FROM (
    SELECT pair, SUM(freq) AS cnt
    FROM (
      SELECT unnest([ts[i] || ' ' || ts[i+1]
                     for i in range(1, greatest(len(ts), 1))]) AS pair, freq
      FROM (SELECT string_split(trim(sym), '  ') AS ts, freq FROM w{i-1})
    ) GROUP BY pair
  ) ORDER BY cnt DESC, pair ASC LIMIT 1
),
w{i} AS (
  SELECT word,
         replace(sym, ' ' || lhs || '  ' || rhs || ' ',
                      ' ' || lhs || rhs || ' ') AS sym,
         freq
  FROM w{i-1} CROSS JOIN p{i}
)"""
        )
    return ",\n".join(stages)


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First N_MERGES BPE merge rules learned over the documents corpus.

    One corpus pass (word count), then vocabulary-sized rounds; the
    only driver traffic is one LIMIT-1 row per round.
    """
    docs = load_table(spark, sf_dir, "documents")
    return bpe.bpe_train(docs, num_merges=N_MERGES, strict=False).orderBy(
        "merge_rank"
    )


BPE_TRAIN_SQL = (
    "WITH "
    + _unrolled_chain(N_MERGES)
    + "\n"
    + "\nUNION ALL ".join(
        f"SELECT {i} AS merge_rank, lhs, rhs, lhs || rhs AS merged, "
        f"pair_count::BIGINT AS pair_count FROM p{i}"
        for i in range(1, N_MERGES + 1)
    )
    + "\nORDER BY merge_rank"
)


def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc subword counts under the trained N_MERGES-rule tokenizer:
    (doc_id, n_words, n_bpe_tokens).

    The merge table is collected once (N_MERGES metadata rows) and
    re-applied lazily; the word→token-count map is vocabulary-sized and
    joins the exploded corpus on word (AQE broadcasts it when it fits).
    """
    docs = load_table(spark, sf_dir, "documents")
    learned = bpe.bpe_train(docs, num_merges=N_MERGES, strict=False).collect()
    merges = [(r["lhs"], r["rhs"]) for r in sorted(learned, key=lambda r: r["merge_rank"])]
    return bpe.bpe_token_counts(docs, merges).orderBy("doc_id")


BPE_TOKENIZE_SQL = (
    "WITH "
    + _unrolled_chain(N_MERGES)
    + f"""
SELECT doc_id,
       COUNT(*)::BIGINT AS n_words,
       SUM(len(string_split(trim(sym), '  ')))::BIGINT AS n_bpe_tokens
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
) words
JOIN w{N_MERGES} USING (word)
WHERE word <> ''
GROUP BY doc_id
ORDER BY doc_id
"""
)


def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-ID sequences under the trained N_MERGES-rule tokenizer:
    (doc_id, n_tokens, token_ids) — token_ids space-joined dense vocab
    ids in document order, '' for wordless docs (total output). The
    word→ids map is vocabulary-sized; the corpus makes one pass
    (operators/bpe.py::bpe_encode)."""
    docs = load_table(spark, sf_dir, "documents")
    learned = bpe.bpe_train(docs, num_merges=N_MERGES, strict=False).collect()
    merges = [
        (r["lhs"], r["rhs"])
        for r in sorted(learned, key=lambda r: r["merge_rank"])
    ]
    return bpe.bpe_encode(docs, merges).orderBy("doc_id")


BPE_ENCODE_SQL = (
    "WITH "
    + _unrolled_chain(N_MERGES)
    + f""",
vocab AS (
  SELECT subword, ROW_NUMBER() OVER (ORDER BY subword) - 1 AS token_id
  FROM (
    SELECT DISTINCT unnest(string_split(trim(sym), '  ')) AS subword
    FROM w{N_MERGES}
  )
),
wm AS (
  SELECT word, COUNT(*) AS n_toks,
         string_agg(token_id::VARCHAR, ' ' ORDER BY idx) AS ids
  FROM (
    SELECT word, (u).idx AS idx, (u).sub AS subword
    FROM (
      SELECT word,
             unnest([{{'idx': i, 'sub': ts[i]}}
                     for i in range(1, len(ts) + 1)]) AS u
      FROM (SELECT word, string_split(trim(sym), '  ') AS ts FROM w{N_MERGES})
    )
  ) JOIN vocab USING (subword)
  GROUP BY word
),
wp AS (
  SELECT doc_id, (u).wpos AS wpos, (u).word AS word
  FROM (
    SELECT doc_id,
           unnest([{{'wpos': i, 'word': ws[i]}}
                   for i in range(1, len(ws) + 1)]) AS u
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
  )
  WHERE (u).word <> ''
),
enc AS (
  SELECT doc_id, SUM(n_toks)::BIGINT AS n_tokens,
         string_agg(ids, ' ' ORDER BY wpos) AS token_ids
  FROM wp JOIN wm USING (word) GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(enc.n_tokens, 0)::BIGINT AS n_tokens,
       COALESCE(enc.token_ids, '') AS token_ids
FROM documents d LEFT JOIN enc USING (doc_id)
ORDER BY d.doc_id
"""
)


def register_entries(register) -> None:  # noqa: ANN001
    register("bpe_train_merges", bpe_train_merges, BPE_TRAIN_SQL)
    register("bpe_token_counts", bpe_token_counts, BPE_TOKENIZE_SQL)
    register("bpe_encode_corpus", bpe_encode_corpus, BPE_ENCODE_SQL)
