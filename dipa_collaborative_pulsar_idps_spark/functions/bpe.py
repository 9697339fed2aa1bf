"""Real byte-pair-encoding tokenizer: bounded-sample training + distributed
Arrow apply (SURVEY.md §7 Phase 6 text analysis, beyond the regex
`bpeish_token_counts` approximation).

Training is the classic Sennrich/GPT-2 algorithm on a DETERMINISTIC
hash-thinned sample collected to the driver (same ≤-cap pattern as IVF
k-means training, functions/ivf.py — corpus-size-independent); the learned
merge table rides to executors in the UDF closure and encoding streams
through `mapInPandas` with a per-batch word cache (natural-language word
frequency follows Zipf, so the cache hit rate is high and per-row work
collapses to dict lookups for common words).

Not SQL-expressible (iterative greedy merges), so the declared query is
rows-only; the algorithm itself is golden-tested (known merge sequence on
the classic low/lower/lowest corpus, detokenization round-trip, and
distributed ≡ local encoding) in tests/test_dedup.py.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: End-of-word marker glued to a word's final symbol (Sennrich-style), so
#: merges can distinguish word-final units and detokenization is exact.
EOW = "</w>"


def _word_counts(texts: list[str]) -> Counter:
    wc: Counter = Counter()
    for t in texts:
        for w in t.split():
            wc[w] += 1
    return wc


def _symbols(word: str) -> tuple[str, ...]:
    if not word:
        return ()
    chars = list(word)
    chars[-1] += EOW
    return tuple(chars)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    sample_cap: int = 2048,
    id_col: str = "doc_id",
) -> list[tuple[str, str]]:
    """Learn an ordered merge list from a bounded, deterministic corpus
    sample. The sample filter is the same id-hash thinning as IVF
    training: the driver holds ≤ ``sample_cap`` documents no matter the
    corpus size, and the same corpus always yields the same tokenizer.

    Determinism inside training: the argmax pair breaks count ties
    lexicographically, so the merge sequence is a pure function of the
    sample's word counts (no dict-iteration order dependence)."""
    n = df.count()
    if n > sample_cap:
        # hash-thin to ~cap, then TakeOrdered by the same hash: bounded
        # AND independent of partition layout (a bare limit() is not)
        keep = F.pmod(F.xxhash64(id_col), F.lit(n)) < F.lit(sample_cap)
        sample = (
            df.where(keep)
            .select(text_col, F.xxhash64(id_col).alias("__h"))
            .orderBy("__h")
            .limit(sample_cap)
            .select(text_col)
        )
    else:
        sample = df.select(text_col)
    # ≤ sample_cap rows by the filter/limit above (corpus-size-independent,
    # the IVF k-means training pattern):
    texts = [r[0] or "" for r in sample.collect()]  # bounded-collect: ≤ sample_cap
    wc = _word_counts(texts)
    vocab: dict[tuple[str, ...], int] = {_symbols(w): c for w, c in wc.items() if w}

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # max count, lexicographically smallest pair on ties → deterministic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merging of one word (the GPT-2 apply
    loop): repeatedly merge the present pair with the smallest training
    rank until no learned pair remains."""
    syms = list(_symbols(word))
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed apply: (id, tokens array<string>, n_tokens). The merge
    table (a few KB) ships in the closure — broadcast-by-serialization,
    no join; per-batch word→tokens memoization exploits Zipf reuse."""
    ranks = {p: i for i, p in enumerate(merges)}
    out_schema = f"{id_col} long, tokens array<string>, n_tokens int"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, n_col = [], []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in (text or "").split():
                    got = cache.get(w)
                    if got is None:
                        got = encode_word(w, ranks)
                        cache[w] = got
                    toks.extend(got)
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "tokens": toks_col, "n_tokens": n_col}
            )

    return df.select(id_col, text_col).mapInPandas(fn, out_schema)


def detokenize(tokens: list[str]) -> str:
    """Exact inverse of encode over whitespace-pretokenized text."""
    return "".join(t for t in tokens).replace(EOW, " ").rstrip()


def save_bpe(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge table (rank-ordered) as parquet — the tokenizer
    artifact of a 'train once, apply in every job' pipeline (the BPE
    analogue of functions/ivf.save_ivf_index)."""
    from ..localdf import local_rows_df

    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    local_rows_df(spark, rows, "rank int, a string, b string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_bpe(spark, path: str) -> list[tuple[str, str]]:
    """Load a persisted merge table; rank order restored explicitly (a
    parquet read has no implicit order)."""
    rows = spark.read.parquet(path).orderBy("rank").collect()  # bounded-collect: vocab-sized
    return [(r.a, r.b) for r in rows]
