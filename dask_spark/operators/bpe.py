"""BPE tokenizer-vocabulary induction — the pair-counting/merge loop
of Sennrich et al. 2016 ("Neural Machine Translation of Rare Words
with Subword Units", ACL — public), run Spark-first over the corpus.

Reference scope: dask has no tokenizer-training operator; this is the
brief's "BPE-ish" token family taken to its training step (the
counting side of what functions/text.py bpe_tokens consumes).

The classic algorithm works on the WORD-TYPE table, not the raw
stream: one corpus-wide wordcount (the only corpus-sized exchange),
then every merge iteration runs over distinct words weighted by
frequency — at 100 TB the type table is millions of rows against
trillions of tokens, a ~1e6x reduction before the loop even starts.

Per iteration:
- symbols: each word as its character array + a '</w>' end-of-word
  marker, with all merges so far applied;
- pair counts: adjacent symbol pairs built IN-ROW (zip_with of two
  slices — no token exchange), one map-side-combined groupBy(pair)
  weighted by word frequency;
- top pair: TakeOrdered(1) by (count desc, pair asc) — never a full
  sort;
- the merge list is DRIVER state (like kmeans centroids): each
  iteration re-derives symbols from the base word column by applying
  the merges-so-far in one Arrow kernel pass, so iterations are
  independent jobs with no lineage growth (the label-propagation OOM
  lesson) and nothing to checkpoint. n_merges passes over the type
  table is the price; real tokenizer trainers pay the same shape.

Iteration 1 (pure JVM expressions end to end) is value-checked by the
DuckDB oracle [q:text_bpe_pairs]; the full merge loop is pinned by a
literal python replay in tests and registered rows-only
[q:text_bpe_merges] — the greedy left-to-right merge application is
not expressible in ANSI SQL."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column

from dask_spark.frame import DaskFrame
from dask_spark.functions.text import word_tokens

END = "</w>"


def _char_symbols(word: Column) -> Column:
    """word -> array<string> of its characters + the end-of-word
    marker (pure codegen: sequence + substr, mirrored by the oracle's
    list comprehension)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substr(word, i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END)))


def _adjacent_pairs(sym: Column) -> Column:
    """array<string> of 'a b' adjacent symbol pairs — in-row zip of
    two slices, no explode until the count groupBy."""
    n = F.size(sym)
    return F.zip_with(
        F.slice(sym, F.lit(1), n - 1),
        F.slice(sym, F.lit(2), n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def word_type_counts(frame, text_col: str = "text"):
    """The corpus-wide wordcount — the ONE corpus-sized exchange the
    whole training loop runs on. Returns DaskFrame(word, freq)."""
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    wc = (
        sdf.select(F.explode(word_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    return DaskFrame(wc)


def apply_merges(syms: list[str], merges) -> list[str]:
    """Greedy left-to-right application of the merge list in rank
    order — the conventional BPE trainer update (each merge replaces
    all non-overlapping occurrences before the next rank applies).
    Shared by the executor kernel and the test replay."""
    for a, b in merges:
        out = []
        i = 0
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _merged_symbols_kernel(merges):
    """mapInPandas kernel: (word, freq) -> (freq, sym) with the
    merges-so-far applied. merges ride as closure literals (driver
    state, like kmeans centroids)."""
    import pandas as pd

    M = [tuple(m) for m in merges]

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            sym = [
                apply_merges(list(w) + [END], M) for w in pdf["word"]
            ]
            yield pd.DataFrame({"freq": pdf["freq"], "sym": sym})

    return kernel


def pair_stats(frame, text_col: str = "text", top: int = 20,
               merges=None, wc=None):
    """Weighted adjacent-pair counts over the word-type table with
    ``merges`` applied (none = iteration 1, pure JVM end to end).
    Returns DaskFrame(pair, cnt) TakeOrdered(top) by (cnt desc,
    pair)."""
    if wc is None:
        wc = word_type_counts(frame, text_col)
    sdf = wc._sdf if isinstance(wc, DaskFrame) else wc
    if merges:
        sym = sdf.mapInPandas(
            _merged_symbols_kernel(merges),
            schema="freq bigint, sym array<string>",
        )
    else:
        sym = sdf.select(
            "freq", _char_symbols(F.col("word")).alias("sym")
        )
    pairs = sym.select(
        "freq", F.explode(_adjacent_pairs(F.col("sym"))).alias("pair")
    )
    out = (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(top)
    )
    return DaskFrame(out)


def bpe_learn(frame, text_col: str = "text", n_merges: int = 8,
              min_freq: int = 2):
    """Learn ``n_merges`` BPE merges -> list of (rank, left, right,
    freq). Stops early when the best pair's weighted count drops
    below ``min_freq``. Deterministic: ties break on the pair string;
    every iteration is an independent job over the persisted
    word-type table."""
    wc = word_type_counts(frame, text_col)
    wc_sdf = wc._sdf.persist()
    try:
        merges: list[tuple[str, str]] = []
        out = []
        for rank in range(n_merges):
            top = (
                pair_stats(frame, text_col, top=1, merges=merges, wc=wc_sdf)
                .to_spark()
                .collect()
            )
            if not top or top[0]["cnt"] < min_freq:
                break
            a, b = top[0]["pair"].split(" ", 1)
            merges.append((a, b))
            out.append((rank, a, b, int(top[0]["cnt"])))
        return out
    finally:
        wc_sdf.unpersist()


def bpe_encode(frame, merges, text_col: str = "text",
               id_col: str = "doc_id"):
    """Apply a learned merge list to every document → DaskFrame(id,
    tokens array<string>, n_tokens) — the ENCODE half of the
    tokenizer pair (bpe_learn trains, this applies; together they
    close the loop a corpus pipeline needs before token-budget
    accounting).

    ``merges`` accepts bpe_learn's (rank, left, right, freq) rows or
    bare (left, right) pairs.

    100 TB shape: map-only, zero shuffle — the merge table rides as
    closure literals (driver state, a few KB), and a per-task
    WORD-TYPE memo collapses the greedy merge cost from tokens to
    distinct words (Zipf: the memo hit rate approaches 1 on web
    text), the same type-table economics the trainer uses. Greedy
    left-to-right application is not ANSI-SQL-expressible, so the
    registered query is rows-only; exact token output is pinned by
    the literal python replay in tests."""
    import pandas as pd

    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    M = [
        (m[1], m[2]) if len(m) == 4 else (m[0], m[1])
        for m in (tuple(m) for m in merges)
    ]

    # ASCII-whitespace split matching the JVM \s+ regex that word
    # tokenization (and therefore bpe_learn's training vocabulary)
    # uses — python str.split also breaks on NBSP/U+2028 etc., which
    # would produce word types the merge table never saw.
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def kernel(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            toks_out, counts = [], []
            for txt in pdf[text_col]:
                enc: list[str] = []
                words = (
                    [] if txt is None or (isinstance(txt, float) and txt != txt)
                    else [w for w in ws.split(str(txt).lower()) if w]
                )
                for w in words:
                    e = memo.get(w)
                    if e is None:
                        e = apply_merges(list(w) + [END], M)
                        memo[w] = e
                    enc.extend(e)
                toks_out.append(enc)
                counts.append(len(enc))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "tokens": toks_out,
                "n_tokens": counts,
            })

    return DaskFrame(
        sdf.select(id_col, text_col).mapInPandas(
            kernel,
            schema=f"{id_col} bigint, tokens array<string>, n_tokens int",
        )
    )
