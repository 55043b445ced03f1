"""Text-analysis functions for LLM-corpus pipelines — all pure Column
expressions (JVM codegen, zero Python in the hot path).

These extend the reference's string accessor surface
(dask/dataframe/accessor.py) with the corpus-prep ops a training-data
pipeline needs: tokenization, language ID, quality scoring,
fingerprinting."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# BPE-ish word/number/punct splitter (GPT-2-style pre-tokenizer shape,
# simplified to RE2-compatible form)
_BPE_RE = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"

_STOPWORDS = [
    "the", "of", "and", "to", "a", "in", "is", "it", "that", "for", "on",
    "was", "with", "as", "at", "by", "be", "this", "are", "or", "an",
]

# tiny per-language character/stopword profiles for the n-gram heuristic
_LANG_MARKERS = {
    "en": ["the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " ist ", " das "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " de ", " que ", " los ", " es "],
}


def word_tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string> (lowercased)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: F.length(t) > 0)


def bpe_tokens(text: Column) -> Column:
    """BPE-ish pre-tokenization via regexp_extract_all."""
    return F.regexp_extract_all(text, F.lit(_BPE_RE), 0)


def token_count(text: Column, kind: str = "whitespace") -> Column:
    if kind == "whitespace":
        return F.size(word_tokens(text))
    return F.size(bpe_tokens(text))


def shingles(text: Column, k: int = 5) -> Column:
    """Character k-shingles of the lowercased, whitespace-normalized
    text → array<string>. JVM-side via sequence+substring transform."""
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    n = F.greatest(F.length(norm) - k + 1, F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: F.substr(norm, i, F.lit(k)))


def quality_score(text: Column) -> Column:
    """Composite heuristic quality in [0,1]: length band, alpha ratio,
    punct ratio, stopword hit-rate, mean word length band. Mirrors
    common corpus-filtering recipes (C4/Gopher rules, public)."""
    toks = word_tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / F.greatest(n_chars, F.lit(1))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", "")) / F.greatest(n_chars, F.lit(1))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS)))
    stop_ratio = stop_hits / F.greatest(n_tok, F.lit(1))
    mean_wl = n_chars / F.greatest(n_tok, F.lit(1))
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), 1.0).otherwise(0.0)
    wl_ok = F.when((mean_wl >= 3) & (mean_wl <= 12), 1.0).otherwise(0.0)
    score = (
        0.25 * len_ok
        + 0.25 * F.least(alpha * 1.25, F.lit(1.0))
        + 0.2 * wl_ok
        + 0.2 * F.least(stop_ratio * 4, F.lit(1.0))
        + 0.1 * (1 - F.least(punct * 10, F.lit(1.0)))
    )
    return F.round(score, 4)


def lang_id(text: Column) -> Column:
    """Marker-n-gram language heuristic over {en,de,fr,es}; 'und'
    (undetermined) when no marker fires. Pure expression — a real
    system would swap in a fastText UDF; the plumbing is identical."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = {
        lang: sum(
            (F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit("")))) / len(m)
            for m in markers
        )
        for lang, markers in _LANG_MARKERS.items()
    }
    best_score = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(scores)):
        out = F.when((best_score > 0) & (scores[lang] == best_score), lang).otherwise(out)
    return out


def fingerprint(text: Column, modulus: int = (1 << 61) - 1) -> Column:
    """Deterministic rolling-hash document fingerprint (polynomial hash
    over character codes, base 257 mod 2^61-1) → hex string. Same idea
    as Rabin fingerprinting used for content-defined chunking."""
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    # split keeps a trailing empty string (Java split limit=-1); drop it
    chars = F.filter(F.split(norm, "(?!^)"), lambda c: F.length(c) > 0)
    h = F.aggregate(
        chars,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, c: (acc * 257 + F.ascii(c)) % F.lit(modulus).cast("decimal(38,0)"),
    )
    return F.lower(F.conv(h.cast("string"), 10, 16))


# PII patterns — deliberately RE2-compatible (no lookaround/backrefs)
# so the SAME pattern runs in Spark (Java regex) and oracle engines.
_PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
]


def scrub_pii(text: Column) -> Column:
    """Redact common PII shapes (emails, IPv4s, SSN-style ids, phone
    numbers) with typed placeholders — the corpus-hygiene step every
    training pipeline runs before publishing data. Pure chained
    regexp_replace: JVM codegen, no Python, trivially map-only at any
    scale. Order matters: emails first so user@host never half-matches
    the phone pattern."""
    out = text
    for kind, pat in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_counts(text: Column) -> Column:
    """Count of each PII shape BEFORE scrubbing, as a map<string,int> —
    feeds audit dashboards / filtering thresholds without a second
    pass."""
    return F.map_from_arrays(
        F.array(*[F.lit(k) for k, _ in _PII_PATTERNS]),
        F.array(
            *[F.size(F.regexp_extract_all(text, F.lit(p), 0))
              for _, p in _PII_PATTERNS]
        ),
    )


def repetition_stats(text: Column) -> Column:
    """Gopher-style in-document repetition signals (public corpus-
    filtering recipe: Rae et al. 2021 §A1.1) as ONE struct column:

    - ``dup_word_frac``     1 - distinct/total tokens
    - ``top_gram``          most frequent word 2-gram (lexicographically
                            first among ties)
    - ``top_gram_count``    its occurrence count
    - ``top_gram_char_frac`` characters covered by that 2-gram / doc chars
    - ``max_token_run``     longest run of identical consecutive tokens

    Scale shape: everything is in-row array expressions — the 2-gram
    mode is a sort + single fold over the sorted grams (O(k log k) per
    doc), NOT an explode + groupBy(doc, gram) shuffle; map-only at any
    corpus size."""
    toks = word_tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    dup_word_frac = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        1.0 - F.array_size(F.array_distinct(toks)) / n_tok
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_tok - 1, F.lit(1))),
        lambda i: F.concat_ws(
            " ", F.try_element_at(toks, i), F.try_element_at(toks, i + 1)
        ),
    )
    # mode of the gram array: sort, then one pass tracking run lengths.
    # Strict `>` keeps the FIRST (= smallest) gram among count ties.
    top = F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"),
            F.lit(0).alias("best"), F.lit("").alias("bestg"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
                acc["best"],
            ).alias("best"),
            F.when(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                > acc["best"],
                x,
            ).otherwise(acc["bestg"]).alias("bestg"),
        ),
    )
    top_char_frac = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        top["best"] * F.length(top["bestg"]) / n_chars
    )
    max_run = F.aggregate(
        toks,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
                acc["best"],
            ).alias("best"),
        ),
    )["best"]
    return F.struct(
        F.round(dup_word_frac, 6).alias("dup_word_frac"),
        top["bestg"].alias("top_gram"),
        top["best"].cast("bigint").alias("top_gram_count"),
        F.round(top_char_frac, 6).alias("top_gram_char_frac"),
        max_run.cast("bigint").alias("max_token_run"),
    )


def chunk_spans(text: Column, max_tokens: int, overlap: int = 0) -> Column:
    """Split a document into overlapping token windows for training-
    example packing: array of structs (chunk_id, chunk_text, n_tokens).
    Stride = max_tokens - overlap; the final partial window is kept.
    All array expressions over an in-row token array — map-only, no
    shuffle, no Python; explode downstream to get one row per chunk."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = word_tokens(text)
    sz = F.size(toks)
    # window starts: 0, stride, 2*stride, ... < max(sz - overlap, 1)
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            (F.greatest(sz - F.lit(overlap + 1), F.lit(0))) / F.lit(stride),
            F.lit(0),
        ).cast("int"),
    )
    return F.transform(
        starts,
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.array_join(
                F.slice(toks, i * stride + 1, max_tokens), " "
            ).alias("chunk_text"),
            F.least(sz - i * stride, F.lit(max_tokens)).alias("n_tokens"),
        ),
    )
