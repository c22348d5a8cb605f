"""Training-corpus quality heuristics (Gopher / C4 rule families).

Beyond-reference surface: the reference engine (pauloangelo/hogzilla) has
no document corpus at all — these operators exist because a 100 TB
training-data pipeline needs rule-based quality filtering before any
model-based scoring.  The rule set follows the public Gopher paper
(Rae et al. 2021, "Scaling Language Models", App. A1.1) and C4
(Raffel et al. 2020 §2.2): word-count bounds, mean-word-length bounds,
symbol-to-word ratio, bullet/ellipsis line fractions, alphabetic-word
fraction, stopword presence, duplicate-line fractions, and
top-bigram character coverage.

Scale design: EVERY signal — including the duplicate-line and
top-bigram statistics — is computed as a pure Column expression over
per-document arrays (sort_array + F.aggregate scan), so the operator
is a narrow map with ZERO shuffles: no explode, no groupBy, no join.
Per-row cost is O(L log L) in the number of lines/tokens of one
document, independent of corpus size; at 100 TB the plan is a single
WholeStageCodegen-adjacent projection pipelined into the parquet scan.
The DuckDB oracle computes the same signals relationally
(unnest -> group) to keep the two derivations independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

# Gopher App. A1.1 requires >= 2 distinct hits from this stopword set.
GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]

BULLET_CHARS = ["-", "*", "•"]  # '-', '*', '•'

# Gopher thresholds (public paper values).
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_ATL, MAX_ATL = 3.0, 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MAX_BULLET_FRAC = 0.90
MAX_ELLIPSIS_FRAC = 0.30
MIN_ALPHA_WORD_FRAC = 0.80
MIN_STOP_DISTINCT = 2
MAX_DUP_LINE_FRAC = 0.30
MAX_DUP_LINE_CHAR_FRAC = 0.20
MAX_TOP2GRAM_CHAR_FRAC = 0.20


def _lines(text: Column) -> Column:
    """Non-empty trimmed lines of the document."""
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def _count_occurrences(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via replace-length delta."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def _dup_line_chars(sorted_lines: Column) -> Column:
    """Characters inside duplicated lines (all occurrences counted).

    One fold over the sorted line array: when the current line equals the
    previous one, its characters are duplicate characters — and if the
    previous occurrence had not itself been flagged (run length was 1 so
    far), its characters join the total too.
    """
    return F.aggregate(
        sorted_lines,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(False).alias("prev_dup"),
            F.lit(0).cast("long").alias("dup"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            (x == acc["prev"]).alias("prev_dup"),
            (
                acc["dup"]
                + F.when(
                    x == acc["prev"],
                    F.length(x).cast("long")
                    + F.when(acc["prev_dup"], F.lit(0).cast("long")).otherwise(
                        F.length(acc["prev"]).cast("long")
                    ),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("dup"),
        ),
        lambda acc: acc["dup"],
    )


def _top_run(sorted_arr: Column) -> Column:
    """(element, count) of the most frequent element of a sorted array.

    Strict `>` keeps the first maximal run in sorted order, i.e. the
    lexicographically smallest element on ties — the oracle mirrors this
    with ORDER BY cnt DESC, element ASC.
    """
    return F.aggregate(
        sorted_arr,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best_cnt"),
            F.lit("").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                > acc["best_cnt"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            )
            .otherwise(acc["best_cnt"])
            .alias("best_cnt"),
            F.when(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                > acc["best_cnt"],
                x,
            )
            .otherwise(acc["best"])
            .alias("best"),
        ),
        lambda acc: F.struct(acc["best"].alias("best"), acc["best_cnt"].alias("cnt")),
    )


def doc_quality_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Gopher/C4 quality signals + the combined pass flag.

    Returns `id_col` plus:
      n_tok, n_lines            — token / non-empty-line counts
      symbol_word_ratio         — ('#' + '...' + '…' occurrences) / n_tok
      alpha_word_frac           — tokens containing a letter / n_tok
      stop_distinct             — distinct GOPHER_STOPS present
      bullet_frac               — lines starting with -, *, • / n_lines
      ellipsis_frac             — lines ending with ... or … / n_lines
      dup_line_frac             — 1 - distinct_lines / n_lines
      dup_line_char_frac        — chars in duplicated lines / line chars
      top_bigram                — most frequent token bigram (ties: smallest)
      top2gram_char_frac        — bigram_count * len(bigram) / text chars
      gopher_pass               — conjunction of all Gopher thresholds

    All fractions are 0.0 for empty documents and rounded to 6 places.
    """
    text = F.col(text_col)
    tok = tokens(text)
    n_tok = F.size(tok)
    lines = _lines(text)
    n_lines = F.size(lines)
    nz_tok = n_tok > 0
    nz_lines = n_lines > 0

    symbols = (
        _count_occurrences(text, "#")
        + _count_occurrences(text, "...")
        + _count_occurrences(text, "…")
    )
    symbol_word_ratio = F.when(
        nz_tok, symbols.cast("double") / n_tok
    ).otherwise(F.lit(0.0))

    alpha_words = F.size(F.filter(tok, lambda t: t.rlike("[A-Za-z]")))
    alpha_word_frac = F.when(
        nz_tok, alpha_words.cast("double") / n_tok
    ).otherwise(F.lit(0.0))

    tok_lower = F.transform(tok, lambda t: F.lower(t))
    stop_distinct = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPS]),
            lambda s: F.array_contains(tok_lower, s),
        )
    )

    first_char = lambda l: F.substring(l, 1, 1)  # noqa: E731
    bullet_set = F.array(*[F.lit(c) for c in BULLET_CHARS])
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.array_contains(bullet_set, first_char(l)))
    )
    bullet_frac = F.when(
        nz_lines, bullet_lines.cast("double") / n_lines
    ).otherwise(F.lit(0.0))

    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda l: l.endswith("...") | l.endswith("…"),
        )
    )
    ellipsis_frac = F.when(
        nz_lines, ellipsis_lines.cast("double") / n_lines
    ).otherwise(F.lit(0.0))

    sorted_lines = F.sort_array(lines)
    distinct_lines = F.size(F.array_distinct(lines))
    dup_line_frac = F.when(
        nz_lines, F.lit(1.0) - distinct_lines.cast("double") / n_lines
    ).otherwise(F.lit(0.0))
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, l: a + F.length(l).cast("long")
    )
    dup_line_char_frac = F.when(
        line_chars > 0, _dup_line_chars(sorted_lines).cast("double") / line_chars
    ).otherwise(F.lit(0.0))

    # Token bigrams "a b"; coverage denominator is the character length of
    # the whitespace-normalized text: sum(len(tok)) + (n_tok - 1).
    # Guarded: sequence(1, n-1) with n < 2 would auto-descend (step -1)
    # into invalid 0/negative array indices.
    bigrams = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tok - 1),
            lambda i: F.concat(
                F.element_at(tok, i), F.lit(" "), F.element_at(tok, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top = _top_run(F.sort_array(bigrams))
    tok_chars = F.aggregate(
        tok, F.lit(0).cast("long"), lambda a, t: a + F.length(t).cast("long")
    )
    norm_chars = tok_chars + (n_tok - 1)
    top_bigram = F.when(n_tok >= 2, top["best"]).otherwise(F.lit(None).cast("string"))
    top2gram_char_frac = F.when(
        n_tok >= 2,
        (top["cnt"] * F.length(top["best"])).cast("double") / norm_chars,
    ).otherwise(F.lit(0.0))

    atl = F.when(nz_tok, tok_chars.cast("double") / n_tok).otherwise(F.lit(0.0))

    sig = {
        "n_tok": n_tok,
        "n_lines": n_lines,
        "symbol_word_ratio": F.round(symbol_word_ratio, 6),
        "alpha_word_frac": F.round(alpha_word_frac, 6),
        "stop_distinct": stop_distinct,
        "bullet_frac": F.round(bullet_frac, 6),
        "ellipsis_frac": F.round(ellipsis_frac, 6),
        "dup_line_frac": F.round(dup_line_frac, 6),
        "dup_line_char_frac": F.round(dup_line_char_frac, 6),
        "top_bigram": top_bigram,
        "top2gram_char_frac": F.round(top2gram_char_frac, 6),
    }
    gopher_pass = (
        (n_tok >= MIN_WORDS)
        & (n_tok <= MAX_WORDS)
        & (atl >= MIN_ATL)
        & (atl <= MAX_ATL)
        & (symbol_word_ratio < MAX_SYMBOL_WORD_RATIO)
        & (bullet_frac < MAX_BULLET_FRAC)
        & (ellipsis_frac < MAX_ELLIPSIS_FRAC)
        & (alpha_word_frac > MIN_ALPHA_WORD_FRAC)
        & (stop_distinct >= MIN_STOP_DISTINCT)
        & (dup_line_frac < MAX_DUP_LINE_FRAC)
        & (dup_line_char_frac < MAX_DUP_LINE_CHAR_FRAC)
        & (top2gram_char_frac < MAX_TOP2GRAM_CHAR_FRAC)
    )
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in sig.items()],
        gopher_pass.alias("gopher_pass"),
    )
