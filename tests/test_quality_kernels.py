"""r13 kernel-optimization guards (VERDICT r12 task 3).

doc_quality_signals_kernel (the Arrow twin the corpus pipeline runs)
must be row-identical — every round-6 float, the top-bigram tie-break,
the pass flag — to the doc_quality_signals expression battery, on real
corpus data AND on adversarial boundary documents.

dup_ngram_char_fractions keeps its r12 dict-loop implementation (two
vectorized rewrites measured SLOWER at sf10 — negative result recorded
in the operator docstring and OPTIMIZATION_r13.md); the reference-copy
tests below still pin the loop against an independent verbatim copy so
any future rewrite inherits the same row-identity gate."""

import numpy as np
import pandas as pd
import pytest

from hogzilla_spark.operators.quality import (
    DUP_NGRAM_MAX_FRAC,
    dup_ngram_char_fractions,
)

NS = (5, 6, 7, 8, 9, 10)

def _reference_rows(texts, ns=NS):
    """The r12 implementation, verbatim (dict-of-tuples per doc)."""
    cols = [f"dup_{n}gram_char_frac" for n in ns]
    rows = []
    for text in texts:
        toks = (text or "").split()
        lens = [len(t) for t in toks]
        total = sum(lens)
        out = {}
        ok = True
        for n, c in zip(ns, cols):
            if total == 0 or len(toks) < n:
                out[c] = 0.0
                continue
            seen = {}
            grams = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            for g in grams:
                seen[g] = seen.get(g, 0) + 1
            covered = [False] * len(toks)
            for i, g in enumerate(grams):
                if seen[g] > 1:
                    for j in range(i, i + n):
                        covered[j] = True
            frac = round(
                sum(l for l, cov in zip(lens, covered) if cov) / total, 6
            )
            out[c] = frac
            if frac >= DUP_NGRAM_MAX_FRAC.get(n, 1.0):
                ok = False
        out["repetition_pass"] = ok
        rows.append(out)
    return rows

ADVERSARIAL = [
    "",                                     # empty
    "one",                                  # below every n
    "a b c d e",                            # exactly n=5, no dups
    "a b c d e a b c d e",                  # one duplicated 5-gram
    " ".join(["x"] * 40),                   # everything duplicated at every n
    " ".join(["w1 w2 w3 w4 w5 w6"] * 3),    # overlapping dup windows
    "tab\tsep\nand\x0bodd\fwhitespace " * 6,  # split() whitespace classes
    " ".join(f"t{i}" for i in range(30)) + " " + " ".join(f"t{i}" for i in range(30)),
    "α β γ δ ε α β γ δ ε",                  # non-ASCII tokens, len in chars
    ("aa bb " * 8) + "unique tail words here now",  # tie-prone small ratios
]

def _assert_match(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in dup_ngram_char_fractions(df).collect()
    }
    want = _reference_rows(texts)
    assert len(got) == len(texts)
    for i, exp in enumerate(want):
        g = got[i]
        for k, v in exp.items():
            assert g[k] == v, (i, k, g[k], v, texts[i][:60])

def test_dup_ngram_vectorized_matches_loop_adversarial(spark):
    _assert_match(spark, ADVERSARIAL)

def test_dup_ngram_vectorized_matches_loop_corpus(spark):
    texts = [
        r.text
        for r in spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("text")
        .collect()
    ]
    _assert_match(spark, texts)

# ---------------------------------------------------------------------------
# doc_quality_signals_kernel — the Arrow twin of the expression battery
# ---------------------------------------------------------------------------

QUALITY_ADVERSARIAL = ADVERSARIAL + [
    "word " * 60 + "\n\n" + "word " * 60,          # dup paragraphs
    "line a\nline a\nline a\nline b\n\nline a",     # dup lines + para
    "  \t spaced\tout\x0btokens\r\nwith\fodd\nws ",  # Java-\s boundary
    " nbsp is NOT Java whitespace ",      # unicode ws stays in tokens
    "ends with ellipsis...\nand … unicode…\n- bullet\n* star\n• dot",
    "# sym ### more...and…mixed #",
    "THE The the BE be TO to OF AND THAT HAVE WITH",  # stopword casing
    "😀 astral 😀 astral chars count as one",        # code-point lengths
    "a\n\n\n\nb\n \nc",                             # empty-ish paragraphs
    ("x y " * 30).strip(),                          # top-bigram saturation
    "Z " + "q " * 49,                               # exactly 50 tokens
    ("tie tie four four " * 16).strip(),            # round-6 tie-prone ratios
]

def _expr_rows(spark, texts):
    from hogzilla_spark.operators.quality import doc_quality_signals

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r.asDict() for r in doc_quality_signals(df).collect()}

def _kernel_rows(spark, texts):
    from hogzilla_spark.operators.quality import doc_quality_signals_kernel

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r.asDict()
        for r in doc_quality_signals_kernel(df).collect()
    }

def _assert_quality_match(spark, texts):
    expr = _expr_rows(spark, texts)
    kern = _kernel_rows(spark, texts)
    assert set(expr) == set(kern)
    for i in expr:
        for k, v in expr[i].items():
            assert kern[i][k] == v, (i, k, kern[i][k], v, texts[i][:60])

def test_doc_quality_kernel_matches_expression_adversarial(spark):
    """The planted cross-engine boundary test (VERDICT r12 task 3): the
    Arrow kernel must reproduce the expression battery bit-exactly on
    documents built to probe every divergence class — Java-vs-Python
    whitespace classes, trim-space-only lines, unicode/astral lengths,
    sort-order ties, round-6 half-prone ratios, stopword casing."""
    _assert_quality_match(spark, QUALITY_ADVERSARIAL)

def test_doc_quality_kernel_matches_expression_corpus(spark):
    texts = [
        r.text
        for r in spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("text")
        .collect()
    ]
    _assert_quality_match(spark, texts)
