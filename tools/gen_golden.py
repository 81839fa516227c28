#!/usr/bin/env python3
"""Generate reference-Python golden fixtures for the GoldenSpec.

Runs the ACTUAL reference implementation (/root/reference, read-only)
over the sf0.001 documents corpus and freezes the outputs as CSVs in
src/test/resources/golden/. GoldenSpec then asserts the Spark operators
reproduce these values — closing the self-oracle loophole where both
the Spark plan and the DuckDB oracle SQL are generated from the same
Scala constants (a transcription error of reference semantics would
otherwise pass both sides).

Responses are ordered by doc_id within each source — the same order the
Spark operators use for insertion-order-sensitive semantics (dli bigram
top-100 tie-breaks).

Usage: python3 tools/gen_golden.py [sf_dir] [out_dir]
"""
import math
import sys
from collections import defaultdict

sys.path.insert(0, "/root/reference/src")
from modelaudit.methods.llmmap import (  # noqa: E402
    _compute_fingerprint_vector,
    _cosine_similarity,
    _extract_response_features,
)
from modelaudit.methods.dli import (  # noqa: E402
    _compute_behavior_similarity,
    _extract_behavior_signature,
    _js_divergence,
)
from modelaudit.methods.style import _compute_style_scores  # noqa: E402

import duckdb  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/golden"

NUMERIC = ["length_chars", "length_words", "length_sentences", "avg_word_length",
           "avg_sentence_length", "unique_word_ratio", "punctuation_ratio", "newline_ratio"]
BOOLS = ["has_bullet_points", "has_numbered_list", "has_markdown_headers",
         "has_code_blocks", "starts_with_refusal"]
STYLE_CATS = ["apologetic", "helpful", "hedging", "structured", "ai_aware"]
DLI_FEATS = ["refusal_rate", "avg_length", "vocab_diversity", "markdown_rate",
             "list_rate", "code_block_rate", "hedging_rate", "certainty_rate"]


def fmt(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def write_csv(name, header, rows):
    path = f"{OUT}/{name}.csv"
    with open(path, "w") as f:
        f.write(",".join(header) + "\n")
        for r in rows:
            f.write(",".join(fmt(v) for v in r) + "\n")
    print(f"wrote {path}: {len(rows)} rows")


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    docs = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    print(f"{len(docs)} documents from {SF_DIR}")

    # ── per-doc llmmap features ──
    feats = {}
    by_source = defaultdict(list)
    for doc_id, source, text in docs:
        f = _extract_response_features(text)
        feats[doc_id] = f
        by_source[source].append(f)
    rows = []
    for doc_id, _, _ in docs:
        f = feats[doc_id]
        rows.append([doc_id] + [f[k] for k in NUMERIC] + [f[k] for k in BOOLS]
                    + [f["marker_scores"][c] for c in STYLE_CATS])
    write_csv("features",
              ["doc_id"] + NUMERIC + BOOLS + [f"style_{c}" for c in STYLE_CATS], rows)

    # ── per-model fingerprint vectors + pairwise compare ──
    sources = sorted(by_source)
    fps = {s: _compute_fingerprint_vector(by_source[s]) for s in sources}
    fp_keys = [f"avg_{k}" for k in NUMERIC] + [f"ratio_{k}" for k in BOOLS] \
        + [f"style_{c}" for c in STYLE_CATS]
    write_csv("fingerprint", ["source"] + fp_keys,
              [[s] + [fps[s][k] for k in fp_keys] for s in sources])
    rows = []
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            sim = _cosine_similarity(fps[a], fps[b])
            rows.append([a, b, sim, sim >= 0.85, min(abs(sim - 0.85) / 0.15, 1.0)])
    write_csv("fp_compare", ["model_a", "model_b", "similarity", "is_derived", "confidence"], rows)

    # ── DLI behavior signatures + pairwise compare ──
    texts_by_source = defaultdict(list)
    for _, source, text in docs:  # docs already in doc_id order
        texts_by_source[source].append(text)
    sigs = {s: _extract_behavior_signature(texts_by_source[s]) for s in sources}
    write_csv("dli_signature", ["source"] + DLI_FEATS,
              [[s] + [sigs[s]["features"][k] for k in DLI_FEATS] for s in sources])
    rows = []
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            sa, sb = sigs[a], sigs[b]
            js = _js_divergence(sa["bigram_dist"], sb["bigram_dist"])
            bigram_sim = 1.0 - min(js / math.log(2), 1.0)
            fa, fb = sa["features"], sb["features"]
            dot = sum(fa[k] * fb[k] for k in DLI_FEATS)
            na = math.sqrt(sum(fa[k] ** 2 for k in DLI_FEATS))
            nb = math.sqrt(sum(fb[k] ** 2 for k in DLI_FEATS))
            feat_cos = 0.0 if na == 0 or nb == 0 else dot / (na * nb)
            sim = _compute_behavior_similarity(sa, sb)
            rows.append([a, b, js, bigram_sim, feat_cos, sim])
    write_csv("dli_compare",
              ["model_a", "model_b", "js_divergence", "bigram_sim", "feature_cos", "similarity"],
              rows)

    # ── reference benchmark: per-sample detection over its OWN texts ──
    # (verifies the sample texts ported into BenchmarkEval.scala
    # byte-for-byte: any divergence changes the scores)
    from modelaudit.benchmark import BENCHMARK_SAMPLES
    rows = []
    for i, sample in enumerate(BENCHMARK_SAMPLES):
        scores = _compute_style_scores(sample.text)
        predicted = max(scores, key=lambda k: scores[k])
        rows.append([i, sample.label, predicted, scores[predicted],
                     predicted == sample.label])
    write_csv("benchmark_detect",
              ["sample_id", "label", "predicted_model", "confidence", "correct"], rows)

    # ── per-doc per-family style scores ──
    rows = []
    for doc_id, _, text in docs:
        scores = _compute_style_scores(text)
        for fam, score in scores.items():
            rows.append([doc_id, fam, score])
    write_csv("style_scores", ["doc_id", "family", "score"], rows)


if __name__ == "__main__":
    main()
