#!/usr/bin/env python3
"""Generate multilingual golden fixtures for UnicodeGoldenSpec.

The sf corpora are pure ASCII, so the ASCII-vs-Unicode word-tokenizer
divergence (Python re \\w is Unicode, Java/RE2 \\w is ASCII) is
invisible to the main GoldenSpec. This tool runs the ACTUAL reference
dli implementation over a small fixed multilingual corpus (CJK,
accented Latin, Greek, mixed-script) and freezes:

  - unicode_corpus.tsv     doc_id \\t source \\t text
  - unicode_dli_signature.csv  per-source behavior features
  - unicode_dli_bigrams.csv    per-source bigram_dist in most_common
                               order (rank, bigram, p)

UnicodeGoldenSpec loads the corpus from the TSV (byte-identical input)
and asserts Audit.dliSigOf / Audit.dliBigramsOf reproduce the
reference values with the [\\p{L}\\p{N}_]+ tokenizer.

Usage: python3 tools/gen_golden_unicode.py [out_dir]
"""
import sys

sys.path.insert(0, "/root/reference/src")
from modelaudit.methods.dli import _extract_behavior_signature  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/golden"

DLI_FEATS = ["refusal_rate", "avg_length", "vocab_diversity", "markdown_rate",
             "list_rate", "code_block_rate", "hedging_rate", "certainty_rate"]

# No tabs/newlines/commas (TSV + bare-CSV constraints). Deliberately
# exercises: space-separated CJK tokens, an unsegmented CJK run (one
# \w+ token), accented Latin, Greek with case folding, Unicode digits
# next to ASCII digits, apostrophes/dashes splitting words, and a
# Chinese hedging marker ("可能" appears in the reference dli marker
# lists) so marker rates interact with Unicode word totals.
CORPUS = [
    (0, "src_zh", "你好 世界 你好 世界 机器 学习 模型蒸馏审计报告"),
    (1, "src_zh", "这 可能 是 一个 测试 这 可能 是"),
    (2, "src_zh", "café résumé naïve café 123 ４５６"),
    (3, "src_mix", "深度 学习 模型 深度 学习 definitely certain"),
    (4, "src_mix", "I'm sure — it's definitely 确定 的"),
    (5, "src_mix", "Ω φυσική λόγος Ω φυσική test_var 42"),
]


def fmt(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main():
    import os
    os.makedirs(OUT, exist_ok=True)

    with open(f"{OUT}/unicode_corpus.tsv", "w", encoding="utf-8") as f:
        for doc_id, source, text in CORPUS:
            assert "\t" not in text and "," not in text
            f.write(f"{doc_id}\t{source}\t{text}\n")
    print(f"wrote {OUT}/unicode_corpus.tsv: {len(CORPUS)} rows")

    by_source = {}
    for doc_id, source, text in CORPUS:  # already in doc_id order
        by_source.setdefault(source, []).append(text)

    sigs = {s: _extract_behavior_signature(t) for s, t in by_source.items()}

    with open(f"{OUT}/unicode_dli_signature.csv", "w", encoding="utf-8") as f:
        f.write("source," + ",".join(DLI_FEATS) + "\n")
        for s in sorted(sigs):
            f.write(s + "," + ",".join(fmt(sigs[s]["features"][k]) for k in DLI_FEATS) + "\n")
    print(f"wrote {OUT}/unicode_dli_signature.csv: {len(sigs)} rows")

    with open(f"{OUT}/unicode_dli_bigrams.csv", "w", encoding="utf-8") as f:
        f.write("source,rank,bigram,p\n")
        n = 0
        for s in sorted(sigs):
            # bigram_dist is insertion-ordered per most_common (dli.py)
            for rank, (bg, p) in enumerate(sigs[s]["bigram_dist"].items(), start=1):
                f.write(f"{s},{rank},{bg},{fmt(p)}\n")
                n += 1
    print(f"wrote {OUT}/unicode_dli_bigrams.csv: {n} rows")


if __name__ == "__main__":
    main()
