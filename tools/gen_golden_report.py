#!/usr/bin/env python3
"""Generate full-report golden fixtures by running the ACTUAL reference
report pipeline (engine.audit assembly + report.generate_report) with a
frozen clock.

Two corpora:
  - the sf0.001 documents corpus, pair (src0, src1): the main parity
    fixture for ma_report_full / ma_report_basic;
  - a synthetic corpus whose source names EMBED family names
    ("gpt-3.5-prime" teacher, "qwen-lite" student) with fewer than 20
    docs per source: exercises evidence rule 3 (_is_teacher_style),
    the §3.3/§4.3 bolding, and the reference's padding of missing
    responses to "unknown".

Outputs (src/test/resources/golden/):
  report_full_main.md, report_basic_main.md,
  report_corpus_family.tsv, report_full_family.md,
  report_basic_family.md

Usage: python3 tools/gen_golden_report.py [sf_dir] [out_dir]
"""
import sys
from datetime import datetime

sys.path.insert(0, "/root/reference/src")

import duckdb  # noqa: E402

from modelaudit.methods.llmmap import (  # noqa: E402
    LLMmapFingerprinter,
    _compute_fingerprint_vector,
    _extract_response_features,
)
from modelaudit.methods.dli import (  # noqa: E402
    _compute_behavior_similarity,
    _extract_behavior_signature,
)
from modelaudit.methods.style import _compute_style_scores  # noqa: E402
from modelaudit.models import AuditResult, ComparisonResult, Fingerprint  # noqa: E402
from modelaudit.probes import get_probes  # noqa: E402
import modelaudit.report as report_mod  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/golden"

FROZEN = datetime(2026, 1, 1, 0, 0, 0)


class _FrozenDatetime:
    @staticmethod
    def now():
        return FROZEN


# freeze the report clock (report.py stamps datetime.now())
report_mod.datetime = _FrozenDatetime

NUM_PROBES = 20  # AuditConfig default


def build_result(teacher, student, t_responses, s_responses):
    """Replicates engine.ModelAuditor.audit (engine.py:175-337) minus
    the API calls: responses come from the corpus, defaults for
    provider config ('openai', api_base '')."""
    def fp(model, responses):
        vec = _compute_fingerprint_vector(
            [_extract_response_features(r) for r in responses])
        return Fingerprint(model_id=model, method="llmmap",
                           fingerprint_type="blackbox",
                           data={"vector": vec, "raw_responses": responses})

    fp_teacher, fp_student = fp(teacher, t_responses), fp(student, s_responses)
    comparison = LLMmapFingerprinter().compare(fp_teacher, fp_student)
    comparisons = [comparison]

    sig_t = _extract_behavior_signature(t_responses)
    sig_s = _extract_behavior_signature(s_responses)
    dli_similarity = _compute_behavior_similarity(sig_t, sig_s)
    comparisons.append(ComparisonResult(
        model_a=teacher, model_b=student, method="dli",
        similarity=round(dli_similarity, 6),
        is_derived=dli_similarity >= 0.80, threshold=0.80,
        confidence=min(abs(dli_similarity - 0.80) / 0.2, 1.0),
        details={"reused_from": "llmmap_responses"}))

    probes = get_probes(count=NUM_PROBES)
    probe_details = []
    for i, probe in enumerate(probes):
        t_r = t_responses[i] if i < len(t_responses) else ""
        s_r = s_responses[i] if i < len(s_responses) else ""
        t_scores = _compute_style_scores(t_r) if t_r else {}
        s_scores = _compute_style_scores(s_r) if s_r else {}
        t_best = max(t_scores, key=lambda k: t_scores[k]) if t_scores else "unknown"
        s_best = max(s_scores, key=lambda k: s_scores[k]) if s_scores else "unknown"
        probe_details.append({
            "probe_id": probe.id, "category": probe.category,
            "teacher_style": t_best, "student_style": s_best,
            "is_consistent": t_best == s_best})

    avg_similarity = sum(c.similarity for c in comparisons) / len(comparisons)
    derived_votes = sum(1 for c in comparisons if c.is_derived)
    if derived_votes > len(comparisons) / 2:
        verdict = "likely_derived"
    elif avg_similarity < 0.5:
        verdict = "independent"
    else:
        verdict = "inconclusive"
    confidence = min(abs(avg_similarity - comparison.threshold) / 0.15, 1.0)

    details = {
        "fingerprints": {"teacher": fp_teacher.model_dump(),
                         "student": fp_student.model_dump()},
        "probe_details": probe_details,
        "teacher_info": {"model": teacher, "provider": "openai", "api_base": ""},
        "student_info": {"model": student, "provider": "openai", "api_base": ""},
    }
    return AuditResult(model_a=teacher, model_b=student, comparisons=comparisons,
                       verdict=verdict, confidence=round(confidence, 4),
                       summary="", details=details)


def write(name, content):
    with open(f"{OUT}/{name}", "w", encoding="utf-8") as f:
        f.write(content)
    print(f"wrote {OUT}/{name}: {len(content)} chars")


# Synthetic family-named corpus: teacher "gpt-3.5-prime" responses carry
# gpt-flavoured markers; student "qwen-lite" mixes gpt-flavoured and
# qwen-flavoured responses so SOME student_styles match the teacher
# name (rule 3) and some don't. 6 docs per source < 20 probes →
# probes 7..20 pad to "unknown" on both sides.
FAMILY_CORPUS = [
    (0, "gpt-3.5-prime", "I'm sorry, but as an AI language model I cannot help with that. Here's a summary:\n1. First\n2. Second"),
    (1, "gpt-3.5-prime", "As an AI language model, I don't have personal opinions. However, here are the facts:\n1. One\n2. Two"),
    (2, "gpt-3.5-prime", "Certainly! As an AI language model, I can explain this step by step.\n1. Start\n2. Continue"),
    (3, "gpt-3.5-prime", "I'm sorry, but I cannot assist with that request as an AI language model."),
    (4, "gpt-3.5-prime", "As an AI language model, my knowledge has a cutoff. Here is what I know:\n1. Alpha\n2. Beta"),
    (5, "gpt-3.5-prime", "I apologize, but as an AI language model I must decline. Consider:\n1. Safety\n2. Policy"),
    (6, "qwen-lite", "I'm sorry, but as an AI language model I cannot help with that. Here's a list:\n1. First\n2. Second"),
    (7, "qwen-lite", "当然可以！让我们一步步分析这个问题。首先，我们需要理解核心概念。"),
    (8, "qwen-lite", "As an AI language model, I aim to be helpful. Steps:\n1. Read\n2. Apply"),
    (9, "qwen-lite", "好的，让我们一步步来。首先分析问题，然后给出结论。"),
    (10, "qwen-lite", "I'm sorry, but I can't do that as an AI language model. Alternatives:\n1. A\n2. B"),
    (11, "qwen-lite", "这个问题很有意思！让我们一步步推理：首先考虑前提，然后推导。"),
]


def main():
    import os
    os.makedirs(OUT, exist_ok=True)

    # ── main corpus pair ──
    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF_DIR}/documents.parquet' "
        "WHERE source IN ('src0', 'src1') ORDER BY doc_id").fetchall()
    t_responses = [t for _, s, t in rows if s == "src0"]
    s_responses = [t for _, s, t in rows if s == "src1"]
    result = build_result("src0", "src1", t_responses, s_responses)
    write("report_full_main.md", report_mod.generate_report(result))
    basic = AuditResult(model_a=result.model_a, model_b=result.model_b,
                        comparisons=result.comparisons, verdict=result.verdict,
                        confidence=result.confidence, summary="", details={})
    write("report_basic_main.md", report_mod.generate_report(basic))

    # ── family-named synthetic corpus ──
    with open(f"{OUT}/report_corpus_family.tsv", "w", encoding="utf-8") as f:
        for doc_id, source, text in FAMILY_CORPUS:
            assert "\t" not in text
            f.write(f"{doc_id}\t{source}\t" + text.replace("\n", "\\n") + "\n")
    print(f"wrote {OUT}/report_corpus_family.tsv: {len(FAMILY_CORPUS)} rows")

    ft = [t for _, s, t in FAMILY_CORPUS if s == "gpt-3.5-prime"]
    fs = [t for _, s, t in FAMILY_CORPUS if s == "qwen-lite"]
    fresult = build_result("gpt-3.5-prime", "qwen-lite", ft, fs)
    # sanity: rule 3 must actually fire on this corpus
    n_teacher_style = sum(
        1 for pd in fresult.details["probe_details"]
        if report_mod._is_teacher_style(pd["student_style"], "gpt-3.5-prime"))
    assert n_teacher_style > 0, "synthetic corpus must trigger evidence rule 3"
    print(f"family corpus: {n_teacher_style} probes with teacher-style student")
    write("report_full_family.md", report_mod.generate_report(fresult))
    fbasic = AuditResult(model_a=fresult.model_a, model_b=fresult.model_b,
                         comparisons=fresult.comparisons, verdict=fresult.verdict,
                         confidence=fresult.confidence, summary="", details={})
    write("report_basic_family.md", report_mod.generate_report(fbasic))


if __name__ == "__main__":
    main()
