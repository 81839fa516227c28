#!/usr/bin/env python3
"""Export the reference's BENCHMARK_SAMPLES (benchmark.py:20-243) as a
data resource for BenchmarkEval.scala.

The samples are reference DATA (labeled texts), not logic — keeping
them as a TSV resource instead of Scala string literals makes that
explicit. GoldenSpec's benchmark_detect fixture asserts byte-exactness
end to end (any divergence shifts the style scores).

Escapes: backslash, tab, newline, carriage return.
"""
import sys

sys.path.insert(0, "/root/reference/src")
from modelaudit.benchmark import BENCHMARK_SAMPLES  # noqa: E402

OUT = "src/main/resources/graft/benchmark_samples.tsv"


def esc(s: str) -> str:
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
            .replace("\n", "\\n").replace("\r", "\\r"))


def main():
    import os
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        for i, s in enumerate(BENCHMARK_SAMPLES):
            f.write(f"{i}\t{esc(s.label)}\t{esc(s.category)}\t{esc(s.text)}\n")
    print(f"wrote {OUT}: {len(BENCHMARK_SAMPLES)} samples")


if __name__ == "__main__":
    main()
