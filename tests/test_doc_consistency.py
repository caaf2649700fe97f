"""Docs must never outrun the driver's bench artifacts.

Rounds 3 and 4 both shipped README/ROOFLINE/SCALING numbers above what
the driver's own capture reproduced (VERDICT r04 weakness #1).  The rule
now enforced mechanically: every throughput a doc quotes must carry its
bench-JSON key on the same line (e.g. ``coherent_pll_msps``), and the
quoted number must not exceed the best value that key has reached in ANY
driver-format artifact checked in (BENCH_r*.json plus BENCH_local*.json,
all produced by bench.py's min-of-reps statistic).  Docs are expected to
quote CONSERVATIVE floors below the latest capture, so this holds both
against the current artifacts and the next driver round.
"""

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", "docs/ROOFLINE.md", "docs/SCALING.md"]

_KEY_NUM = re.compile(
    r"`(?P<key>[a-z0-9_]+_msps|value)`"  # annotated bench key
    r"[^|\n]*\|\s*\**(?P<num>[0-9][0-9_,.]*)"  # table cell: quoted number
)


def _artifact_best() -> dict:
    best: dict[str, float] = {}
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")) + glob.glob(
        os.path.join(REPO, "BENCH_local*.json")
    ):
        with open(path) as f:
            text = f.read()
        # driver artifacts wrap the bench line in a record with "parsed";
        # local captures are the raw JSON line
        try:
            rec = json.loads(text)
        except json.JSONDecodeError:
            continue
        data = rec.get("parsed", rec) if isinstance(rec, dict) else {}
        if not isinstance(data, dict):
            continue
        for k, v in data.items():
            if isinstance(v, (int, float)) and (
                k.endswith("_msps") or k == "value"
            ):
                best[k] = max(best.get(k, 0.0), float(v))
    return best


def _doc_claims():
    claims = []
    for rel in DOCS:
        path = os.path.join(REPO, rel)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for lineno, line in enumerate(f, 1):
                for m in _KEY_NUM.finditer(line):
                    num = float(m.group("num").replace(",", "").replace("_", ""))
                    claims.append((rel, lineno, m.group("key"), num))
    return claims


def test_docs_do_not_exceed_bench_artifacts():
    best = _artifact_best()
    assert best, "no BENCH artifacts found"
    claims = _doc_claims()
    assert claims, (
        "no annotated perf claims found -- doc perf tables must cite the "
        "bench key in backticks on the same line as the number"
    )
    offenders = [
        (rel, lineno, key, num, best.get(key))
        for rel, lineno, key, num in claims
        if key in best and num > best[key]
    ]
    assert not offenders, (
        "doc numbers exceed every bench artifact (quote at or below the "
        f"driver-reproducible floor): {offenders}"
    )
    unknown = [c for c in claims if c[2] not in best]
    assert not unknown, f"doc cites unknown bench keys: {unknown}"
