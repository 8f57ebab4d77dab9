"""Float-floor boundary audit as a test (VERDICT r7 advice #6).

COVERAGE.md's r7 audit classified every floor-quantization in the suite:

(a) *structurally exact* boundary values — transcendental/float32
    outputs whose TRUE value can sit exactly on the quantization grid
    (key-derived half-degree angles in geo_q, ASCII-byte channel means
    in multimodal) — these MUST carry the ``+ 1e-3`` pre-floor guard,
    applied identically in both engines;
(b) *boundary-random* values (tf-idf logs, regression slopes, stddev,
    skew/kurtosis) — continuous fixture-random inputs where a grid hit
    needs the output within ~1e-9 of a cell edge; negligible
    probability, confirmed clean by the full sf0.1 sweep;
(c) exact-integer pipelines (cents, quantized dots, cross-multiplied
    thresholds) — bit-identical pre-floor by construction; no risk.

This test makes the classification machine-checked: every ``floor(``
whose same expression (5-line window) touches a transcendental /
float32-feature token must either carry the 1e-3 guard in that window
(class a) or be accounted for in the per-file boundary-random budget
below (class b). A NEW unguarded risky floor fails the test until its
author either adds the guard or consciously reclassifies it here — the
class cannot silently regrow. Budgets are exact (not ≤) so removed or
newly-guarded floors also force an update, keeping the ledger honest.
"""

from __future__ import annotations

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_FLOOR = re.compile(r"floor\s*\(", re.I)
#: tokens whose outputs are transcendental / float32-derived — the only
#: inputs that can disagree in the last ulp between the JVM and C libm
#: (or between a float32 schema and the float64 oracle) before a floor
_RISKY = re.compile(
    r"(\bSQRT\s*\(|\bATAN2?\s*\(|\bASIN\s*\(|\bACOS\s*\(|\bSIN\s*\(|"
    r"\bCOS\s*\(|\bTAN\s*\(|\bLN\s*\(|\bLOG(?:2|10)?\s*\(|\bEXP\s*\(|"
    r"\bPOWER\s*\(|F\.pow\b|\bPOW\s*\(|\bRADIANS\s*\(|\bDEGREES\s*\(|"
    r"\bREGR_|\bregr_|\bstddev|\bSTDDEV|st_azimuth|st_distance|haversine|"
    r"\bfeatures\b)",
    re.I,
)

#: class-(b) boundary-random floors per COVERAGE.md's r7 audit —
#: continuous random inputs, grid-hit probability ~1e-9, full-sf0.1
#: sweep clean. EXACT expected counts per suite file.
_BOUNDARY_RANDOM_BUDGET = {
    # skew/kurtosis central moments, weighted-avg/REGR_* slopes and
    # intercepts, grouped-stddev merge (15 floor sites incl. both the
    # Spark and oracle-SQL twins)
    "aggregates.py": 15,
    # tf-idf ln(), SemDeDup sqrt distance, audio RMS sqrt
    "llm.py": 3,
    # weighted-sample sqrt(n) weight (code + its docstring mention)
    "sampling_q.py": 2,
    # sqrt/degrees-radians/atan2/log2/log10 scalar showcase entries
    "scalar_funcs.py": 6,
}


def _risky_unguarded(path: str) -> list[int]:
    lines = open(path).read().splitlines()
    out = []
    for i, line in enumerate(lines):
        if _FLOOR.search(line) and _RISKY.search(line):
            # the guard may sit on a continuation line BEFORE the line
            # carrying floor( (multi-line expressions wrap either way)
            window = "\n".join(lines[max(0, i - 2) : i + 5])
            if "1e-3" not in window:
                out.append(i + 1)
    return out


def test_no_unbudgeted_risky_floors():
    problems = []
    seen_files = set()
    for path in sorted(glob.glob(os.path.join(REPO, "palo_spark/suite/*.py"))):
        name = os.path.basename(path)
        hits = _risky_unguarded(path)
        budget = _BOUNDARY_RANDOM_BUDGET.get(name, 0)
        if len(hits) != budget:
            problems.append(
                f"{name}: {len(hits)} unguarded transcendental floors at "
                f"lines {hits}, budget is {budget} — add the +1e-3 pre-floor "
                "guard (class a) or update _BOUNDARY_RANDOM_BUDGET with an "
                "audit note (class b)"
            )
        seen_files.add(name)
    stale = [f for f in _BOUNDARY_RANDOM_BUDGET if f not in seen_files]
    assert not stale, f"budget names missing suite files: {stale}"
    assert not problems, "\n".join(problems)


def test_guarded_floors_guard_both_engines():
    """Every suite entry using the +1e-3 guard must apply it in BOTH the
    Spark expression and the oracle SQL — a one-sided guard SHIFTS the
    quantization grid instead of nudging values off it, which is worse
    than no guard. Proxy check: any file mentioning the guard mentions
    it at least twice (Spark side + oracle side)."""
    for path in sorted(glob.glob(os.path.join(REPO, "palo_spark/suite/*.py"))):
        text = open(path).read()
        n = len(re.findall(r"\+\s*1e-3", text))
        assert n == 0 or n >= 2, (
            f"{os.path.basename(path)}: {n} one-sided +1e-3 guard — "
            "apply identically in Spark AND oracle SQL"
        )
