"""Probe-coverage closure (VERDICT r9 #5): every registered
non-contrast query must either have a measured wall-clock row in a
SCALING.md probe table or a reasoned exemption in the coverage ledger
(tools/probe_ledger.py, rendered into SCALING.md). This test is the
diff that keeps the three artifacts — registry, tables, ledger —
from drifting apart as rounds add operators.

No Spark session needed: it's pure text/registry reconciliation, so it
runs in milliseconds and can gate every commit.
"""

from __future__ import annotations

import os
import re

from firstamerican_etl_spark.plans.registry import load_all
from tools.probe_ledger import LEDGER, render

_SCALING = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
)


def _probed_names() -> set[str]:
    txt = open(_SCALING).read()
    return set(re.findall(r"^\| ([a-z0-9_]+) \|", txt, re.M))


def test_every_noncontrast_query_probed_or_exempted():
    reg = load_all()
    noncontrast = {n for n, s in reg.items() if "contrast" not in s.tags}
    covered = _probed_names() | set(LEDGER)
    missing = sorted(noncontrast - covered)
    assert missing == [], (
        "registered queries with neither a probe row nor a ledger "
        f"exemption: {missing} — add a tools/scale_probe_10x.py --only "
        "row or a reasoned tools/probe_ledger.py entry"
    )


def test_ledger_entries_are_live_and_not_redundant():
    reg = load_all()
    stale = sorted(set(LEDGER) - set(reg))
    assert stale == [], f"ledger names no longer registered: {stale}"
    contrast = sorted(n for n in LEDGER if "contrast" in reg[n].tags)
    assert contrast == [], (
        f"contrast rows don't belong in the coverage ledger: {contrast}"
    )
    redundant = sorted(set(LEDGER) & _probed_names())
    assert redundant == [], (
        "measured queries must not also carry an exemption (drop the "
        f"ledger entry): {redundant}"
    )


def test_ledger_targets_are_actually_measured():
    """Every rep:/twin:/e2e: exemption inherits its slope from a named
    target — the claim is void if the target itself is unmeasured."""
    probed = _probed_names()
    bad = sorted(
        f"{n} -> {kind}"
        for n, (kind, _) in LEDGER.items()
        if ":" in kind and kind.split(":", 1)[1] not in probed
    )
    assert bad == [], f"exemptions pointing at unmeasured targets: {bad}"


def test_ledger_section_in_scaling_md_matches_generator():
    """SCALING.md carries the rendered ledger; regenerating must be a
    no-op diff (run `python tools/probe_ledger.py` and re-paste the
    section when the dict changes)."""
    txt = open(_SCALING).read()
    assert "## Probe coverage ledger (r10)" in txt
    for name, (kind, reason) in LEDGER.items():
        line = f"- `{name}` — {kind}: {reason}"
        assert line in txt, f"SCALING.md ledger section is stale: missing {line!r}"
    # and nothing extra: every ledger bullet in the file is in the dict
    section = txt.split("## Probe coverage ledger (r10)", 1)[1]
    bullets = re.findall(r"^- `([a-z0-9_]+)` —", section, re.M)
    extra = sorted(set(bullets) - set(LEDGER))
    assert extra == [], f"SCALING.md ledger bullets not in the generator: {extra}"
    assert render()  # generator renders without error


def test_point_shift_yields_distinct_offsets_for_100_copies():
    """The point-scaled derivation must actually scale DISTINCT point
    layouts: with the fact-table shift (10,000,000) the per-copy
    coordinate offsets cycle with period 9, silently capping
    distinct-coordinate work at 9x (caught in the r10 review pass).
    _PT_SHIFT is chosen so all 100 copies land on distinct offsets for
    BOTH coordinate multipliers used by the geo family."""
    from tools.scale_probe_10x import _PT_SHIFT

    offs = {
        ((k * _PT_SHIFT * 104729) % 36000, (k * _PT_SHIFT * 7919) % 18000)
        for k in range(100)
    }
    assert len(offs) == 100
    # and the regression the guard exists for: the fact shift cycles
    bad = {
        ((k * 10_000_000 * 104729) % 36000, (k * 10_000_000 * 7919) % 18000)
        for k in range(100)
    }
    assert len(bad) == 9
