"""Golden snapshot tests (SURVEY.md §4 items 1-2, round-2 verdict
missing #1): the SE/PE SAM outputs and the fastmap SMEM dump on a
frozen repeat-heavy corpus must be BYTE-equal to the checked-in
snapshots (tests/golden/*).  Every other e2e test compares two live
implementations, so a semantics regression landing in ref/, native/
and device/ together would pass them — this one trips on any drift.

Intentional changes: run `python scripts/regen_golden.py`, review the
printed diff, commit the updated snapshots."""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts"))


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    from regen_golden import GOLD, run_outputs
    d = tmp_path_factory.mktemp("golden")
    return GOLD, run_outputs(str(d))


def _gold(gold_dir, name):
    with open(os.path.join(gold_dir, name)) as fh:
        return fh.read()


@pytest.mark.parametrize("name", ["se.sam", "pe.sam", "fastmap.txt"])
def test_golden_byte_equal(outputs, name):
    gold_dir, outs = outputs
    got = outs[name]
    want = _gold(gold_dir, name)
    if got != want:
        import difflib
        diff = "".join(list(difflib.unified_diff(
            want.splitlines(True), got.splitlines(True),
            f"golden/{name}", "current"))[:60])
        pytest.fail(f"golden drift in {name} (regen_golden.py to "
                    f"accept):\n{diff}")


def test_golden_corpus_not_degenerate(outputs):
    """The frozen corpus genuinely exercises the expensive paths:
    high mapped rate, some multi-mapping (XA), some unmapped, proper
    pairs, mate rescue targets, supplementary/secondary lines."""
    gold_dir, outs = outputs
    se = [l.split("\t") for l in outs["se.sam"].splitlines()
          if l and not l.startswith("@")]
    flags = [int(f[1]) for f in se]
    assert sum(1 for f in flags if f & 4) >= 5          # junk unmapped
    assert sum(1 for f in flags if not f & 4) >= 290    # mapped
    assert any("XA:Z:" in "\t".join(f) for f in se)     # alt hits
    pe = [l.split("\t") for l in outs["pe.sam"].splitlines()
          if l and not l.startswith("@")]
    pflags = [int(f[1]) for f in pe]
    assert sum(1 for f in pflags if f & 2) >= 500       # proper pairs
    assert any(f & 8 for f in pflags)                   # mate unmapped
