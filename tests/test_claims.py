"""Claims-vs-artifacts gate: every artifact row SURVEY.md asserts must
actually exist on disk with a passing verdict. This is the checker the
round-8 VERDICT asked for after two consecutive rounds shipped a claim
citing a nonexistent row (r7 §8.8 SELFCHECK_SF10; r8 §8.4/§8.9 two
missing SELFCHECK_SF1 rows) — both historical instances reproduce as
failures of this test when run against the r8 artifacts."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import claims_check


def test_survey_artifact_claims_hold():
    problems = claims_check.check_claims()
    assert not problems, "SURVEY.md claims drift from artifacts:\n" + "\n".join(
        problems
    )


def test_registry_counts_are_consistent():
    """README's current-state counts and SURVEY's latest 'Registry:
    **N entries' statement must equal len(queries()) — the r11 verdict
    found both documents a round behind the code."""
    problems = claims_check.check_registry_counts()
    assert not problems, "registry-count drift:\n" + "\n".join(problems)


def test_golden_and_artifact_counts_are_consistent():
    """r12 verdict #7: SURVEY's latest golden count and README's
    golden/SELFCHECK row counts must match disk (the '707 vs 709
    goldens' and '129 vs 131 SF10 rows' drift class)."""
    problems = claims_check.check_golden_and_artifact_counts()
    assert not problems, "count drift:\n" + "\n".join(problems)
