"""Pytest smoke slice of the composed-plan differential fuzzer
(scripts/fuzz_parity.py — see its docstring for the generator and op
vocabulary). The full 500-chain sweep runs out-of-band per round; this
slice keeps a fixed seed window green in CI so a regression in any
composition path (project/filter/assign/fillna/rename/drop/dedup/sort/
groupby/join over frames with nulls, ties, empty partitions) fails the
suite with a reproducible seed."""

from __future__ import annotations

import pytest

from scripts.fuzz_parity import run_chain

BASE = 20260816


@pytest.mark.parametrize("offset", range(0, 30))
def test_fuzz_chain(spark, offset):
    ok, msg = run_chain(BASE + offset)
    assert ok, msg
