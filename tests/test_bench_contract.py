"""Pins for bench.py's driver-facing contract (round 13).

The driver records only a ~2 KB stdout tail and parses the final JSON
line, so the bench's printed summary must stay compact while the full
per-query record persists to BENCH_LOCAL.json (VERDICT r12 item 2a).
The artifact-warmup lanes must partition ARTIFACT_WARMUP exactly —
same queries warmed, just scheduled concurrently (VERDICT r12 item 7).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench


def test_warmup_lanes_partition_artifact_warmup():
    lane_names = [n for lane in bench.WARMUP_LANES for n in lane]
    assert len(lane_names) == len(set(lane_names)), "duplicate in lanes"
    assert set(lane_names) == set(bench.ARTIFACT_WARMUP)


def test_headline_is_append_only_superset_of_frozen_subsets():
    headline = set(bench.HEADLINE)
    for names in (
        bench.COMPARABLE_R3,
        bench.COMPARABLE_R4,
        bench.COMPARABLE_R5,
        bench.COMPARABLE_R6,
    ):
        assert set(names) <= headline


def test_bench_local_snapshot_carries_full_per_query_dict():
    """The slimmed stdout contract relies on BENCH_LOCAL.json holding
    the full per-query record; the committed file must have one entry
    per headline query."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "BENCH_LOCAL.json")
    if not os.path.exists(path):  # fresh clone before any bench run
        return
    with open(path) as f:
        rec = json.load(f)
    assert set(bench.HEADLINE) <= set(rec["queries"])
