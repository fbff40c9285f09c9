"""Bench stdout contract: the ONE printed JSON line must fit the round
driver's finite tail capture (last 2000 chars of stdout).

Round 4 lost its entire bench record to this (BENCH_r04.json parsed:null):
the line grew past 2000 chars and the head — including the opening brace —
was cut off.  These tests pin (a) the degradation ladder in
bench.fit_stdout_budget and (b) that the CURRENT query-key population,
rendered with worst-case-width timings, still fits.  Adding a bench query
that overflows the budget fails here instead of silently nulling a round.
"""

import json
import re

import bench


def _current_key_sets():
    src = open(bench.__file__).read()
    m = re.search(r'for name in \(("q_minhash_pairs.*?)\):', src, re.S)
    dedup = re.findall(r'"(q_[a-z0-9_]+)"', m.group(1))
    m2 = re.search(r'for name in \(("q_span_media_align.*?)\):', src, re.S)
    pipe = re.findall(r'"(q_[a-z0-9_]+)"', m2.group(1))
    return bench.HEADLINE, dedup, pipe


def _headline(qs, dedup, pipe, width=999.99):
    return {
        "metric": "urls fetched+deduped/sec (frontier dequeue stage) "
                  "+ headline query suite",
        "value": 99999.999,
        "unit": "sec",
        "queries": {k: width for k in qs},
        "dedup_ops": {k: width for k in dedup},
        "pipeline_ops": {k: width for k in pipe},
        "urls_per_sec": 9999999.9,
        "crawl_pages_per_sec": 99999.99,
        "sf": 0.1,
        "cpus": 32,
        "detail": "BENCH/detail_r99.json",
    }


def test_current_keys_fit_budget():
    qs, dedup, pipe = _current_key_sets()
    h = bench.fit_stdout_budget(_headline(qs, dedup, pipe))
    line = json.dumps(h)
    assert len(line) + 1 <= bench.STDOUT_BUDGET <= 2000
    # headline throughput fields must survive every degradation step
    for key in ("value", "urls_per_sec", "crawl_pages_per_sec", "sf",
                "cpus", "detail", "metric"):
        assert key in h


def test_degradation_preserves_totals():
    # force overflow: 200 fake pipeline keys can never fit at full fidelity
    qs, dedup, _ = _current_key_sets()
    pipe = [f"q_fake_pipeline_operator_number_{i:03d}" for i in range(200)]
    full = _headline(qs, dedup, pipe)
    h = bench.fit_stdout_budget(full)
    assert len(json.dumps(h)) + 1 <= bench.STDOUT_BUDGET
    # degraded blocks keep count + a reconstructible total so the driver
    # line is still useful: either full collapse {n, total_sec} or the
    # slowest-8 itemized + {n, rest_sec}
    block = h["pipeline_ops"]
    assert block["n"] == 200
    if "total_sec" in block:
        got = block["total_sec"]
    else:
        got = block["rest_sec"] + sum(
            v for k, v in block.items() if k.startswith("q_")
        )
    # totals are summed over the 1-decimal-rounded per-query values
    expect = sum(round(v, 1) for v in full["pipeline_ops"].values())
    assert abs(got - expect) < 0.5


def test_fit_is_noop_when_small():
    small = {"metric": "m", "value": 1.0, "queries": {"q_a": 1.23},
             "detail": "x"}
    assert bench.fit_stdout_budget(small) == small
