"""The driver parses ONLY the final ~2000 chars of bench.py's stdout.

Round 5's cumulative final line (~4 KB: 49 query timings + 7 sections)
overflowed that window, so BENCH_r05.json recorded rc=0 but parsed=null —
the 0.865 scaling gate existed only as unparseable text (VERDICT r5
what's-missing #1).  bench.gate_summary() is the fix: a compact line,
printed after every cumulative emit, that carries the gate numbers and is
hard-capped under 1500 chars.  These tests pin that contract.
"""

import json

import bench


def _r5_like_result(n_queries: int = 49, n_errors: int = 0) -> dict:
    """A result dict shaped like round 5's final cumulative state — the
    exact shape that overflowed the driver's capture window."""
    r = {
        "metric": "change_events_per_sec",
        "value": 12013.1,
        "unit": "events/sec",
        "queries": {f"query_name_{i:02d}": round(0.1 * i + 0.123, 3)
                    for i in range(n_queries)},
        "sf": 0.1,
        "budget_seconds": 3300.0,
        "section_seconds": {
            "kernels_pass1": 4.3, "wal_gen": 0.0, "scaling": 1651.1,
            "full_leg": 155.4, "queries": 67.6, "streaming": 348.2,
            "lake_compare": 180.0, "scaling_2to8": 903.3,
            "kernels_pass2": 3.8, "kernel_scaling": 1.6,
        },
        "skipped": [{"section": "lake_compare", "est_seconds": 292.7,
                     "remaining_seconds": 170.2}],
        "kernels_mb_s": {"ae": 27.9, "ram": 33.3, "rabin": 88.9,
                         "seq": 25.6, "super": 92.1, "ultra": 37.9,
                         "leap": 52.2},
        "replay_events": 1700000,
        "value_cores": 32,
        "lake_mode": "mor",
        "scaling": {
            "cores_n": 1, "cores_4n": 4, "tput_n": 2855.6,
            "tput_4n": 9875.1, "seconds_n": 595.32, "seconds_4n": 172.15,
            "efficiency": 0.865, "eff_draws_per_leg": 2,
            "samples_n": [2688.0, 2855.6],
            "samples_4n": [9225.7, 9875.1],
            "pinned": True, "tput_full": 12013.1, "cores_full": 32,
        },
        "streaming": {"cores": 4, "tput_stream": 10668.7,
                      "tput_batch": 9875.1, "stream_over_batch": 1.08,
                      "draws_per_side": 2},
        "scaling_2to8": {"cores_n": 2, "cores_4n": 8, "tput_n": 5524.3,
                         "tput_4n": 16767.4, "efficiency": 0.759,
                         "samples_n": [5524.3, 5373.8],
                         "samples_4n": [14203.1, 16767.4], "pinned": True},
        "lake_compare": {"mor_4c": 9875.1, "cow_4c": 4200.0,
                         "draws_other": 2, "draws_default": 2},
        "kernel_scaling": {"procs_n": 1, "procs_4n": 4, "mb_s_n": 77.7,
                           "mb_s_4n": 316.5, "efficiency": 1.018},
    }
    if n_errors:
        r["errors"] = {f"section_{i}": "RuntimeError('x' * 300)" + "y" * 300
                       for i in range(n_errors)}
    return r


def test_summary_fits_driver_window_with_full_r5_shape():
    line = bench.gate_summary(_r5_like_result())
    assert len(line) <= 1500
    parsed = json.loads(line)
    # every gate number the judge reads must survive the compaction
    assert parsed["metric"] == "change_events_per_sec"
    assert parsed["value"] == 12013.1
    assert parsed["scaling"]["efficiency"] == 0.865
    assert parsed["streaming"]["stream_over_batch"] == 1.08
    assert parsed["scaling_2to8"]["efficiency"] == 0.759
    assert parsed["lake_compare"]["cow_4c"] == 4200.0
    assert parsed["kernel_scaling"]["efficiency"] == 1.018
    assert parsed["skipped"] == ["lake_compare"]
    # the two things that blew the r5 line past the window must be gone
    assert "queries" not in parsed
    assert "samples_n" not in parsed["scaling"]


def test_summary_is_single_line_valid_json():
    line = bench.gate_summary(_r5_like_result())
    assert "\n" not in line
    json.loads(line)


def test_summary_survives_partial_result():
    """Early emits (only kernels_pass1 done) must still summarize."""
    r = {"metric": "change_events_per_sec", "value": None,
         "unit": "events/sec", "queries": {}, "sf": 0.1,
         "budget_seconds": 3300.0,
         "section_seconds": {"kernels_pass1": 4.3}, "skipped": []}
    parsed = json.loads(bench.gate_summary(r))
    assert parsed["value"] is None
    assert parsed["section_seconds_total"] == 4.3


def test_summary_hard_cap_drops_low_value_keys_first():
    """Pathological error strings force the drop ladder; the scaling gate
    itself must never be dropped."""
    r = _r5_like_result(n_errors=12)
    line = bench.gate_summary(r)
    assert len(line) <= 1500
    parsed = json.loads(line)
    assert parsed["scaling"]["efficiency"] == 0.865   # gate survives


def test_summary_cap_is_structural_not_shape_dependent():
    """ADVICE r6 #3: the <=1500 contract must hold for ANY result shape,
    not just the tested ones — the ladder's last-resort rungs (streaming,
    scaling) guarantee it even when every retained section is bloated."""
    r = _r5_like_result(n_errors=40)
    r["skipped"] = [{"section": f"pathological_section_name_{i:03d}",
                     "est_seconds": 1.0, "remaining_seconds": 2.0}
                    for i in range(60)]
    r["streaming"] = {f"extra_key_{i:02d}": float(i) for i in range(80)}
    line = bench.gate_summary(r)
    assert len(line) <= 1500
    json.loads(line)
