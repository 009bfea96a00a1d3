"""The probe-normalized regression gate: machine-load deflation and the
materiality floor (tools/bench_compare.py)."""

import json
import sys

sys.path.insert(0, "/root/repo/tools")

from bench_compare import compare


def _write(tmp_path, name, queries, probes=None):
    d = {"queries": queries}
    if probes is not None:
        d["calibration"] = {"probe_sec": probes}
    p = tmp_path / name
    p.write_text(json.dumps(d))
    return str(p)


def test_loaded_machine_is_not_a_regression(tmp_path):
    # same engine cost, new run on a 2x-slower (loaded) machine: raw walls
    # double, probe doubles too -> normalized ratio ~1.0, nothing flagged
    old = _write(tmp_path, "old.json", {"q": 1.0}, probes=[0.10, 0.12])
    new = _write(tmp_path, "new.json", {"q": 2.0}, probes=[0.20, 0.24])
    rep = compare(old, new)
    assert rep["normalized"] and rep["probe_factor"] == 0.5
    assert rep["flagged"] == []
    assert rep["rows"][0]["new_norm"] == 1.0


def test_true_regression_survives_normalization(tmp_path):
    old = _write(tmp_path, "old.json", {"q": 1.0}, probes=[0.10])
    new = _write(tmp_path, "new.json", {"q": 1.6}, probes=[0.10])
    rep = compare(old, new)
    assert [r["query"] for r in rep["flagged"]] == ["q"]


def test_tiny_walls_not_material(tmp_path):
    # 0.05 -> 0.09s is 1.8x but under the 0.15s materiality floor
    old = _write(tmp_path, "old.json", {"q": 0.05}, probes=[0.1])
    new = _write(tmp_path, "new.json", {"q": 0.09}, probes=[0.1])
    assert compare(old, new)["flagged"] == []


def test_raw_fallback_without_calibration(tmp_path):
    old = _write(tmp_path, "old.json", {"q": 1.0})
    new = _write(tmp_path, "new.json", {"q": 1.0}, probes=[0.1])
    rep = compare(old, new)
    assert not rep["normalized"] and rep["probe_factor"] == 1.0


def test_query_set_drift_reported(tmp_path):
    old = _write(tmp_path, "old.json", {"a": 1.0, "b": 1.0}, probes=[0.1])
    new = _write(tmp_path, "new.json", {"b": 1.0, "c": 1.0}, probes=[0.1])
    rep = compare(old, new)
    assert rep["only_in_old"] == ["a"] and rep["only_in_new"] == ["c"]


def test_one_lucky_probe_does_not_skew_normalization(tmp_path):
    """MEDIAN probe, not min: a single unusually fast probe in the new run
    (cache-warm core, momentary idle) used to deflate its machine-speed
    estimate and flag phantom 1.3x regressions across untouched queries."""
    old = _write(tmp_path, "old.json", {"q": 1.0},
                 probes=[0.09, 0.10, 0.11, 0.10])
    new = _write(tmp_path, "new.json", {"q": 1.0},
                 probes=[0.05, 0.10, 0.11, 0.10])   # one lucky 0.05
    rep = compare(old, new)
    assert rep["flagged"] == []
    assert 0.9 < rep["probe_factor"] < 1.1
