"""The bench harness's regression-floor bookkeeping (bench.py).

Round 10 adds CONFIG EPOCHS (VERDICT r9 #1): a deliberate algorithm or
sizing change to a registered query bumps its epoch, and floors only
compare artifacts measured under the SAME epoch — otherwise a floor
banked under a configuration later proven scale-unsafe (sem_dedup's
pinned 8 centroids) re-flags the fixed implementation as a regression
every round forever.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _write(tmp_path, name, queries, epochs=None, sf=0.1):
    rec = {"sf": sf, "queries": queries}
    if epochs is not None:
        rec["config_epochs"] = epochs
    (tmp_path / name).write_text(json.dumps(rec))


def test_floor_is_min_over_recent_rounds(tmp_path):
    _write(tmp_path, "BENCH_r01.json", {"q": 1.0})
    _write(tmp_path, "BENCH_r02.json", {"q": 3.0})
    _write(tmp_path, "BENCH_r03.json", {"q": 2.0})
    floor, src = bench._load_floor(0.1, here=str(tmp_path))
    assert floor["q"] == 1.0 and src["q"] == "BENCH_r01.json"
    # window of 3 distinct rounds: r1 ages out once r4 lands
    _write(tmp_path, "BENCH_r04.json", {"q": 2.5})
    floor, src = bench._load_floor(0.1, here=str(tmp_path))
    assert floor["q"] == 2.0 and src["q"] == "BENCH_r03.json"


def test_floor_ignores_other_sf(tmp_path):
    _write(tmp_path, "BENCH_r01.json", {"q": 0.1}, sf=1.0)
    _write(tmp_path, "BENCH_r02.json", {"q": 2.0}, sf=0.1)
    floor, _ = bench._load_floor(0.1, here=str(tmp_path))
    assert floor["q"] == 2.0


def test_floor_respects_config_epochs(tmp_path, monkeypatch):
    """An artifact measured under an older epoch of a query cannot floor
    the current epoch; artifacts without the field count as epoch 1."""
    monkeypatch.setattr(bench, "CONFIG_EPOCHS", {"changed": 2})
    _write(tmp_path, "BENCH_r01.json", {"changed": 1.0, "stable": 1.5})
    _write(
        tmp_path,
        "BENCH_r02.json",
        {"changed": 3.0, "stable": 2.0},
        epochs={"changed": 2},
    )
    floor, src = bench._load_floor(0.1, here=str(tmp_path))
    # the 1.0s epoch-1 measurement is NOT a floor for epoch 2
    assert floor["changed"] == 3.0 and src["changed"] == "BENCH_r02.json"
    # unchanged queries keep the cross-round min
    assert floor["stable"] == 1.5


def test_current_epochs_cover_only_known_queries():
    """Epoch keys must name real headline queries — a typo would
    silently disable the floor for the intended query."""
    known = set(bench.HEADLINE) | {
        "routing_9od",
        "routing_9od_batch",
        "find_near_stops_9",
        "find_near_stops_batch_9",
    }
    assert set(bench.CONFIG_EPOCHS) <= known
