"""Observability utilities: build stats, progress, selectivity report."""

import numpy as np

from vector_database_tpu import build_index, search
from vector_database_tpu.utils import datasets
from vector_database_tpu.utils.profiling import (
    BuildStats,
    ProgressLogger,
    selectivity_report,
    trace,
)


def test_build_stats_collects_levels():
    stats = BuildStats()
    vecs = datasets.random_uniform(500, 8, seed=120)
    build_index(vecs, progress=stats)
    assert len(stats.levels) >= 5
    assert stats.levels[0].active_points == 500
    assert stats.levels[0].live_ranges == 1
    # monotone: active points never increase
    actives = [s.active_points for s in stats.levels]
    assert all(a >= b for a, b in zip(actives, actives[1:]))
    assert "level" in stats.report()


def test_progress_logger(capsys):
    vecs = datasets.random_uniform(200, 4, seed=121)
    build_index(vecs, progress=ProgressLogger(every=1))
    out = capsys.readouterr().out
    assert "Process level 0: 1 ranges, 200 active points" in out


def test_selectivity_report():
    vecs = datasets.grid2d(50)
    index = build_index(vecs)
    res = search(index, np.array([[0.1, 0.1], [0.5, 0.5]], np.float32), 0.1)
    rep = selectivity_report(res, n=2500)
    assert rep["queries"] == 2
    assert rep["mean_matches"] >= 1
    assert rep["candidates_per_match"] >= 1
    assert rep["overflowed"] == 0


def test_trace_noop(tmp_path):
    with trace(str(tmp_path / "prof")):
        pass  # must not raise anywhere
