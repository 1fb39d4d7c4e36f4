"""Batch-72 semantic invariants: the 1-hour episode window boundary
(inclusive at exactly 3600 s, exclusive beyond), LOSO influence signs on a
planted clean/noise source pair, and the sequential chi-square monitor's
strong-effect and null closed forms."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.episodeops import (
    episode_pairs_window,
    loso_stump_delta,
    sequential_ab_chi2,
)


def _events(tmp_path, rows):
    """rows: (event_id, epoch_s, user_id, event_type)"""
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(pd.to_datetime([r[1] for r in rows], unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    }), str(tmp_path / "events.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_episode_window_boundary(tmp_path):
    _events(tmp_path, [
        (0, 0, 1, "click"),
        (1, 1800, 1, "view"),      # 1800 s after click: in window
        (2, 5400, 1, "purchase"),  # 3600 s after view: EXACTLY the window
        (3, 0, 2, "click"),        # other user: no cross-user pairs
    ])
    out = episode_pairs_window(str(tmp_path)).to_pandas()
    got = {(r["a"], r["b"]): (r["n_pairs"], r["n_users"])
           for _, r in out.iterrows()}
    assert got == {
        ("click", "view"): (1, 1),
        ("view", "purchase"): (1, 1),   # inclusive at exactly 3600 s
        # click->purchase is 5400 s: outside the window
    }


def _docs(tmp_path, rows):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[0] for r in rows]),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array([r[2] for r in rows]),
        "n_chars": pa.array([r[1] for r in rows], pa.int64()),
    }), str(tmp_path / "documents.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_loso_influence_signs(tmp_path):
    rich_text = " ".join("".join(p) for p in
                         itertools.product("abcdefghijklmno", repeat=2))[:2000]
    poor_text = "one two one two"
    rows = []
    for _ in range(4):
        rows.append((rich_text, 5000, "clean"))   # long & rich: separable
        rows.append((poor_text, 100, "clean"))    # short & poor
    rows.append((rich_text, 100, "noise"))        # inverted labels
    rows.append((poor_text, 5000, "noise"))
    _docs(tmp_path, rows)
    out = loso_stump_delta(str(tmp_path)).to_pandas().set_index("source")
    # all-data best stump: 2 errors of 10 -> 800000 ppm
    assert out.loc["noise", "acc_loso_ppm"] == 1_000_000
    assert out.loc["noise", "delta_ppm"] == 200_000
    assert out.loc["clean", "acc_loso_ppm"] == 500_000
    assert out.loc["clean", "delta_ppm"] == -300_000
    assert out.loc["noise", "n_excluded_rows"] == 8
    assert out.loc["clean", "n_excluded_rows"] == 2


@pytest.mark.usefixtures("ray_session")
def test_sequential_chi2_effect_and_null(tmp_path):
    rows, eid = [], 0
    for day in range(3):
        for k in range(20):   # arm 0 (even users): all purchase
            rows.append((eid, day * 86_400 + k, 2 * k, "purchase")); eid += 1
        for k in range(20):   # arm 1 (odd users): never purchase
            rows.append((eid, day * 86_400 + k, 2 * k + 1, "view")); eid += 1
    _events(tmp_path, rows)
    out = sequential_ab_chi2(str(tmp_path)).to_pandas()
    # perfect separation: chi2 = 1000 * N exactly, flagged from day one
    assert out["chi2_milli"].tolist() == [40_000, 80_000, 120_000]
    assert out["flag"].tolist() == [1, 1, 1]
    # null: identical arms -> ad == bc -> chi2 exactly 0
    rows = []
    for eid in range(40):
        rows.append((eid, eid, eid, "purchase" if eid % 4 < 2 else "view"))
    _events(tmp_path, rows)
    out = sequential_ab_chi2(str(tmp_path)).to_pandas()
    assert (out["chi2_milli"] == 0).all()
    assert (out["flag"] == 0).all()
