"""Batch-32 semantic invariants beyond oracle frame-equality: the A/B
assignment is deterministic, user-level consistent and balanced, and a
planted all-one-arm table maxes the SRM statistic; type Jaccard matches
a set replay and the bitmask census conserves users; the rich club's
min_degree is a true degree and no excluded node beats it; round-number
shares replay exactly and a planted all-round table reads 1e6 ppm."""

import hashlib
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.expops import (
    ab_split_audit,
    rich_club_topk,
    round_number_bias,
    type_cooccurrence_jaccard,
)

SF = "/root/testdata/sf0.001"


def _arm(u):
    return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) & 1


@pytest.mark.usefixtures("ray_session")
def test_ab_split_replays_and_srm_fires_on_skew():
    out = ab_split_audit(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    per_user = ev.groupby("user_id")["event_type"] \
        .agg(lambda v: int((v == "purchase").any()))
    arms = pd.Series({u: _arm(u) for u in per_user.index})
    r = out.iloc[0]
    assert int(r["n_users_a"]) == int((arms == 0).sum())
    assert int(r["n_users_b"]) == int((arms == 1).sum())
    ca = int(per_user[arms == 0].sum())
    assert int(r["conv_a_ppm"]) == ca * 1_000_000 // int((arms == 0).sum())
    # planted: users hashing all into arm 0 -> srm = 1000 * n
    users = [u for u in range(2000) if _arm(u) == 0][:50]
    root = os.path.join(tempfile.gettempdir(), "omni_ray_ab")
    os.makedirs(root, exist_ok=True)
    pq.write_table(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["click"] * len(users)),
    }), os.path.join(root, "events.parquet"))
    p = ab_split_audit(root)
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    assert int(p["n_users_b"].iloc[0]) == 0
    assert int(p["srm_chi2_milli"].iloc[0]) == 1000 * len(users)


@pytest.mark.usefixtures("ray_session")
def test_type_jaccard_matches_set_replay():
    out = type_cooccurrence_jaccard(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    users_of = {t: set(g["user_id"]) for t, g in ev.groupby("event_type")}
    types = sorted(users_of)
    assert len(out) == len(types) * (len(types) - 1) // 2
    for _, r in out.iterrows():
        a, b = users_of[r["type_a"]], users_of[r["type_b"]]
        assert int(r["n_both"]) == len(a & b)
        assert int(r["n_either"]) == len(a | b)
        assert int(r["jaccard_ppm"]) == \
            len(a & b) * 1_000_000 // len(a | b)


@pytest.mark.usefixtures("ray_session")
def test_rich_club_threshold_is_genuine():
    out = rich_club_topk(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    n = len(docs)
    deg: dict = {}
    club_edges = []
    for s in docs["doc_id"].astype("int64"):
        for j in (1, 2, 3):
            d = (7 * s + j) % n
            if d == s:
                continue
            deg[s] = deg.get(s, 0) + 1
            deg[int(d)] = deg.get(int(d), 0) + 1
            club_edges.append((int(s), int(d)))
    top = sorted(deg, key=lambda v: (-deg[v], v))[:50]
    club = set(top)
    assert int(r["k"]) == len(club)
    assert int(r["min_degree"]) == min(deg[v] for v in club)
    inside = sum(1 for s, d in club_edges if s in club and d in club)
    assert int(r["edges_inside"]) == inside
    assert int(r["density_ppm"]) == inside * 1_000_000 // (50 * 49)


@pytest.mark.usefixtures("ray_session")
def test_round_bias_replay_and_planted_all_round():
    out = round_number_bias(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    p = ev[ev["event_type"] == "purchase"]
    c = np.floor(p["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    r = out.iloc[0]
    assert int(r["n_purchases"]) == len(c)
    assert int(r["whole_dollar"]) == int((c % 100 == 0).sum())
    assert int(r["whole_ten"]) == int((c % 1000 == 0).sum())
    root = os.path.join(tempfile.gettempdir(), "omni_ray_round")
    os.makedirs(root, exist_ok=True)
    pq.write_table(pa.table({
        "event_type": pa.array(["purchase"] * 4),
        "value": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
    }), os.path.join(root, "events.parquet"))
    q = round_number_bias(root)
    q = q.to_pandas() if not isinstance(q, pd.DataFrame) else q
    assert int(q["dollar_ppm"].iloc[0]) == 1_000_000
    assert int(q["ten_ppm"].iloc[0]) == 1_000_000
