"""Batch-43 semantic invariants beyond oracle frame-equality: a planted
Simpson corpus (every group slopes down while the pooled cloud slopes
up) is flagged with all groups flipping; ABC classes partition parts and
revenue with A's share the smallest prefix ≥ 80%; the clustering census
conserves nodes and matches a brute-force replay; planted pk gaps are
counted exactly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.paradoxops import (
    abc_classification,
    local_clustering_census,
    pk_gap_audit,
    simpson_flip_audit,
)

SF = "/root/testdata/sf0.001"


def _doc(words):
    return " ".join(words)


@pytest.mark.usefixtures("ray_session")
def test_simpson_planted_flip(tmp_path):
    # two groups: within each, LONGER docs have FEWER distinct terms
    # (negative slope); but group B is both longer AND richer than A,
    # so the pooled slope is positive -> full Simpson flip
    def make(base, lens, vocabs):
        rows = []
        for ln, vc in zip(lens, vocabs):
            words = [f"{base}{chr(ord('a') + i)}" for i in range(vc)]
            text = _doc((words * ((ln // len(words)) + 1))[:ln])
            rows.append((text, ln * 6))  # n_chars proportional to len
        return rows

    a = make("qa", [10, 20, 30], [9, 6, 3])
    b = make("zb", [40, 50, 60], [24, 21, 18])
    texts = [t for t, _ in a + b]
    chars = [c for _, c in a + b]
    pq.write_table(pa.table({
        "source": pa.array(["a"] * 3 + ["b"] * 3),
        "text": pa.array(texts),
        "n_chars": pa.array(chars, pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = simpson_flip_audit(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["pooled_sign"]) == 1
    assert int(r["n_flips"]) == 2  # both groups contradict the pooled


@pytest.mark.usefixtures("ray_session")
def test_abc_partitions_and_prefix_property():
    out = abc_classification(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    li["rc"] = np.floor(li["l_extendedprice"].to_numpy() * 100
                        + 0.5).astype(np.int64)
    rev = li.groupby("l_partkey")["rc"].sum() \
        .sort_values(ascending=False)
    total = int(rev.sum())
    assert int(out["n_parts"].sum()) == len(rev)
    assert int(out["revenue_cents"].sum()) == total
    a = out.set_index("abc").loc["A"]
    # A is the minimal desc-prefix reaching 80%: its revenue >= 80% but
    # dropping its smallest member falls below
    cum = rev.cumsum().to_numpy()
    k = int(np.searchsorted(cum, total * 800_000 // 1_000_000,
                            side="left")) + 1
    assert int(a["n_parts"]) == k
    assert int(a["revenue_cents"]) == int(cum[k - 1])


@pytest.mark.usefixtures("ray_session")
def test_clustering_census_conserves_and_replays():
    out = local_clustering_census(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    n = len(docs)
    adj: dict = {}
    for s in docs["doc_id"].astype("int64"):
        for j in (1, 2, 3):
            d = int((7 * s + j) % n)
            if d == int(s):
                continue
            adj.setdefault(int(s), set()).add(d)
            adj.setdefault(d, set()).add(int(s))
    bands: dict = {}
    for node, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            bands[-1] = bands.get(-1, 0) + 1
            continue
        links = sum(1 for u in nbrs for j in (1, 2, 3)
                    if (7 * u + j) % n != u and (7 * u + j) % n in nbrs)
        band = min(links * 1_000_000 // (d * (d - 1)) // 100_000, 10)
        bands[band] = bands.get(band, 0) + 1
    assert int(out["n_nodes"].sum()) == len(adj)
    got = out.set_index("band")["n_nodes"]
    for band, cnt in bands.items():
        assert int(got.loc[band]) == cnt


@pytest.mark.usefixtures("ray_session")
def test_pk_gaps_planted(tmp_path):
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 5, 6, 10], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = pk_gap_audit(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["n_ids"]) == 6
    assert int(r["missing_total"]) == 5  # 3,4 and 7,8,9
    assert int(r["n_gap_runs"]) == 2
    assert int(r["max_gap"]) == 3
    real = pk_gap_audit(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    assert int(real["missing_total"].iloc[0]) >= 0
