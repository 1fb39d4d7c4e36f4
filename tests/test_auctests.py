"""Batch-53 semantic invariants beyond oracle frame-equality: AUC is
exactly 1e6 for a source strictly above the rest and 500000 for an
identical one, with per-source brute-force pair replay; Markov accuracy
is 1e6 on a deterministic planted chain and always >= the baseline;
the money median exceeds the count median on a planted whale-skewed
stream by the exact amount."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.auctests import (
    mann_whitney_auc,
    markov_top1_accuracy,
    money_weighted_median,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_auc_extremes_and_replay(tmp_path):
    pq.write_table(pa.table({
        "source": pa.array(["hi"] * 3 + ["same"] * 3 + ["lo"] * 3),
        "n_chars": pa.array([100, 110, 120, 10, 20, 30, 1, 2, 3],
                            pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = mann_whitney_auc(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    g = out.set_index("source")
    assert int(g.loc["hi", "auc_ppm"]) == 1_000_000
    assert int(g.loc["hi", "cliffs_delta_milli"]) == 1000
    assert int(g.loc["lo", "auc_ppm"]) == 0
    assert int(g.loc["lo", "cliffs_delta_milli"]) == -1000
    # brute-force replay on the real corpus for 3 sources
    real = mann_whitney_auc(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for _, r in real.head(3).iterrows():
        a = docs.loc[docs["source"] == r["source"], "n_chars"] \
            .to_numpy(np.int64)
        b = docs.loc[docs["source"] != r["source"], "n_chars"] \
            .to_numpy(np.int64)
        wins = int((a[:, None] > b[None, :]).sum())
        ties = int((a[:, None] == b[None, :]).sum())
        u2 = 2 * wins + ties
        assert int(r["auc_ppm"]) == u2 * 1_000_000 // (2 * len(a) * len(b))


@pytest.mark.usefixtures("ray_session")
def test_markov_deterministic_chain(tmp_path):
    seq = ["a", "b", "c"] * 10  # fully deterministic cycle
    n = len(seq)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.arange(n) * 60, unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(seq),
        "value": pa.array([1.0] * n, pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = markov_top1_accuracy(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["markov_ppm"]) == 1_000_000
    assert int(r["baseline_ppm"]) < 400_000
    real = markov_top1_accuracy(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    rr = real.iloc[0]
    assert int(rr["markov_hits"]) >= int(rr["baseline_hits"])


@pytest.mark.usefixtures("ray_session")
def test_money_median_whale_skew(tmp_path):
    # 9 purchases at 1.00 + one whale at 1000.00: count median 100,
    # money median 100000 (the whale holds ~99% of the money)
    vals = [1.0] * 9 + [1000.0]
    n = len(vals)
    pq.write_table(pa.table({
        "event_type": pa.array(["purchase"] * n),
        "value": pa.array(vals, pa.float64()),
        "ts": pa.array(pd.to_datetime(np.arange(n), unit="s"),
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = money_weighted_median(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["count_median_cents"]) == 100
    assert int(r["money_median_cents"]) == 100_000
    assert int(r["gap_cents"]) == 99_900
