"""Batch-84 planted invariants: exact-power-of-two bucketing boundaries
(cap(64)=64, cap(65)=128), hand-computed waste ppm, and tie-group
coverage correctness (a vocab cut INSIDE a frequency tie takes the
remainder times the tie count, never a per-term ordering)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.trainplan import oov_vocab_curve, padding_waste_census


def _docs(tmp_path, texts_or_chars, texts=False):
    n = len(texts_or_chars)
    if texts:
        body = list(texts_or_chars)
        chars = [len(t) for t in body]
    else:
        chars = list(texts_or_chars)
        body = ["x" * c for c in chars]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(body),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array(chars, pa.int64()),
    }), str(tmp_path / "documents.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_padding_boundaries(tmp_path):
    # chars 256 -> toks 64 -> cap 64 (exact power stays);
    # chars 260 -> toks 65 -> cap 128; chars 4 -> toks 1 -> cap 1
    _docs(tmp_path, [256, 260, 4])
    out = padding_waste_census(str(tmp_path)).to_pandas().set_index("cap")
    assert out.loc[64, "n_docs"] == 1 and out.loc[64, "waste_ppm"] == 0
    assert out.loc[128, "token_mass"] == 65
    assert out.loc[128, "waste_ppm"] == (128 - 65) * 1_000_000 // 128
    assert out.loc[1, "waste_ppm"] == 0


@pytest.mark.usefixtures("ray_session")
def test_oov_tie_groups(tmp_path):
    # 'aaa' x4; 'bbb','ccc','ddd' x2 each; 150 singletons
    singles = " ".join(f"w{chr(97 + i % 26)}{chr(97 + (i // 26) % 26)}"
                       f"{chr(97 + i % 7)}q{i % 10 * 'z'}" for i in range(150))
    text = "aaa aaa aaa aaa bbb bbb ccc ccc ddd ddd " + singles
    _docs(tmp_path, [text], texts=True)
    out = oov_vocab_curve(str(tmp_path)).to_pandas().set_index("vocab_size")
    # compute brute-force expectation
    from collections import Counter
    import re
    tf = Counter(re.findall(r"[a-z]+", text.lower()))
    total = sum(tf.values())
    # size 100: 4 + 3*2 + 96 remaining singleton-mass... derive generically
    def cover(size):
        coc = Counter(tf.values())
        mass, slots = 0, size
        for cnt in sorted(coc, reverse=True):
            take = min(slots, coc[cnt])
            mass += cnt * take
            slots -= take
            if slots == 0:
                break
        return mass * 1_000_000 // total
    for size in (100, 1000, 10000):
        assert int(out.loc[size, "covered_ppm"]) == cover(size), size
    # monotone in vocab size, saturating at full coverage
    assert out["covered_ppm"].is_monotonic_increasing
    assert int(out.loc[10000, "covered_ppm"]) == 1_000_000
