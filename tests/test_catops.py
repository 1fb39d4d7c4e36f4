"""Batch-58 semantic invariants beyond oracle frame-equality: V and U
both read ~1e6 on a planted perfectly-determined table and ~0 on a
planted independent one; U is genuinely asymmetric on a planted
many-to-one mapping; Simpson diversity is 0 monolingual and exactly
1 - 1/k for a flat k-mix."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.catops import (
    cramers_v_source_lang,
    lang_simpson_by_source,
    theil_u_lang_given_source,
)

SF = "/root/testdata/sf0.001"


def _write(tmp_path, srcs, langs):
    pq.write_table(pa.table({
        "source": pa.array(srcs), "lang": pa.array(langs),
    }), str(tmp_path / "documents.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_determined_vs_independent(tmp_path):
    # determined: each source maps to exactly one lang
    _write(tmp_path, ["a"] * 5 + ["b"] * 5, ["en"] * 5 + ["fr"] * 5)
    v = cramers_v_source_lang(str(tmp_path))
    v = v.to_pandas() if not isinstance(v, pd.DataFrame) else v
    # per-cell floor costs up to 1 per cell: the tiny 2x2 (each exact
    # contribution 2.5) reads chi2 = 8 of 10 -> V = sqrt(0.8) = 0.894
    assert int(v["v_ppm"].iloc[0]) >= 850_000
    u = theil_u_lang_given_source(str(tmp_path))
    u = u.to_pandas() if not isinstance(u, pd.DataFrame) else u
    assert int(u["u_ppm"].iloc[0]) >= 999_000
    # independent: both sources have the same 50/50 lang mix
    _write(tmp_path, ["a", "a", "b", "b"] * 2,
           ["en", "fr", "en", "fr"] * 2)
    v0 = cramers_v_source_lang(str(tmp_path))
    v0 = v0.to_pandas() if not isinstance(v0, pd.DataFrame) else v0
    assert int(v0["v_ppm"].iloc[0]) <= 1_000
    u0 = theil_u_lang_given_source(str(tmp_path))
    u0 = u0.to_pandas() if not isinstance(u0, pd.DataFrame) else u0
    assert int(u0["u_ppm"].iloc[0]) <= 1_000


@pytest.mark.usefixtures("ray_session")
def test_theil_u_is_directional(tmp_path):
    # two sources, ONE language: knowing the source tells you nothing
    # you didn't know (H(lang) = 0) -> u defined 0; but a many-to-one
    # source->lang map where langs < sources still gives u = 1 (lang
    # fully determined) while V < 1 (asymmetry V averages over)
    _write(tmp_path, ["a"] * 3 + ["b"] * 3 + ["c"] * 3,
           ["en"] * 3 + ["en"] * 3 + ["fr"] * 3)
    u = theil_u_lang_given_source(str(tmp_path))
    u = u.to_pandas() if not isinstance(u, pd.DataFrame) else u
    assert int(u["u_ppm"].iloc[0]) >= 999_000  # lang determined by source
    real = theil_u_lang_given_source(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    assert 0 <= int(real["u_ppm"].iloc[0]) <= 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_simpson_extremes(tmp_path):
    _write(tmp_path, ["mono"] * 6 + ["flat"] * 6,
           ["en"] * 6 + ["en", "fr", "de", "en", "fr", "de"])
    out = lang_simpson_by_source(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    g = out.set_index("source")
    assert int(g.loc["mono", "diversity_ppm"]) == 0
    # flat 3-mix: 1 - 3*(2/6)^2 = 1 - 1/3 (repeat term floors to 333333)
    assert int(g.loc["flat", "diversity_ppm"]) == 666_667
