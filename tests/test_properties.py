"""Property-based tests (hypothesis): the cleaner and canonicalizer must be
total (never raise), deterministic, and respect their output invariants on
arbitrary input — the robustness layer above the example-based suites."""

from hypothesis import given, settings
from hypothesis import strategies as st

from omni_ray.functions.canonical import canonicalize_url, host_of, md5_hex
from omni_ray.functions.clean import basic_clean, clean_content, clean_text, is_valid_content
from omni_ray.functions.enrich import extract_key_phrases, extract_keywords
from omni_ray.functions.html_mini import parse_html
from omni_ray.functions.textstats import quality_signals, rolling_fingerprint

html_ish = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=2000
).map(lambda s: s.replace("\x00", ""))


@settings(max_examples=150, deadline=None)
@given(html_ish)
def test_parse_never_raises_and_cleaner_total(s):
    parse_html(s)  # malformed input must not raise
    out = clean_content(s, "https://example.com/x")
    assert isinstance(out, str)
    # cleaner output is whitespace-normalized: no doubles, no leading/trailing
    assert out == out.strip()
    assert "  " not in out


@settings(max_examples=150, deadline=None)
@given(html_ish)
def test_clean_text_idempotent(s):
    once = clean_text(s)
    assert clean_text(once) == clean_text(clean_text(once))


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_canonicalize_stable_and_deterministic(u):
    c1 = canonicalize_url(u)
    # canonicalization is idempotent — a canonical url maps to itself
    assert canonicalize_url(c1) == canonicalize_url(canonicalize_url(c1))
    assert md5_hex(c1) == md5_hex(c1)
    host_of(u)  # total


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=1000))
def test_text_ops_total_and_bounded(s):
    assert 0.0 <= quality_signals(s)["quality"] <= 1.0
    fp = rolling_fingerprint(s)
    assert 1 <= len(fp) <= 4 and all(isinstance(x, int) and x >= 0 for x in fp)
    kws = extract_keywords(s)
    assert len(kws) <= 15
    assert all(10 < len(p) < 50 for p in extract_key_phrases(s))


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=500))
def test_validity_gate_total(s):
    assert is_valid_content(s) in (True, False)
    assert isinstance(basic_clean(s), str)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["Acme", "Corp", "Inc", "systems", "global", "a", "xy", "Beta-Corp",
             "big,", "Ltd.", "Co", "and", "Incorporated", "x1y", "Technologies"]
        ),
        max_size=12,
    ).map(" ".join)
)
def test_org_linear_scan_equals_reference_regex(text):
    from omni_ray.functions.enrich import (
        _ORG_PATTERNS,
        _ORG_SUFFIXES_1,
        _ORG_SUFFIXES_2,
        _org_matches_linear,
    )

    for pat, suffixes in zip(_ORG_PATTERNS, (_ORG_SUFFIXES_1, _ORG_SUFFIXES_2)):
        want = [m.group(0) for m in pat.finditer(text)]
        got = _org_matches_linear(text, suffixes)
        assert got == want, (text, got, want)


def test_bucketed_agg_equals_builtin_aggregate():
    """queries._bucketed_agg (the row-sized-domain combiner) must agree
    with groupby().aggregate exactly — sum/count/min/max over a skewed
    random key mix, including string keys."""
    import numpy as np
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    from omni_ray.pipelines.queries import _bucketed_agg

    rng = np.random.default_rng(7)
    n = 20_000
    df = pd.DataFrame({
        "k": np.where(rng.random(n) < 0.3, 5,
                      rng.integers(0, 5_000, n)).astype(np.int64),
        "s": [f"t{v}" for v in rng.integers(0, 3_000, n)],
        "x": rng.integers(-100, 100, n).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(16).materialize()

    got = _bucketed_agg(
        ds, ["k"],
        {"sx": ("x", "sum"), "n": ("x", "count"),
         "mn": ("x", "min"), "mx": ("x", "max")},
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = (
        ds.groupby("k")
        .aggregate(Sum("x", alias_name="sx"), Count(alias_name="n"),
                   Min("x", alias_name="mn"), Max("x", alias_name="mx"))
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "sx", "n", "mn", "mx"]].astype("int64"),
        want[["k", "sx", "n", "mn", "mx"]].astype("int64"),
    )

    # string keys through pd.util.hash_array bucketing
    got_s = _bucketed_agg(ds, ["s"], {"sx": ("x", "sum")}).to_pandas()
    want_s = ds.groupby("s").aggregate(Sum("x", alias_name="sx")).to_pandas()
    got_s = got_s.sort_values("s").reset_index(drop=True)
    want_s = want_s.sort_values("s").reset_index(drop=True)
    assert (got_s["s"] == want_s["s"]).all()
    assert (got_s["sx"].astype("int64") == want_s["sx"].astype("int64")).all()


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_decode_ppm_total(payload):
    """decode_ppm on arbitrary bytes either returns a valid raster or
    raises ValueError — never crashes with anything else."""
    import numpy as np

    from omni_ray.stages.multimodal import decode_ppm

    try:
        img = decode_ppm(payload)
    except ValueError:
        return
    assert isinstance(img, np.ndarray) and img.ndim == 3 and img.shape[2] == 3


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 10**9), st.integers(1, 40), st.integers(1, 30))
def test_ppm_roundtrip(media_id, w, h):
    from omni_ray.stages.multimodal import decode_ppm, encode_ppm

    img = decode_ppm(encode_ppm(media_id, w, h))
    assert img.shape == (h, w, 3)
    assert img[0, 0, 0] == (media_id * 7) % 256


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 10**9), st.integers(1, 2000))
def test_wav_roundtrip(media_id, n):
    import numpy as np

    from omni_ray.stages.multimodal import decode_wav, encode_wav

    samples, rate = decode_wav(encode_wav(media_id, n))
    assert rate == 8000 and len(samples) == n
    expect = (((media_id * 13 + np.arange(n, dtype=np.int64) * 31) % 4096)
              - 2048).astype(np.int16)
    assert (samples == expect).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 4),              # user
              st.integers(0, 10**7),          # ts_us
              st.integers(0, 10**6)),         # event_id
    min_size=1, max_size=60))
def test_session_ids_match_bruteforce(rows):
    """_with_session_ids (vectorized shift/cumsum) must agree with a
    per-user scalar walk of the 30-min gap rule on arbitrary inputs,
    including duplicate timestamps."""
    import pandas as pd

    from omni_ray.pipelines.engineops import _GAP_US, _with_session_ids

    df = pd.DataFrame(rows, columns=["user_id", "ts_us", "event_id"])
    got = _with_session_ids(df)

    # brute force: walk each user's sorted events, count session opens
    brute = {}
    n_sessions = 0
    order = sorted(rows, key=lambda r: (r[0], r[1], r[2]))
    prev_user, prev_ts = None, None
    for u, ts, eid in order:
        if u != prev_user or ts - prev_ts > _GAP_US:
            n_sessions += 1
        brute[(u, ts, eid)] = n_sessions
        prev_user, prev_ts = u, ts

    for r in got.itertuples():
        assert brute[(r.user_id, r.ts_us, r.event_id)] == r.sid


# ---- packed digest routing (state/filters.py) -------------------------------

@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.binary(min_size=16, max_size=16), max_size=200),
    st.integers(min_value=1, max_value=16),
)
def test_route_packed_digests_matches_naive(digests, n_shards):
    """Vectorized router == per-row shard_of + fromhex, order preserved."""
    from omni_ray.state.filters import SeenSet, route_packed_digests

    hexes = [d.hex() for d in digests]
    groups = route_packed_digests(hexes, n_shards)
    rebuilt = [None] * len(hexes)
    for sid, (packed, idxs) in groups.items():
        assert len(packed) == 16 * len(idxs)
        for k, i in enumerate(idxs):
            d = packed[16 * k : 16 * k + 16]
            assert SeenSet.shard_of(d.hex(), n_shards) == sid
            rebuilt[int(i)] = d
    assert rebuilt == digests


def test_seen_shard_accepts_packed_and_list():
    """SeenShard.check_and_add/contains: packed blob == list-of-bytes API."""
    from omni_ray.state.filters import SeenShard

    cls = SeenShard.__ray_metadata__.modified_class  # undecorated actor class
    a, b = cls(0), cls(1)
    digests = [bytes([i]) * 16 for i in range(50)]
    packed = b"".join(digests)
    assert a.check_and_add(digests) == b.check_and_add(packed)
    assert a.check_and_add(digests[25:]) == b.check_and_add(b"".join(digests[25:]))
    assert a.contains(digests) == b.contains(packed) == [True] * 50
