"""Block-schema hygiene: no block anywhere may carry schema-level metadata.

pyarrow 16's hash(schema) RAISES when schema-level metadata is set (the
b'pandas' key that pandas→Arrow conversion attaches). A single dirty block
makes every downstream task log "Failed to hash the schemas (for
deduplication)" and drops Ray Data to slow schema unification. The repo
enforces cleanliness at three layers (queries._read, queries._pd_arrow,
from_pandas call-site strips); these tests pin each layer.
"""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from omni_ray.pipelines.queries import _pd_arrow, _read


def _dirty_blocks(ds) -> int:
    """Number of blocks whose schema carries any metadata."""
    return int(
        ds.map_batches(
            lambda t: pa.table({"bad": [1 if t.schema.metadata else 0]}),
            batch_format="pyarrow",
        )
        .to_pandas()["bad"]
        .sum()
    )


def test_pd_arrow_strips_metadata():
    fn = _pd_arrow(lambda df: df[df["x"] > 1])
    out = fn(pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]}))
    assert isinstance(out, pa.Table)
    assert out.schema.metadata is None
    hash(out.schema)  # must not raise
    assert out.num_rows == 2


def test_pd_arrow_passes_non_dataframe_through():
    t = pa.table({"x": [1]})
    assert _pd_arrow(lambda _: t)(pd.DataFrame()) is t


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "kwargs",
    [
        {},  # full read → stripped full schema to the scanner
        {"columns": ["o_orderkey", "o_totalprice"]},  # projected → subset schema
        {  # filtered → fused zero-copy strip stage
            "columns": ["o_orderkey", "o_orderstatus"],
            "filter": pc.field("o_orderstatus") == "F",
        },
    ],
    ids=["full", "columns", "columns+filter"],
)
def test_read_blocks_are_clean(kwargs):
    ds = _read("/root/testdata/sf0.001", "orders", **kwargs)
    assert _dirty_blocks(ds) == 0
    assert ds.count() > 0


@pytest.mark.usefixtures("ray_session")
def test_filter_on_non_projected_column_still_works():
    # the subset-schema path cannot bind this filter; _read must fall through
    # to the strip stage, not error
    ds = _read(
        "/root/testdata/sf0.001", "documents",
        columns=["doc_id", "text"],
        filter=(pc.field("lang") == "en"),
    )
    assert _dirty_blocks(ds) == 0
    assert ds.count() > 0


def test_filter_refs_within():
    from omni_ray.pipelines.queries import _filter_refs_within
    import pandas as pd

    f = (pc.field("o_orderstatus") == "O") & (pc.field("o_totalprice") > 1.5)
    assert _filter_refs_within(f, ["o_orderstatus", "o_totalprice", "x"])
    assert not _filter_refs_within(f, ["o_orderstatus"])  # refs outside
    # literal string matching a column name must not fool the check
    f2 = pc.field("lang") == "o_orderkey"
    assert not _filter_refs_within(f2, ["o_orderkey"])
    ts = pc.field("ts") >= pa.scalar(pd.Timestamp("2026-01-01"))
    assert _filter_refs_within(ts, ["ts"])


@pytest.mark.usefixtures("ray_session")
def test_filter_on_projected_columns_uses_subset_schema():
    ds = _read(
        "/root/testdata/sf0.001", "orders",
        columns=["o_orderkey", "o_orderstatus"],
        filter=(pc.field("o_orderstatus") == "F"),
    )
    assert _dirty_blocks(ds) == 0
    assert ds.count() > 0
