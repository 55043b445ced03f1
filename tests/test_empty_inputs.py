"""Empty-input hardening: every operator must either flow zero rows
through to an empty result with a stable schema, or raise a CLEAR
error where the math is undefined (numpy parity: factorizing an empty
matrix). Mirrors the reference's empty-partition tests
(dask/dataframe/tests/test_dataframe.py empty cases)."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet' "
            f"LIMIT 0) TO '{d}/{t}.parquet' (FORMAT parquet)"
        )
    return str(d)


# the ops that previously crashed on zero rows (driver-side scalar
# fetches returning None) — each must now yield an empty/null result
PREVIOUSLY_BROKEN = [
    "dedup_embed_lsh",
    "ann_knn_join",
    "ann_ivf",
    "autocorr",
    "histogram",
    "map_overlap",
    "join_q22_idle_customers",
]


@pytest.mark.parametrize("name", PREVIOUSLY_BROKEN)
def test_empty_input_flows_through(spark, empty_dir, name):
    import __spark_entry__ as E

    df = E.queries()[name](spark, empty_dir)
    rows = df.limit(5).collect()
    if name == "autocorr":  # scalar query: one row, null value
        assert len(rows) == 1 and rows[0][0] is None
    else:
        assert rows == []


def test_empty_linalg_raises_clearly(spark, empty_dir):
    """cholesky/tsqr of an empty array: a clear ValueError, not a
    NoneType crash (numpy cannot factorize empty matrices either)."""
    import __spark_entry__ as E

    for name in ("arr_cholesky", "arr_tsqr", "arr_lu",
                 "arr_solve_triangular", "arr_svd_compressed"):
        with pytest.raises(ValueError, match="empty"):
            E.queries()[name](spark, empty_dir).limit(1).collect()


def test_histogram_constant_column(spark):
    """min == max: numpy widens the range to (v-0.5, v+0.5) instead of
    a zero-width bin (division by zero)."""
    import dask_spark as ds
    from dask_spark.operators.reductions import histogram

    f = ds.from_pandas(pd.DataFrame({"v": [3.0, 3.0, 3.0]}))
    out = histogram(f, "v", bins=4).to_spark().toPandas()
    assert out["n"].sum() == 3
    assert (out["bin_lo"] >= 2.5).all() and (out["bin_hi"] <= 3.5).all()


def test_single_row_sweep_contract(spark, tmp_path):
    """One-row tables: degenerate stats must not crash with opaque
    index errors — cholesky of a rank-deficient gram raises a clear
    ValueError (the rest of the registry passes, checked by the
    round's sweep)."""
    import duckdb

    import dask_spark as ds
    from dask_spark.array import DArray

    con = duckdb.connect()
    con.sql(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/embeddings.parquet' "
        f"LIMIT 1) TO '{tmp_path}/embeddings.parquet' (FORMAT parquet)"
    )
    e = ds.read_parquet(f"{tmp_path}/embeddings.parquet")
    with pytest.raises(ValueError, match="rank-deficient"):
        DArray.from_frame(e, "embedding", "vec_id").cholesky()


def test_multimodal_decode_null_blob(spark):
    """A corrupt row (null media / null dims) must decode to the
    empty-bytes features, never crash the Arrow batch."""
    import pandas as pd

    from dask_spark.frame import DaskFrame
    from dask_spark.functions.multimodal import decode_features

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "media": [b"ok-bytes", None],
            "meta": [
                {"kind": "image", "width": 8, "height": 8, "n_frames": 1},
                {"kind": "image", "width": None, "height": None, "n_frames": 1},
            ],
        }
    )
    sdf = spark.createDataFrame(
        pdf,
        "doc_id bigint, media binary, "
        "meta struct<kind:string,width:int,height:int,n_frames:int>",
    )
    out = decode_features(DaskFrame(sdf)).compute()
    assert len(out) == 2
    assert all(len(f) == 10 for f in out.features)
