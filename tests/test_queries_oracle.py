"""Driver-contract parity: every oracle-backed query in __ray_entry__
must match its DuckDB oracle at sf0.001 (row count, column names,
order-insensitive values) — the same comparison the graft driver runs
at sf0.01."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def to_pandas(x):
    import ray.data as rd

    if isinstance(x, rd.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_KEYS = sorted(E.oracle_sql().keys())


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(name, con):
    mine = norm(to_pandas(E.queries()[name](SF)))
    oracle = norm(con.sql(E.oracle_sql()[name]).df())
    assert list(mine.columns) == list(oracle.columns)
    assert len(mine) == len(oracle)
    pd.testing.assert_frame_equal(
        mine.astype(str), oracle.astype(str), check_dtype=False
    )


@pytest.mark.usefixtures("ray_session")
def test_rows_only_queries_run(con):
    qs = E.queries()
    for name in set(qs) - set(E.oracle_sql()):
        out = to_pandas(qs[name](SF))
        assert len(out) >= 0, name


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall_vs_brute_force():
    from suckit_ray.pipelines import ann

    brute = ann.brute_force_topk(SF).to_pandas()
    ivf = ann.ivf_topk(SF).to_pandas()
    recalls = []
    for q in brute["query_id"].unique():
        b = set(brute[brute["query_id"] == q]["neighbor_id"])
        a = set(ivf[ivf["query_id"] == q]["neighbor_id"])
        recalls.append(len(a & b) / len(b))
    assert sum(recalls) / len(recalls) >= 0.5  # nprobe=4/16 coarse search
