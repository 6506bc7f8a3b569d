"""Tenth-session operator pins: market-basket frequent pairs,
categorical mutual information, link-structure similarity,
readability scoring."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestFrequentPairs:
    def test_matches_pandas_reference(self):
        from suckit_ray.pipelines.relops import lineitem_frequent_pairs

        got = (
            lineitem_frequent_pairs(SF)
            .to_pandas()
            .sort_values(["part_a", "part_b"])
            .reset_index(drop=True)
        )

        li = pd.read_parquet(
            f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ).drop_duplicates()
        n_orders = li["l_orderkey"].nunique()
        item = li.groupby("l_partkey").size().to_dict()
        m = li.merge(li, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        ref = (
            m.groupby(["l_partkey_a", "l_partkey_b"], as_index=False)
            .size()
            .rename(
                columns={
                    "l_partkey_a": "part_a",
                    "l_partkey_b": "part_b",
                    "size": "support",
                }
            )
        )
        ref = ref[ref["support"] >= 2].reset_index(drop=True)
        ref["lift_micro"] = [
            (1_000_000 * n_orders * int(s)) // (item[a] * item[b])
            for a, b, s in zip(ref["part_a"], ref["part_b"], ref["support"])
        ]
        ref = ref.sort_values(["part_a", "part_b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype("int64"), ref.astype("int64")
        )

    def test_duplicate_parts_within_order_dedup(self, tmp_path):
        """An order listing the same part on two lines is ONE basket
        item: no self-pair, support counted once."""
        from suckit_ray.pipelines.relops import lineitem_frequent_pairs

        tbl = pa.table(
            {
                "l_orderkey": pa.array(
                    [1, 1, 1, 2, 2, 3, 3], pa.int64()
                ),
                "l_partkey": pa.array(
                    [10, 10, 20, 10, 20, 10, 20], pa.int64()
                ),
            }
        )
        pq.write_table(tbl, tmp_path / "lineitem.parquet")
        got = lineitem_frequent_pairs(str(tmp_path)).to_pandas()
        assert len(got) == 1
        row = got.iloc[0]
        assert (row["part_a"], row["part_b"], row["support"]) == (10, 20, 3)
        # lift = N*c(A,B)/(c(A)c(B)) = 3*3/(3*3) = 1.0 exactly
        assert row["lift_micro"] == 1_000_000
