"""Source readers: JSONL/CSV variants must project identically to parquet
(the reference ingests arbitrary tabular feeds through one SourceConfig
surface)."""

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = [
    {"unique_id": "a1", "address": "10 HIGH STREET LONDON", "postcode": "E1 6AN", "noise": 1},
    {"unique_id": "a2", "address": "FLAT 2 LOW ROAD YORK", "postcode": "YO1 7HH", "noise": 2},
    {"unique_id": "a3", "address": "5 MILL LANE LEEDS", "postcode": "LS1 4AB", "noise": 3},
]


def _write_fixtures(tmp_path):
    tbl = pa.Table.from_pylist(ROWS)
    pq_path = str(tmp_path / "src.parquet")
    pq.write_table(tbl, pq_path)
    jl_path = str(tmp_path / "src.jsonl")
    with open(jl_path, "w") as fh:
        for r in ROWS:
            fh.write(json.dumps(r) + "\n")
    csv_path = str(tmp_path / "src.csv")
    with open(csv_path, "w") as fh:
        fh.write("unique_id,address,postcode,noise\n")
        for r in ROWS:
            fh.write(f"{r['unique_id']},{r['address']},{r['postcode']},{r['noise']}\n")
    return pq_path, jl_path, csv_path


def test_read_jsonl_columns_and_rename(ray_session, tmp_path):
    from moj_analytical_services_uk_address_matcher_ray.sources.io import read_jsonl

    _, jl_path, _ = _write_fixtures(tmp_path)
    ds = read_jsonl(
        jl_path,
        columns=["unique_id", "address"],
        rename={"address": "address_concat"},
    )
    out = ds.to_pandas().sort_values("unique_id").reset_index(drop=True)
    assert list(out.columns) == ["unique_id", "address_concat"]
    assert out["address_concat"][0] == "10 HIGH STREET LONDON"


def test_source_config_formats_identical(ray_session, tmp_path):
    from moj_analytical_services_uk_address_matcher_ray.sources.io import (
        SourceConfig,
        union_sources,
    )

    pq_path, jl_path, csv_path = _write_fixtures(tmp_path)
    select = {"unique_id": "unique_id", "address_concat": "address", "postcode": "postcode"}
    outs = {}
    for fmt, path in (("parquet", pq_path), ("jsonl", jl_path), ("csv", csv_path)):
        cfg = SourceConfig(
            path=path, dataset_name=f"d_{fmt}", select=select, format=fmt
        )
        df = cfg.load().to_pandas().sort_values("unique_id").reset_index(drop=True)
        assert list(df["dataset_name"].unique()) == [f"d_{fmt}"]
        outs[fmt] = df.drop(columns=["dataset_name"])
    assert outs["parquet"].equals(outs["jsonl"])
    assert outs["parquet"].astype(str).equals(outs["csv"].astype(str))

    # mixed-format union through the same surface
    u = union_sources(
        [
            SourceConfig(path=pq_path, dataset_name="p", select=select),
            SourceConfig(path=jl_path, dataset_name="j", select=select, format="jsonl"),
        ]
    )
    assert u.count() == 6


def test_jsonl_sink_manifest_and_resume(ray_session, tmp_path):
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.sources.io import (
        read_jsonl,
        write_jsonl_with_manifest,
    )

    out = str(tmp_path / "jsonl_out")
    ds = rd.from_items([{"a": i, "b": f"x{i}"} for i in range(250)])
    m1 = write_jsonl_with_manifest(ds, out)
    assert m1["rows"] == 250
    assert sum(p["rows"] for p in m1["partitions"]) == 250
    # resume: a second write returns the existing manifest, writes nothing
    m2 = write_jsonl_with_manifest(ds.limit(1), out)
    assert m2 == m1
    # the sidecar manifest must NOT be parsed as data on read-back
    back = read_jsonl(out).to_pandas()
    assert len(back) == 250 and set(back.columns) == {"a", "b"}
