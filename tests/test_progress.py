"""FragmentWriteProgress hooks (task-side markers) and schema JSON helpers."""

import os

import pyarrow as pa

import lance_spark as ls
from lance_spark import manifest as mf
from lance_spark.progress import FileSystemFragmentWriteProgress, NoopFragmentWriteProgress
from lance_spark.types import json_to_schema, schema_to_json
from lance_spark.write import write_fragments


def test_filesystem_progress_markers(spark, sf_dir, tmp_path):
    uri = str(tmp_path / "ds")
    prog_dir = str(tmp_path / "progress")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds = ls.write_dataset(nation, uri)
    base = mf.reserve_fragment_ids(uri, 4)
    prog = FileSystemFragmentWriteProgress(prog_dir, metadata={"job": "test"})
    frags = write_fragments(nation.repartition(3), uri, base, progress=prog)
    assert len(frags) == 3
    # every fragment completed → no surviving markers, but the fragment
    # json records remain for audit
    assert prog.unfinished_fragments() == []
    jsons = [n for n in os.listdir(prog_dir) if n.endswith(".json")]
    assert len(jsons) == 3
    # a manually planted marker is reported (the crashed-write signal)
    prog.begin({"id": 999, "path": "data/zz.parquet"})
    assert prog.unfinished_fragments() == [999]


def test_noop_progress(spark, sf_dir, tmp_path):
    uri = str(tmp_path / "ds")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ls.write_dataset(nation, uri)
    base = mf.reserve_fragment_ids(uri, 2)
    frags = write_fragments(
        nation.repartition(1), uri, base, progress=NoopFragmentWriteProgress()
    )
    assert len(frags) == 1


def test_schema_json_roundtrip():
    s = pa.schema(
        [pa.field("id", pa.int64()), pa.field("name", pa.string()),
         pa.field("emb", pa.list_(pa.float32())),
         pa.field("nested", pa.struct([pa.field("x", pa.float64())]))]
    )
    j = schema_to_json(s)
    assert j["type"] == "struct"
    assert [f["name"] for f in j["fields"]] == ["id", "name", "emb", "nested"]
    s2 = json_to_schema(j)
    assert [f.name for f in s2] == [f.name for f in s]
    assert s2.field("emb").type == pa.list_(pa.float32())


def test_schema_json_normalizes_exotic_types():
    # large_string / fixed_size_list normalize like the ingest path
    s = pa.schema([pa.field("t", pa.large_string()),
                   pa.field("v", pa.list_(pa.float32(), 4))])
    j = schema_to_json(s)
    s2 = json_to_schema(j)
    assert s2.field("t").type == pa.string()
    assert s2.field("v").type == pa.list_(pa.float32())
