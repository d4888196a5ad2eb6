"""Tracing events, BatchUDFCheckpoint, normalize_transform,
HuggingFaceConverter, CompactionOptions, get_log_level — the reference
module-surface tail (lance.tracing / lance.udf / lance.hf / lance.optimize
/ lance.log)."""

import json
import time

import pytest

import lance_spark as ls


def test_trace_events_capture_commit(spark, sf_dir, tmp_path):
    events = []
    ls.capture_trace_events(events.append)
    try:
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        ds = ls.write_dataset(nation, str(tmp_path / "t"))
        ds.delete(spark, "n_nationkey = 0")
        deadline = time.time() + 5
        while time.time() < deadline and len(events) < 2:
            time.sleep(0.05)
        assert len(events) >= 2  # create + delete commits
        assert all(e.target == "lance_spark::commit" for e in events)
        ops = [e.args["operation"] for e in events]
        assert "delete" in ops
    finally:
        from lance_spark.tracing import _listeners

        _listeners.remove(events.append) if events.append in _listeners else None


def test_trace_to_chrome_writes_file(spark, sf_dir, tmp_path):
    trace_file = str(tmp_path / "trace.json")
    handle = ls.trace_to_chrome(file=trace_file)
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ls.write_dataset(nation, str(tmp_path / "t2"))
    time.sleep(0.3)  # let the dispatch thread drain
    handle.finish()
    data = json.load(open(trace_file))
    assert data["traceEvents"], "no events recorded"
    ev = data["traceEvents"][0]
    assert ev["name"] == "lance_spark::commit" and ev["ph"] == "i"
    assert ev["args"]["operation"] in ("create", "overwrite")


def test_batch_udf_checkpoint_sqlite_roundtrip(tmp_path):
    import pyarrow as pa

    from lance_spark.udf import BatchUDFCheckpoint

    ckpt = BatchUDFCheckpoint(str(tmp_path / "ck.sqlite"))
    info = BatchUDFCheckpoint.BatchInfo(fragment_id=3, batch_index=7)
    assert ckpt.get_batch(info) is None
    batch = pa.record_batch({"x": pa.array([1, 2, 3])})
    ckpt.insert_batch(info, batch)
    assert ckpt.get_batch(info).equals(batch)
    # inserting the fragment clears its batches (the reference contract)
    assert ckpt.get_fragment(3) is None
    ckpt.insert_fragment(3, '{"id": 3}')
    assert ckpt.get_fragment(3) == '{"id": 3}'
    assert ckpt.get_batch(info) is None
    ckpt.cleanup()


def test_normalize_transform_shapes(spark, sf_dir, tmp_path):
    from lance_spark.udf import BatchUDF, normalize_transform

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ds = ls.write_dataset(nation, str(tmp_path / "n"))

    # dict passes through
    d = {"x": "n_nationkey * 2"}
    assert normalize_transform(d, ds) is d

    # bare callable -> BatchUDF with inferred schema (run on a REAL batch)
    def add_double(pdf):
        import pandas as pd

        return pd.DataFrame({"dbl": pdf["n_nationkey"] * 2})

    out = normalize_transform(add_double, ds, read_columns=["n_nationkey"])
    assert isinstance(out, BatchUDF)
    assert out.output_schema is not None
    assert [f.name for f in out.output_schema.fields] == ["dbl"]

    # declared schema is left alone
    pre = BatchUDF(add_double, "dbl long", None)
    assert normalize_transform(pre, ds).output_schema is pre.output_schema


def test_hf_converter_feature_dispatch():
    conv = ls.HuggingFaceConverter(
        {"info": {"features": {"img": {"_type": "Image"}, "aud": {"_type": "Audio"}}}}
    )
    assert conv.to_pytorch("not_a_feature", None) is None
    with pytest.raises(NotImplementedError, match="Audio"):
        conv.to_pytorch("aud", [])


def test_compaction_options_and_log_level():
    from lance_spark.log import get_log_level

    opts = ls.CompactionOptions(target_rows_per_fragment=4096)
    assert opts["target_rows_per_fragment"] == 4096
    assert isinstance(opts, dict)  # TypedDict-compatible call sites
    assert isinstance(get_log_level(), str)
