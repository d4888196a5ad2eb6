"""Regression pins for the r11 adversarial review of manifest.py: ref-name
validation, atomic ref writes, cache thread-safety/LRU/fstat identity, tmp
leak, foreign-file tolerance, and clear reserve errors.
"""

import json
import os
import threading

import pytest

import lance_spark as ls
from lance_spark import manifest as mf


def _region(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/region.parquet")


def test_ref_names_cannot_escape_refs_dir(spark, sf_dir, tmp_path):
    uri = str(tmp_path / "m1")
    ds = ls.write_dataset(_region(spark, sf_dir), uri)
    for bad in ("../../_versions/1.manifest", "a/b", "..", ".hidden", ""):
        with pytest.raises(ValueError, match="invalid"):
            ds.create_tag(bad, 1)
        with pytest.raises(ValueError, match="invalid"):
            mf.delete_ref(uri, "tags", bad)
    # the committed version is untouched
    assert mf.list_versions(uri) == [1]


def test_ref_writes_atomic_and_exclusive(spark, sf_dir, tmp_path):
    uri = str(tmp_path / "m2")
    ds = ls.write_dataset(_region(spark, sf_dir), uri)
    ds.create_tag("t", 1)
    with pytest.raises(ValueError, match="tag t already exists"):
        ds.create_tag("t", 1)
    mf.update_ref(uri, "tags", "t", 1)
    assert mf.resolve_ref(uri, "tags", "t") == 1
    with pytest.raises(ValueError, match="tag zzz does not exist"):
        mf.update_ref(uri, "tags", "zzz", 1)
    # branch noun spelled correctly
    ds.create_branch("dev")
    with pytest.raises(ValueError, match="branch dev already exists"):
        ds.create_branch("dev")
    # tmp files never surface in listings
    assert set(mf.list_refs(uri, "tags")) == {"t"}


def test_manifest_cache_threadsafe_and_lru(spark, sf_dir, tmp_path):
    """Concurrent reads + cache churn at the cap must never raise, and a
    HIT refreshes recency (LRU, not FIFO)."""
    uri = str(tmp_path / "m3")
    ds = ls.write_dataset(_region(spark, sf_dir), uri)
    for i in range(3):
        ds = ds.update_config({"k": str(i)})
    mf.clear_manifest_cache()

    errors = []

    def reader():
        try:
            for _ in range(300):
                mf.read_manifest(uri)
                mf.read_manifest(uri, 1)
        except Exception as exc:  # pragma: no cover - the regression
            errors.append(exc)

    threads = [threading.Thread(target=reader) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors

    # LRU: hit refreshes position — fill the cache past cap with OTHER
    # keys while continually hitting (uri, 1); it must survive
    mf.clear_manifest_cache()
    mf.read_manifest(uri, 1)
    for i in range(mf._MANIFEST_CACHE_CAP + 5):
        other = str(tmp_path / f"filler{i}")
        os.makedirs(os.path.join(other, "_versions"), exist_ok=True)
        with open(os.path.join(other, "_versions", "1.manifest.json"), "w") as fh:
            json.dump(
                mf.Manifest(
                    version=1,
                    schema_json={"type": "struct", "fields": []},
                    fragments=[],
                    max_fragment_id=-1,
                    operation="create",
                ).to_json(),
                fh,
            )
        mf.read_manifest(other, 1)
        mf.read_manifest(uri, 1)  # keep it hot
    key = (os.path.abspath(uri), 1)
    assert key in mf._MANIFEST_CACHE  # FIFO would have evicted the hot key


def test_foreign_manifest_file_tolerated(spark, sf_dir, tmp_path):
    uri = str(tmp_path / "m4")
    ds = ls.write_dataset(_region(spark, sf_dir), uri)
    with open(os.path.join(uri, "_versions", "backup.manifest.json"), "w") as fh:
        fh.write("{}")
    assert mf.list_versions(uri) == [1]
    assert ds.checkout_latest().count_rows() == 5


def test_write_manifest_tmp_cleaned_on_dump_failure(spark, sf_dir, tmp_path):
    uri = str(tmp_path / "m5")
    ls.write_dataset(_region(spark, sf_dir), uri)

    bad = mf.read_manifest(uri)
    m2 = mf.Manifest.evolve(bad, 2, operation="update_config")
    m2.properties = {"when": object()}  # not JSON-serializable
    with pytest.raises(TypeError):
        mf.write_manifest(uri, m2)
    leftovers = [
        n for n in os.listdir(os.path.join(uri, "_versions")) if n.startswith(".tmp-")
    ]
    assert leftovers == []


def test_reserve_on_missing_dataset_is_clear_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="no dataset"):
        mf.reserve_fragment_ids(str(tmp_path / "nope"), 4)
