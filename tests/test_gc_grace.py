"""GC reader-grace (r11): files of superseded versions are RETIRED into a
ledger and only unlinked after READER_GRACE_SECONDS — an in-flight reader
that planned against the just-superseded manifest finishes against intact
files. delete_unverified=True (caller asserts no concurrent activity)
bypasses the grace. Also pins the per-child orphan guard on the
all-builds-dropped index-dir branch and the missing-file retry in the
mutation loop.
"""

import os

import pytest
from pyspark.sql import functions as F

import lance_spark as ls
from lance_spark import maintenance


def _region(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/region.parquet")


def test_dropped_files_survive_grace_then_reclaim(spark, sf_dir, tmp_path, monkeypatch):
    uri = str(tmp_path / "g1")
    ds = ls.write_dataset(_region(spark, sf_dir), uri)
    old_files = {
        os.path.join("data", n) for n in os.listdir(os.path.join(uri, "data"))
    }
    ds = ls.write_dataset(_region(spark, sf_dir), uri, mode="overwrite")
    ds.cleanup_old_versions(older_than_seconds=0.0)
    # within the grace window: superseded data files are retired, NOT gone
    for rel in old_files:
        assert os.path.exists(os.path.join(uri, rel)), rel
    ledger = maintenance._load_trash(uri)
    assert old_files <= set(ledger)
    # latest version fully readable throughout
    assert ls.dataset(uri).to_df(spark).count() == 5

    # expire the grace: the next cleanup unlinks
    monkeypatch.setattr(maintenance, "READER_GRACE_SECONDS", -1.0)
    ds.cleanup_old_versions(older_than_seconds=0.0)
    for rel in old_files:
        assert not os.path.exists(os.path.join(uri, rel)), rel
    assert not maintenance._load_trash(uri)


def test_delete_unverified_bypasses_grace(spark, sf_dir, tmp_path):
    uri = str(tmp_path / "g2")
    ds = ls.write_dataset(_region(spark, sf_dir), uri)
    old_files = {
        os.path.join("data", n) for n in os.listdir(os.path.join(uri, "data"))
    }
    ds = ls.write_dataset(_region(spark, sf_dir), uri, mode="overwrite")
    ds.cleanup_old_versions(older_than_seconds=0.0, delete_unverified=True)
    for rel in old_files:
        assert not os.path.exists(os.path.join(uri, rel)), rel


def test_rereferenced_files_unretire(spark, sf_dir, tmp_path):
    """A file that is referenced again (restore / fragment adoption after
    an earlier retire) must leave the ledger — never be deleted as trash."""
    uri = str(tmp_path / "g3")
    ds = ls.write_dataset(_region(spark, sf_dir), uri)
    live_rel = ds.manifest.fragments[0].files[0].path
    # simulate a ledger entry for a now-live file, ancient retire timestamp
    maintenance._save_trash(uri, {live_rel: 0.0})
    ds.cleanup_old_versions(older_than_seconds=0.0)
    assert os.path.exists(os.path.join(uri, live_rel))
    assert live_rel not in maintenance._load_trash(uri)
    assert ls.dataset(uri).to_df(spark).count() == 5


def test_index_dir_fresh_child_survives_wholesale_reclaim(spark, sf_dir, tmp_path):
    """ADVICE r11: when every RECORDED build of an index was dropped, a
    concurrent creator's fresh (pre-commit) build dir under the same index
    name must survive — reclaim per child with the orphan guard, never the
    directory wholesale."""
    uri = str(tmp_path / "g4")
    ds = ls.write_dataset(_region(spark, sf_dir), uri)
    ds = ds.create_scalar_index(spark, "r_regionkey", "BTREE")
    meta = ds.manifest.indices[0]
    idx_dir = os.path.join(uri, "_indices", meta.name)
    ds = ds.drop_index(meta.name)
    # a concurrent create_scalar_index has an in-flight (uncommitted) build
    fresh = os.path.join(idx_dir, "bdeadbeef")
    os.makedirs(fresh, exist_ok=True)
    with open(os.path.join(fresh, "part-0.parquet"), "wb") as fh:
        fh.write(b"in-flight build")
    ds.cleanup_old_versions(older_than_seconds=0.0)
    assert os.path.isdir(fresh)  # young in-flight build survives
    ds.cleanup_old_versions(older_than_seconds=0.0, delete_unverified=True)
    assert not os.path.isdir(fresh)


def test_missing_file_error_is_retryable(spark, sf_dir, tmp_path):
    """A FileNotFound mid-plan (GC yanked a superseded sidecar) retries from
    the fresh snapshot instead of surfacing as a hard AnalysisException."""
    from lance_spark.mutation import _retrying

    uri = str(tmp_path / "g5")
    ls.write_dataset(_region(spark, sf_dir), uri)
    calls = {"n": 0}

    def fn(d):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError(
                "Job aborted: java.io.FileNotFoundException: "
                "/x/_deletions/frag-0-abc.parquet does not exist"
            )
        return "ok"

    assert _retrying(ls.dataset(uri), fn) == "ok"
    assert calls["n"] == 2

    # non-file errors still surface immediately
    def boom(d):
        raise RuntimeError("arithmetic overflow")

    with pytest.raises(RuntimeError, match="overflow"):
        _retrying(ls.dataset(uri), boom)
